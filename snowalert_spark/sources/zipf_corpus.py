"""Rich-vocabulary synthetic corpus for tokenizer-depth evidence.

The driver-generated documents tables have a 31-word vocabulary, so
BPE training exhausts at ~89 merges no matter the budget (r10 verdict
item 2 / BENCH_r10_bpe_train.json) — the batched trainer and the
vocab-join encode, whose value is at thousands of merges, could never
demonstrate it. This module synthesizes a Zipf-distributed corpus with
a syllable-structured vocabulary (>= 50k distinct words actually
appearing in documents), which trains >= 1,024 REAL merges with wide
sequential-equivalent batches.

Deterministic: fixed seed, no wall-clock anywhere, so every
regeneration is byte-stable and the DuckDB oracle can read the same
parquet the Spark side reads. Generated lazily under /tmp (versioned
dir + _SUCCESS marker), never committed.
"""

from __future__ import annotations

import os
import random

#: bump when the generator changes — the dir is content-versioned
ZIPF_CORPUS_VERSION = "v1"
ZIPF_SEED = 11
ZIPF_VOCAB_TYPES = 60_000
ZIPF_N_DOCS = 12_000
ZIPF_ALPHA = 1.03

_ONSETS = [
    "b", "br", "c", "ch", "cl", "d", "dr", "f", "fl", "g", "gr", "h",
    "j", "k", "kr", "l", "m", "n", "p", "pl", "pr", "qu", "r", "s",
    "sh", "sk", "sl", "sm", "sn", "sp", "st", "str", "t", "th", "tr",
    "v", "w", "z", "",
]
_VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "io", "ou", "y"]
_CODAS = [
    "", "", "b", "ck", "d", "g", "k", "l", "ll", "m", "n", "nd", "ng",
    "nt", "p", "r", "rd", "rk", "rn", "s", "sh", "ss", "st", "t", "th",
    "x",
]


def _make_vocab(rng: random.Random, n_types: int) -> list[str]:
    """n_types distinct syllable-structured words. Syllable reuse is
    the point: BPE has real shared subword structure to learn, unlike
    uniform random strings whose pair counts are flat."""
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n_types:
        n_syll = min(1 + int(rng.random() * rng.random() * 4), 4)
        w = "".join(
            rng.choice(_ONSETS) + rng.choice(_VOWELS) + rng.choice(_CODAS)
            for _ in range(n_syll)
        )
        if len(w) < 2 or w in seen:
            continue
        seen.add(w)
        out.append(w)
    return out


def generate_zipf_documents(
    n_docs: int = ZIPF_N_DOCS,
    n_types: int = ZIPF_VOCAB_TYPES,
    seed: int = ZIPF_SEED,
    alpha: float = ZIPF_ALPHA,
):
    """List of (doc_id, text, lang, source, n_chars) rows — the
    driver documents schema. Zipf-ranked word frequencies; every
    vocabulary type is additionally enumerated once across the tail
    documents so the distinct-word floor is exact, not probabilistic."""
    import numpy as np

    rng = random.Random(seed)
    vocab = _make_vocab(rng, n_types)
    p = np.array([1.0 / (i + 2.7) ** alpha for i in range(n_types)])
    p /= p.sum()
    npr = np.random.Generator(np.random.PCG64(seed))
    lens = 40 + npr.poisson(30, size=n_docs)
    draws = npr.choice(n_types, size=int(lens.sum()), p=p)
    rows = []
    pos = 0
    # interleave a full-vocabulary enumeration into the doc stream:
    # each doc appends a disjoint slice of the ranked vocab, so every
    # type appears at least once and rare types sit in frequency-
    # realistic contexts
    per_doc = n_types // n_docs + 1
    for i in range(n_docs):
        k = int(lens[i])
        words = [vocab[j] for j in draws[pos : pos + k]]
        pos += k
        words.extend(vocab[i * per_doc : min((i + 1) * per_doc, n_types)])
        text = " ".join(words)
        rows.append((i, text, "en", f"zipf{i % 8}", len(text)))
    return rows


def zipf_corpus_dir(base_dir: str = "/tmp") -> str:
    """The (versioned) corpus directory path — computable without
    generating, so import-time consumers (the oracle SQL literal) can
    reference it; :func:`ensure_zipf_corpus` materializes it."""
    return os.path.join(base_dir, f"zipf_corpus_{ZIPF_CORPUS_VERSION}")


def ensure_zipf_corpus(base_dir: str = "/tmp") -> str:
    """Generate (once) and return the corpus directory containing
    ``documents.parquet``. Idempotent per version: a _SUCCESS marker
    gates regeneration; the generator is seed-deterministic so
    concurrent/late regeneration writes identical bytes."""
    out_dir = zipf_corpus_dir(base_dir)
    marker = os.path.join(out_dir, "_SUCCESS")
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(marker) and os.path.exists(path):
        return out_dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_zipf_documents()
    cols = list(zip(*rows))
    t = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    with open(marker, "w") as f:
        f.write(ZIPF_CORPUS_VERSION)
    return out_dir
