"""Tokenizer-depth evidence on the rich-vocabulary zipf corpus (r10
verdict item 2): the driver corpora exhaust at ~89 merges, so the
batched trainer never batched wider than ~3 and the vocab-join encode
never ran at the depth it exists for. This probe trains a GENUINE
1,024-merge table on the 60k-word zipf sidecar, records the batched
trainer's wall / driver rounds / batch widths, pins bit-identity
against the in-memory sequential reference (bpe_train_local — the
same greedy semantics the distributed trainers are test-pinned to),
and times the vocab-join encode of all 12k docs at depth 1,024.

Usage: python tools/probe_bpe_depth.py OUT.json [budget]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowalert_spark.functions import bpe as B
from snowalert_spark.session import get_session
from snowalert_spark.sources.zipf_corpus import ensure_zipf_corpus


def main(out_path: str, budget: int = 1024) -> None:
    spark = get_session(app_name="probe_bpe_depth")
    path = ensure_zipf_corpus()
    d = spark.read.parquet(f"{path}/documents.parquet")

    wf = B.word_freqs(d).collect()
    n_words = len(wf)
    total_syms = sum(len(r["word"]) for r in wf)

    t0 = time.perf_counter()
    seq_ref = B.bpe_train_local(
        [(r["word"], int(r["cnt"])) for r in wf], budget
    )
    wall_local = round(time.perf_counter() - t0, 1)

    stats: dict = {}
    t0 = time.perf_counter()
    batched = B.bpe_train_batched(d, budget, stats=stats)
    wall_batched = round(time.perf_counter() - t0, 1)
    widths = stats["batch_sizes"]

    t0 = time.perf_counter()
    n_enc = B.encode_docs_via_vocab(d, batched).count()
    wall_encode = round(time.perf_counter() - t0, 1)

    doc = {
        "corpus": "zipf_v1 (60k distinct syllable words, 12k docs)",
        "distinct_words": n_words,
        "total_word_chars": total_syms,
        "merge_budget": budget,
        "merges_trained": len(batched),
        "vocabulary_exhausted": len(batched) < budget,
        "batched_distributed": {
            "wall_s": wall_batched,
            "driver_rounds": stats["rounds"],
            "mean_batch": round(sum(widths) / len(widths), 2),
            "max_batch": max(widths),
            "note": "sequential-equivalent prefix batching at real "
            "depth — vs 1.62 mean width on the 31-word driver corpus "
            "(BENCH_r10_bpe_train.json)",
        },
        "sequential_inmemory_reference": {"wall_s": wall_local},
        "encode_vocab_join": {
            "wall_s": wall_encode,
            "docs": n_enc,
            "note": "all docs encoded through the trained segmentation "
            "vocabulary at depth == budget",
        },
        "bit_identical": batched == seq_ref,
    }
    assert doc["bit_identical"], "batched trainer diverged from reference"
    print(json.dumps(doc))
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))
