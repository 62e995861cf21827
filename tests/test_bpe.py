"""BPE merge training: greedy re-segmentation semantics (the fold must
match the reference left-to-right merge, including overlapping runs)
and trainer determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowalert_spark.functions import bpe as B


def _apply(spark, word, left, right):
    df = spark.createDataFrame([(word,)], "word string").select(
        B.merge_pair(F.split("word", ""), left, right).alias("syms")
    )
    return df.collect()[0].syms


def _ref_merge(syms, left, right):
    """Reference greedy left-to-right merge (plain python)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_pair_basic(spark):
    assert _apply(spark, "aber", "b", "e") == ["a", "be", "r"]
    assert _apply(spark, "xyz", "a", "b") == ["x", "y", "z"]


def test_merge_pair_overlapping_run(spark):
    # "aaa" with (a,a): greedy takes positions 1-2, leaves the third
    assert _apply(spark, "aaa", "a", "a") == ["aa", "a"]
    assert _apply(spark, "aaaa", "a", "a") == ["aa", "aa"]
    assert _apply(spark, "aaaaa", "a", "a") == ["aa", "aa", "a"]


def test_merge_pair_matches_reference_randomized(spark):
    import random

    rng = random.Random(42)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
        for _ in range(60)
    ]
    rows = spark.createDataFrame([(w,) for w in words], "word string")
    for left, right in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        got = {
            r.word: list(r.syms)
            for r in rows.select(
                "word", B.merge_pair(F.split("word", ""), left, right).alias("syms")
            ).collect()
        }
        for w in words:
            assert got[w] == _ref_merge(list(w), left, right), (w, left, right)


def test_bpe_train_deterministic_and_monotone(spark):
    from snowalert_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    m1 = B.bpe_train(d, 3)
    m2 = B.bpe_train(d, 3)
    assert m1 == m2
    assert [r[0] for r in m1] == [1, 2, 3]
    # merged pair counts never exceed an earlier selection's count
    counts = [r[3] for r in m1]
    assert counts == sorted(counts, reverse=True)


def _py_seq_train(word_counts, n_merges):
    """Plain-python sequential BPE trainer with the engine's exact
    tie-break ((count DESC, lhs, rhs) — the ground truth the batched
    trainer must be bit-identical to)."""
    vocab = [(cnt, list(w)) for w, cnt in word_counts.items()]
    out = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for cnt, syms in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (lhs, rhs), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, lhs, rhs, c))
        vocab = [(cnt, _ref_merge(syms, lhs, rhs)) for cnt, syms in vocab]
    return out


def _py_batched_train(word_counts, n_merges, top_k=None):
    """The batched trainer's selection loop in plain python, using the
    engine's _sequential_equivalent_prefix — including the collection
    truncation (``top_k``) the Spark driver protocol applies."""
    vocab = [(cnt, list(w)) for w, cnt in word_counts.items()]
    out = []
    while len(out) < n_merges:
        counts = {}
        for cnt, syms in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        rows = sorted(
            ((lhs, rhs, c) for (lhs, rhs), c in counts.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        if not rows:
            break
        ceiling = 0
        if top_k is not None and len(rows) > top_k:
            rows = rows[:top_k]
            ceiling = rows[-1][2]
        batch = B._sequential_equivalent_prefix(
            rows, ceiling, n_merges - len(out)
        )
        for lhs, rhs, c in batch:
            out.append((len(out) + 1, lhs, rhs, c))
            vocab = [(cnt, _ref_merge(syms, lhs, rhs)) for cnt, syms in vocab]
    return out


def test_batched_selection_matches_sequential_property():
    """Randomized property check of the batching guard: small
    alphabets force exactly the hazards the guard exists for —
    symbol overlap between top pairs, lhs == rhs runs, and merges
    whose created symbol boosts brand-new pairs above later picks.
    Truncated collection (top_k) must stay exact too via the
    uncollected-ceiling bound."""
    import random

    rng = random.Random(7)
    for trial in range(300):
        alphabet = rng.choice(["ab", "abc", "abcd"])
        words = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))):
            rng.randint(1, 9)
            for _ in range(rng.randint(2, 8))
        }
        n = rng.randint(1, 12)
        seq = _py_seq_train(words, n)
        # the engine's driver-local trainer is the same algorithm —
        # pin it against the test's independent reference too
        assert B.bpe_train_local(list(words.items()), n) == seq
        for top_k in (None, 2, 3, 5):
            got = _py_batched_train(words, n, top_k=top_k)
            assert got == seq, (trial, words, n, top_k, got, seq)


def test_batched_trainer_batches_wide_on_rich_vocab():
    """On a realistic vocabulary (the 31-word test corpus exhausts at
    ~89 merges and keeps batches near 1) the batched trainer must
    actually batch: driver rounds well below the merge count, output
    still bit-identical to sequential. Pure-python selection loop —
    the distributed trainer shares it via _sequential_equivalent_prefix."""
    import random

    rng = random.Random(1234)
    # zipf-ish counts over 1,500 distinct pseudo-words
    words = {}
    while len(words) < 1500:
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(3, 10))
        )
        words[w] = rng.randint(1, 1000)
    n = 200
    seq = _py_seq_train(words, n)
    assert len(seq) == n

    rounds = [0]

    def batched_rounds(word_counts, n_merges, top_k=None):
        vocab = [(cnt, list(w)) for w, cnt in word_counts.items()]
        out = []
        while len(out) < n_merges:
            counts = {}
            for cnt, syms in vocab:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + cnt
            rows = sorted(
                ((a, b, c) for (a, b), c in counts.items()),
                key=lambda t: (-t[2], t[0], t[1]),
            )
            if not rows:
                break
            batch = B._sequential_equivalent_prefix(
                rows, 0, n_merges - len(out)
            )
            rounds[0] += 1
            for lhs, rhs, c in batch:
                out.append((len(out) + 1, lhs, rhs, c))
                vocab = [
                    (cnt, _ref_merge(syms, lhs, rhs)) for cnt, syms in vocab
                ]
        return out

    got = batched_rounds(words, n)
    assert got == seq
    # the point of batching: materially fewer rounds than merges
    # (measured 76 rounds for 200 merges on this vocabulary — the
    # exactness guard is conservative wherever top pairs share
    # symbols, which random-letter words do constantly)
    assert rounds[0] < n * 0.6, rounds[0]


def test_bpe_train_local_and_auto_identical_on_corpus(spark):
    """All three trainer strategies — sequential distributed, batched
    distributed, local in-memory — produce the identical merge table
    on the real corpus; auto dispatch picks the local path inside the
    vocab budget."""
    from snowalert_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    seq = B.bpe_train(d, 24)
    assert B.bpe_train_auto(d, 24) == seq
    wf = {r.word: int(r.cnt) for r in B.word_freqs(d).collect()}
    assert B.bpe_train_local(list(wf.items()), 24) == seq


def test_bpe_train_batched_identical_on_corpus(spark):
    """The Spark batched trainer is bit-identical to the sequential
    trainer at gate merge counts on the real test corpus (the r9
    verdict's done-criterion for batched training), and reports its
    round evidence."""
    from snowalert_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    stats = {}
    bat = B.bpe_train_batched(d, 24, stats=stats)
    assert bat == B.bpe_train(d, 24)
    assert stats["rounds"] < 24  # actually batched, not degenerate
    assert sum(stats["batch_sizes"]) == len(bat) == 24


def test_bpe_encode_parity_with_empty_docs(spark, tmp_path):
    """Zero-word documents (empty / whitespace-only text) must round
    through BOTH formulations identically: the Spark fold emits
    (0, 0, '') and the oracle's LEFT JOIN from documents preserves the
    row (review finding r8: the original inner-join oracle dropped
    it)."""
    import shutil

    import pandas as pd

    from snowalert_spark import workload
    from tests.oracle_harness import compare

    import os

    sf = str(tmp_path / "sf_empty")
    shutil.copytree("/root/testdata/sf0.001", sf)
    os.remove(f"{sf}/documents.parquet")
    rows = [
        (0, "the fast scan join merge", "en", "web", 24),
        (1, "", "en", "web", 0),
        (2, "   ", "en", "web", 3),
        (3, "merge scan the the the fast", "en", "web", 27),
        (4, "fast fast join join scan", "en", "web", 24),
        (5, "the merge merge scan join fast", "en", "web", 30),
        (6, "scan the join", "en", "web", 13),
        (7, "join fast the merge", "en", "web", 19),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{sf}/documents.parquet")
    qs = workload.queries(include_local=True)
    os_ = workload.oracle_sql(include_local=True)
    compare(qs["bpe_encode_docs"](spark, sf), os_["bpe_encode_docs"], sf, "bpe")


def test_encode_paths_agree_trained_merges(spark):
    """Vocab-join encode == literal-fold encode, bit for bit, on the
    gate corpus with the trained 6-merge table (the cost-based branch
    must be a pure strategy choice, never a semantics one)."""
    from snowalert_spark.tables import table
    from snowalert_spark.workload.textops import BPE_MERGES, _bpe_apply

    d = table(spark, "/root/testdata/sf0.001", "documents")
    merges = B.bpe_train(d, BPE_MERGES)
    lit = _bpe_apply(d, merges, strategy="literal")
    via = (
        B.encode_docs_via_vocab(d, merges)
        .select(
            "doc_id",
            "n_words",
            F.size("toks").cast("long").alias("n_bpe_tokens"),
            F.array_join("toks", " ").alias("bpe_text"),
        )
    )
    a = sorted(tuple(r) for r in lit.collect())
    b = sorted(tuple(r) for r in via.collect())
    assert a == b


def test_encode_paths_agree_many_merges(spark):
    """Same equality with a 48-entry frequency-ranked merge table
    (well past the trained-gate count, still under BPE_FOLD_MAX so
    the literal fold can run) — exercises merge interactions the
    6-merge table can't (chained merges, lhs == rhs runs)."""
    from snowalert_spark.tables import table
    from snowalert_spark.workload.textops import _bpe_apply

    d = table(spark, "/root/testdata/sf0.001", "documents")
    merges = B.frequency_ranked_merges(d, 48)
    assert len(merges) == 48 <= B.BPE_FOLD_MAX
    lit = _bpe_apply(d, merges, strategy="literal")
    via = B.encode_docs_via_vocab(d, merges).select(
        "doc_id",
        "n_words",
        F.size("toks").cast("long").alias("n_bpe_tokens"),
        F.array_join("toks", " ").alias("bpe_text"),
    )
    assert sorted(map(tuple, lit.collect())) == sorted(
        map(tuple, via.collect())
    )


def test_bpe_encode_1k_runs_vocab_path(spark):
    """The 1024-merge bench row must take the vocab-join branch and
    produce one row per document with every token accounted for."""
    from snowalert_spark import workload
    from snowalert_spark.tables import table

    sf = "/root/testdata/sf0.001"
    out = workload.queries(include_local=True)["bpe_encode_1k"](spark, sf)
    # no literal fold: the plan would need >1000 nested aggregates —
    # presence of the word-position join is the cheap witness
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan
    rows = out.collect()
    n_docs = table(spark, sf, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        toks = r.bpe_text.split(" ") if r.bpe_text else []
        assert r.n_bpe_tokens == len(toks)
        assert r.n_words <= r.n_bpe_tokens or r.n_bpe_tokens == 0


def test_trainer_dispatch_crossover(spark, monkeypatch):
    """r11 verdict item 3: the cost-based dispatch must keep any
    corpus whose word table fits the driver budget on the local
    trainer — BENCH_r11_bpe_train measured batched 2.1x SLOWER than
    driver-local at the full 60k-word zipf corpus and 1,024 merges,
    i.e. the old 200M-ops cap routed a driver-feasible corpus to the
    slow path. The batched trainer is the >driver-memory insurance
    (vocab cap), not an ops-volume escape hatch in local mode."""
    from snowalert_spark.sources.zipf_corpus import ensure_zipf_corpus

    d = spark.read.parquet(f"{ensure_zipf_corpus()}/documents.parquet")
    # the measured regime: full zipf corpus, production merge budget
    assert B.bpe_train_dispatch(d, 1024) == "local"
    # ops cap still bounds driver CPU at extreme merge counts
    assert B.bpe_train_dispatch(d, 10**6) == "batched"
    # vocab past the driver budget -> batched, regardless of merges
    monkeypatch.setattr(B, "LOCAL_VOCAB_MAX_WORDS", 100)
    assert B.bpe_train_dispatch(d, 8) == "batched"


def test_train_auto_uses_dispatch(spark, monkeypatch):
    """bpe_train_auto routes through bpe_train_dispatch (one decision
    point), and the local path on a tiny corpus equals the batched
    path bit-for-bit (the existing parity, re-pinned through the
    dispatch seam)."""
    rows = [(i, "low lower lowest new newer newest") for i in range(4)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert B.bpe_train_dispatch(d, 6) == "local"
    local = B.bpe_train_auto(d, 6)
    monkeypatch.setattr(B, "bpe_train_dispatch",
                        lambda *a, **k: "batched")
    batched = B.bpe_train_auto(d, 6)
    assert local == batched and len(local) == 6
