"""Property-based tests (hypothesis) for the text-fingerprint family:
the winnowing guarantee on arbitrary planted substrings, and exact
equality against a plain-Python reference implementation."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from banking_streaming_etl_spark.plans import text


def _py_winnow(s: str) -> set[int]:
    """Reference implementation of the MOSS scheme, mirroring the Spark
    expressions: 48-bit md5 k-gram hashes, window-of-W minima, distinct."""
    k, w = text.WINNOW_K, text.WINNOW_W
    if len(s) < k + w:
        return set()
    hashes = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:12], 16)
        for i in range(len(s) - k + 1)
    ]
    return {min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)}


@pytest.fixture(scope="module")
def spark_m(spark):
    return spark


alpha = st.text(alphabet="abcdefgh ", min_size=12, max_size=60)
shared = st.text(alphabet="abcdefgh ", min_size=text.WINNOW_K + text.WINNOW_W - 1,
                 max_size=24)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=alpha, b=alpha, sub=shared, data=st.data())
def test_winnowing_matches_reference_and_guarantee(spark_m, a, b, sub, data):
    """For arbitrary texts with a planted shared substring of length
    >= K+W-1: (1) the Spark expressions equal the Python reference
    exactly per document; (2) the two documents share a fingerprint."""
    ia = data.draw(st.integers(0, len(a)))
    ib = data.draw(st.integers(0, len(b)))
    doc_a = a[:ia] + sub + a[ia:]
    doc_b = b[:ib] + sub + b[ib:]
    df = spark_m.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    got: dict[int, set[int]] = {0: set(), 1: set()}
    for r in text.winnow_frame(df).collect():
        got[r.doc_id].add(r.fingerprint)
    assert got[0] == _py_winnow(doc_a)
    assert got[1] == _py_winnow(doc_b)
    assert got[0] & got[1], "planted shared substring produced no shared print"


def test_quality_classifier_enriches_the_target_class(spark):
    """The hashed-feature NB log-odds scorer must carry real signal: the
    kept top-40% is measurably enriched in the class the weights were
    trained for, and the percentile cut keeps ~the configured fraction."""
    from banking_streaming_etl_spark.plans import text

    rows = text.quality_classifier_scores(
        spark, "/root/testdata/sf0.001"
    ).collect()
    sel = [r for r in rows if r.selecionado]
    base = sum(1 for r in rows if r.is_en) / len(rows)
    prec = sum(1 for r in sel if r.is_en) / len(sel)
    assert abs(len(sel) / len(rows) - text.CLF_KEEP_FRACTION) < 0.05
    assert prec > base + 0.05, (prec, base)


def test_mmr_rerank_matches_independent_greedy(spark):
    """mmr_rerank differential: an INDEPENDENT pool cut + greedy loop
    over the same (oracle-backed) embedding/relevance frames must select
    the same docs in the same order with the same rounded scores; rank 1
    must be the pure-relevance argmax (MMR's k=1 degenerate case)."""
    from banking_streaming_etl_spark.plans import text as textplans

    SF = "/root/testdata/sf0.001"
    vecs = textplans.hash_embed_documents(spark, SF)
    dense = textplans._dense_query_scores(spark, vecs).collect()
    rel_all = {r.doc_id: float(r.cos_dense) for r in dense}
    pool_ids = sorted(
        rel_all, key=lambda d: (-rel_all[d], d)
    )[: textplans.MMR_POOL]
    rel = {d: rel_all[d] for d in pool_ids}
    vec = {}
    for r in vecs.collect():
        if r.doc_id in rel:
            vec.setdefault(r.doc_id, {})[int(r.pos)] = float(r.valor)

    # independent greedy (set-based, reversed scan with >= keep-last on
    # the ASCENDING id order == strict > keep-first on descending)
    lam = textplans.MMR_LAMBDA
    chosen, cand = [], set(pool_ids)
    while cand and len(chosen) < textplans.MMR_K:
        scored = []
        for d in sorted(cand):
            pen = 0.0
            for s, _ in chosen:
                dp = sum(
                    vec[d][p] * vec[s][p]
                    for p in sorted(vec[d])
                    if p in vec[s]
                )
                pen = dp if dp > pen else pen
            scored.append((lam * rel[d] - (1 - lam) * pen, d))
        best_score = max(s for s, _ in scored)
        best_doc = min(d for s, d in scored if s == best_score)
        chosen.append((best_doc, best_score))
        cand.remove(best_doc)

    got = [
        (r.ordem, r.doc_id, r.relevancia, r.mmr)
        for r in textplans.mmr_rerank(spark, SF).collect()
    ]
    want = [
        (i + 1, d, round(rel[d], 6), round(s, 6))
        for i, (d, s) in enumerate(chosen)
    ]
    assert got == want
    assert got[0][1] == pool_ids[0]
    assert len(got) == textplans.MMR_K


def _py_bpe_train(spark, sf: str, n_merges: int):
    """Pure-Python reference BPE trainer (greedy most-frequent pair,
    (freq DESC, a, b) tie-break, left-to-right non-overlapping apply)."""
    from collections import Counter

    from banking_streaming_etl_spark import datamodel

    docs = datamodel.load_table(spark, sf, "documents").select("text").collect()
    vocab = Counter()
    for row in docs:
        for w in row.text.lower().split(" "):
            if len(w) >= 2:
                vocab[w] += 1
    segs = {w: [c for c in w] for w in vocab}

    def pair_counts():
        pc = Counter()
        for w, syms in segs.items():
            f = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        return pc

    def apply(a, b):
        for w, syms in segs.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out

    want = []
    for rank in range(1, n_merges + 1):
        pc = pair_counts()
        if not pc:
            break
        (a, b), f = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, a, b, f))
        apply(a, b)
    return want


def test_bpe_learned_merges_match_python_trainer(spark):
    """The distributed BPE loop must learn EXACTLY the merge table the
    pure-Python reference trainer learns on the same corpus."""
    from banking_streaming_etl_spark.plans import text as textplans

    SF = "/root/testdata/sf0.001"
    want = _py_bpe_train(spark, SF, textplans.BPE_N_MERGES)
    got = [
        (r.rank, r.simbolo_a, r.simbolo_b, r.freq)
        for r in textplans.bpe_learned_merges(spark, SF).collect()
    ]
    assert got == want
    assert len(got) == textplans.BPE_N_MERGES


def test_bpe_budget_contract_and_checkpoint_cadence(spark):
    """The BPE_MAX_MERGES contract (round-4 verdict task #8): a budget
    over the bound raises BEFORE any job runs, and a budget that crosses
    the BPE_CHECKPOINT_EVERY lineage-truncation cadence still learns
    exactly the Python trainer's merge table (the checkpoint is a plan
    barrier, never a semantic change)."""
    import pytest

    from banking_streaming_etl_spark.plans import text as textplans

    SF = "/root/testdata/sf0.001"
    with pytest.raises(ValueError, match="BPE_MAX_MERGES"):
        textplans._bpe_train(spark, SF, n_merges=textplans.BPE_MAX_MERGES + 1)

    deep = textplans.BPE_CHECKPOINT_EVERY + 3
    merges, base, _ = textplans._bpe_train(spark, SF, n_merges=deep)
    base.unpersist()
    assert merges == _py_bpe_train(spark, SF, deep)
    assert len(merges) == deep


def test_bpe_cadence_keeps_plan_flat_at_nontoy_budget(spark):
    """Round-5 verdict task #6: prove the checkpoint cadence WORKS at a
    non-toy budget, not just that the constant exists. Train 64 merges
    (8 full checkpoint cycles) instrumenting the live vocabulary plan
    after every adopted merge: the nested-fold depth must never exceed
    BPE_CHECKPOINT_EVERY (without the localCheckpoint it would reach 64
    and analysis/codegen cost would grow quadratically), and per-merge
    wall time must stay flat — the tail of the run no more than 5x the
    head's median (a generous bound that still catches the super-linear
    plan-growth failure this cadence exists to prevent)."""
    import statistics
    import time as _time

    from banking_streaming_etl_spark.plans import text as textplans

    SF = "/root/testdata/sf0.001"
    depths: list[int] = []
    stamps: list[float] = [_time.perf_counter()]

    def on_iter(rank, wf):
        plan = wf._jdf.queryExecution().analyzed().toString()
        depths.append(plan.count("aggregate("))
        stamps.append(_time.perf_counter())

    merges, base, _ = textplans._bpe_train(
        spark, SF, n_merges=64, on_iter=on_iter
    )
    base.unpersist()
    assert len(merges) == 64
    assert max(depths) <= textplans.BPE_CHECKPOINT_EVERY, depths
    # every checkpoint boundary resets the chain (rank % 8 == 0 -> 0)
    assert all(
        d == 0 for i, d in enumerate(depths)
        if (i + 1) % textplans.BPE_CHECKPOINT_EVERY == 0
    ), depths
    per_merge = [b - a for a, b in zip(stamps, stamps[1:])]
    head = statistics.median(per_merge[:16])
    tail = statistics.median(per_merge[-16:])
    assert tail <= 5 * head, (head, tail, per_merge)


def test_bpe_corpus_compression_matches_python(spark):
    """The compression report must equal a pure-Python train+apply+measure
    pipeline exactly (same merges, same greedy application)."""
    from collections import Counter

    from banking_streaming_etl_spark import datamodel
    from banking_streaming_etl_spark.plans import text as textplans

    SF = "/root/testdata/sf0.001"
    docs = datamodel.load_table(spark, SF, "documents").select(
        "source", "text"
    ).collect()
    vocab = Counter()
    src_words = []
    for row in docs:
        for w in row.text.lower().split(" "):
            if len(w) >= 2:
                vocab[w] += 1
                src_words.append((row.source, w))
    segs = {w: [c for c in w] for w in vocab}

    def pair_counts():
        pc = Counter()
        for w, syms in segs.items():
            f = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        return pc

    def apply(a, b):
        for w, syms in segs.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out

    for _ in range(textplans.BPE_N_MERGES):
        pc = pair_counts()
        (a, b), _f = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        apply(a, b)

    stats = {}
    for src, w in src_words:
        n, before, after = stats.get(src, (0, 0, 0))
        stats[src] = (n + 1, before + len(w), after + len(segs[w]))
    want = {
        src: (n, before, after, round(after / before, 6))
        for src, (n, before, after) in stats.items()
    }
    got = {
        r.source: (
            r.n_palavras,
            r.simbolos_antes,
            r.simbolos_depois,
            r.taxa_compressao,
        )
        for r in textplans.bpe_corpus_compression(spark, SF).collect()
    }
    assert got == want
    assert all(v[3] < 1.0 for v in got.values())  # merges actually compress
