"""Property tests for the non-oracle extension operators: LSH recall vs
brute force, SimHash sanity, multimodal determinism."""

from __future__ import annotations

from banking_streaming_etl_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_equals_exact_jaccard(spark):
    exact = {
        (r.doc_a, r.doc_b) for r in dedup.near_dup_jaccard(spark, SF).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF).collect()
    }
    assert lsh == exact  # precision exact (verified), recall ~1 at J>=0.8
    assert len(exact) > 0  # the corpus has planted near-dups


def test_simhash_finds_planted_dups(spark):
    exact = {
        (r.doc_a, r.doc_b) for r in dedup.near_dup_jaccard(spark, SF).collect()
    }
    sim = {
        (r.doc_a, r.doc_b) for r in dedup.dedup_simhash(spark, SF).collect()
    }
    # SimHash-hamming<=7 is a different similarity; require strong overlap
    # with the planted exact near-dups, not equality.
    assert len(sim & exact) >= len(exact) * 0.5
    # signatures are 64-bit and deterministic across runs
    s1 = dedup.simhash_signatures(spark, SF).orderBy("doc_id").take(5)
    s2 = dedup.simhash_signatures(spark, SF).orderBy("doc_id").take(5)
    assert [r.simhash for r in s1] == [r.simhash for r in s2]


def test_lsh_topk_recall_vs_brute_force(spark):
    brute = similarity.ann_cosine_topk(spark, SF).collect()
    lsh = similarity.ann_lsh_topk(spark, SF).collect()
    top1_brute = {
        (r.query_id, r.neighbor_id) for r in brute if r.posicao == 1
    }
    top1_lsh = {(r.query_id, r.neighbor_id) for r in lsh if r.posicao == 1}
    # unstructured corpus = LSH worst case; OR-construction (8 tables x 4
    # planes) should still recover most top-1 neighbors
    recall = len(top1_brute & top1_lsh) / len(top1_brute)
    assert recall >= 0.5, f"top-1 recall {recall}"


def test_media_features_deterministic(spark):
    feats = multimodal.media_features(spark, SF)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 500
    r0 = rows[0]
    assert r0.n_bytes > 0 and r0.checksum > 0
    assert len(r0.thumb) == 4
    # second run: byte-identical (stub decode is deterministic)
    again = {r.doc_id: r for r in multimodal.media_features(spark, SF).collect()}
    assert rows[7].checksum == again[7].checksum
    assert rows[7].thumb == again[7].thumb


def test_decode_real_is_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"FAKE")
