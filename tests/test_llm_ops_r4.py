"""Round-4 operators: int8-quantized top-k quality vs the exact scan,
benchmark-containment bounds and self-containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.dedup import benchmark_containment
from duck_delta_share_spark.operators.similarity import brute_force_topk, int8_topk
from tests.conftest import SF_DIR


def test_int8_topk_matches_exact_ranking_closely(spark):
    """int8 quantization keeps ~1/127 relative precision per component —
    the top-5 neighbor sets should overlap the float32 exact scan heavily
    (this is the FAISS int8 scan trade: 4x bandwidth for ~no recall loss)."""
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(e, q, k=5, exact=False).collect()
    }
    quant = {(r.query_id, r.vec_id) for r in int8_topk(e, q, k=5).collect()}
    overlap = len(exact & quant) / len(exact)
    assert overlap >= 0.8, f"int8 recall@5 vs exact = {overlap}"


def test_int8_topk_scores_bounded(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    rows = int8_topk(e, e.filter(F.col("vec_id") < 3), k=5).collect()
    assert rows and all(-1_000_001 <= r.score_e6 <= 1_000_001 for r in rows)
    assert all(1 <= r.rk <= 5 for r in rows)


def test_benchmark_containment_bounds_and_self(spark):
    d = load_table(spark, SF_DIR, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    res = benchmark_containment(d, bench, shingle_n=3).collect()
    by_id = {r.doc_id: r for r in res}
    for r in res:
        assert 0 <= r.n_overlap <= r.n_shingles
        assert 0.0 <= r.containment <= 1.0
    # a document IN the benchmark is fully contained by construction
    bench_ids = [r.doc_id for r in bench.select("doc_id").collect()]
    covered = [by_id[i] for i in bench_ids if i in by_id]
    assert covered and all(r.containment == 1.0 for r in covered)


def test_benchmark_containment_disjoint_is_zero(spark):
    d = load_table(spark, SF_DIR, "documents")
    corpus = d.limit(20)
    bench = corpus.select(
        "doc_id", F.lit("zz qq xx yy ww vv uu tt").alias("text")
    )
    res = benchmark_containment(corpus, bench, shingle_n=3).collect()
    assert res and all(r.n_overlap == 0 for r in res)


def test_pq_lossless_equals_int8_topk(spark):
    """With one codeword per distinct subvector, PQ encoding is exactly
    invertible and the encode->ADC->rank pipeline must reproduce
    int8_topk BIT-identically (the n_probe=n_centroids trick of PQ)."""
    from duck_delta_share_spark.operators.similarity import (
        lossless_pq_codebooks,
        pq_topk,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    books = lossless_pq_codebooks(e, dim=64, m=8)
    a = sorted(
        (r.query_id, r.vec_id, r.score_e6, r.rk)
        for r in pq_topk(e, q, dim=64, m=8, codebooks=books).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.score_e6, r.rk)
        for r in int8_topk(e, q, k=5).collect()
    )
    assert a == b and len(a) == 50


def test_pq_rerank_recovers_recall(spark):
    """Lossy PQ + the FAISS-style refine step: ADC shortlist re-scored
    with full int8 dots recovers high recall even on iid-random data
    (PQ's worst case)."""
    from duck_delta_share_spark.operators.similarity import pq_topk

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.vec_id) for r in int8_topk(e, q, k=5).collect()}
    got = {
        (r.query_id, r.vec_id)
        for r in pq_topk(
            e, q, dim=64, m=8, k_codes=32, rerank_factor=16
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"PQ+rerank recall@5 = {recall}"


def test_pq_codebooks_deterministic(spark):
    from duck_delta_share_spark.operators.similarity import train_pq_codebooks

    import numpy as np

    e = load_table(spark, SF_DIR, "embeddings")
    b1 = train_pq_codebooks(e, dim=64, m=8, k_codes=16, seed=7)
    b2 = train_pq_codebooks(e, dim=64, m=8, k_codes=16, seed=7)
    assert all(np.array_equal(x, y) for x, y in zip(b1, b2))
    assert len(b1) == 8 and all(b.shape == (16, 8) for b in b1)


def test_bm25_ranks_term_stuffed_doc_first(spark):
    """bm25_topk sanity on a hand corpus: a document containing every
    query term beats single-term docs; a no-term doc never appears; term
    saturation (k1) keeps a 100x-stuffed doc from scoring 100x."""
    from duck_delta_share_spark.plans.llm_ops import bm25_topk
    import duck_delta_share_spark.plans.llm_ops as llm

    rows = [
        (0, "hash join scan vector pipeline data"),
        (1, "hash hash hash hash table probe build side"),
        (2, "sort merge exchange partition broadcast"),
        (3, " ".join(["vector"] * 100)),
        (4, "join order optimizer statistics"),
    ]
    import pandas as pd
    import tempfile, pathlib

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bm25_"))
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp / "documents.parquet"
    )
    out = bm25_topk(spark, str(tmp)).collect()
    ranked = [r.doc_id for r in out]
    assert ranked[0] == 0  # all four query terms
    assert 2 not in ranked  # zero query terms -> filtered before scoring
    scores = {r.doc_id: r.bm25 for r in out}
    # saturation: 100 copies of one term score FAR below 4 distinct terms
    assert scores[3] < scores[0]
