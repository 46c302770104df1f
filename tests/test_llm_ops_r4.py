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
