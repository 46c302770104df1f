#!/usr/bin/env python
"""Scale-up sanity harness: run the heavy operators at 1× and N× the sf0.1
data (N× = union of id-remapped copies, preserving key cardinality growth)
and report the runtime scaling factor. A shuffle-shaped blowup shows up as
a factor ≫ N; healthy operators stay ≈ linear (factor ≤ N plus fixed
overhead amortization, often < N).

Usage: python scale_check.py [N] [op1,op2,...]   (default 8, all ops)
Prints one JSON line per operator: {"op": ..., "t1": ..., "tN": ...,
"factor": ...} and a trailing summary line.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def blowup(
    df: DataFrame,
    n: int,
    id_cols: list[str],
    perturb_text: str | None = None,
) -> DataFrame:
    """n id-remapped copies: keys stay distinct across copies so joins,
    groupBys and windows see true cardinality growth, not n× duplicates.

    ``perturb_text`` names a text column to make distinct per copy —
    WITHOUT it, duplicated documents/embeddings have n-1 exact twins each
    and near-dup PAIR counts grow quadratically by construction (an
    output-size fact about the duplicated data, not an operator-scaling
    fact). Block/label columns in id_cols likewise keep block SIZE
    constant while block COUNT grows — the realistic corpus-growth mode.
    """
    parts = []
    for i in range(n):
        d = df
        for c in id_cols:
            d = d.withColumn(c, F.col(c) + F.lit(i * 100_000_000))
        if perturb_text and i > 0:
            d = d.withColumn(
                perturb_text, F.concat(F.lit(f"copy{i} "), F.col(perturb_text))
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    pending_unpersist: list[DataFrame] = []

    l1 = load_table(spark, SF_DIR, "lineitem")
    lN = blowup(l1, n, ["l_orderkey"]).cache()
    d1 = load_table(spark, SF_DIR, "documents")
    dN = blowup(d1, n, ["doc_id"], perturb_text="text").cache()
    e1 = load_table(spark, SF_DIR, "events")
    eN = blowup(e1, n, ["event_id", "user_id"]).cache()
    emb1 = load_table(spark, SF_DIR, "embeddings")
    embN = blowup(emb1, n, ["vec_id", "label"]).cache()
    lN.count(), dN.count(), eN.count(), embN.count()

    def q1_shape(l):
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sq"),
                F.sum(disc.cast("decimal(18,6)")).cast("double").alias("sd"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def minhash_shape(d):
        from duck_delta_share_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        sigs = minhash_signatures(d, num_hashes=32, shingle_n=3)
        return lsh_candidate_pairs(sigs, num_hashes=32, bands=8)

    def sessionize_shape(e):
        from duck_delta_share_spark.operators.sessionize import sessionize

        return sessionize(e, gap_seconds=1800)

    def pagerank_shape(e):
        from pyspark.sql import Window

        # the LAZY plan of one pagerank_rounds round (the operator itself
        # checkpoints eagerly, which the harness can't time): id-remapped
        # user copies grow the transition-edge COUNT (event-type node set
        # stays 5) — the window + edge-agg shuffles grow with |events|,
        # the iterated frames stay node-sized
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        edges = (
            e.filter(F.col("event_type").isNotNull())
            .select(
                F.col("event_type").alias("src"),
                F.lead("event_type").over(w).alias("dst"),
            )
            .where(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
        )
        nodes = edges.select(F.col("src").alias("node")).union(
            edges.select(F.col("dst").alias("node"))
        ).distinct()
        outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
        ranks = nodes.select(
            F.col("node").alias("src"), F.lit(200000).cast("long").alias("rank_e")
        )
        contrib = (
            edges.join(outw, "src")
            .join(ranks, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("(rank_e * w) div out_w")).alias("c_e"))
        )
        return nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(30000) + F.expr("(85 * coalesce(c_e, 0)) div 100"))
            .cast("long")
            .alias("rank_e"),
        )

    def neardup_shape(emb):
        from duck_delta_share_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        return embedding_near_dup_pairs(emb, block_col="label", threshold=0.4)

    def packing_shape(d):
        from duck_delta_share_spark.operators.sessionize import pack_sequences

        out = pack_sequences(d, capacity_tokens=256)
        h = getattr(out, "_pack_sequences_cache", None)
        if h is not None:
            pending_unpersist.append(h)
        return out

    def heavy_hitters_shape(d):
        from duck_delta_share_spark.operators.sketches import heavy_hitter_terms

        return heavy_hitter_terms(d, threshold=1 / 128)

    def gapfill_shape(e):
        from duck_delta_share_spark.operators.timeseries import resample_gapfill

        return resample_gapfill(e, "ts", ["event_type"], "value", 3600)

    def interval_join_shape(e):
        from duck_delta_share_spark.operators.timeseries import interval_join_bucketed

        win = e.sparkSession.sql(
            """
            SELECT win_start, win_start + interval 2 hours AS win_end
            FROM (SELECT explode(sequence(
                     timestamp_ntz'2024-01-01 06:00:00',
                     timestamp_ntz'2024-01-30 06:00:00',
                     interval 1 day)) AS win_start)
            """
        )
        return interval_join_bucketed(e, win, "ts", "win_start", "win_end", 3600)

    def quantize_shape(emb):
        from duck_delta_share_spark.operators.embeddings import (
            int8_scale,
            quantize_int8,
        )

        scale = int8_scale("embedding")
        return emb.select(
            "vec_id", quantize_int8("embedding", scale).alias("q")
        )

    def ivm_shape(e):
        from duck_delta_share_spark.operators.incremental import (
            apply_changes_to_rollup,
            rollup_from_scratch,
        )

        prev = rollup_from_scratch(e, ["event_type"], {"total": "value"})
        changes = e.withColumn(
            "_change_type",
            F.when(F.col("event_id") % 10 == 0, F.lit("delete")).otherwise(
                F.lit("insert")
            ),
        )
        return apply_changes_to_rollup(prev, changes, ["event_type"], {"total": "value"})

    def zorder_shape(e):
        from duck_delta_share_spark.sinks import zorder_repartition

        pts = e.select(
            (F.col("user_id") % 997).alias("x"), (F.col("event_id") % 991).alias("y")
        )
        return zorder_repartition(pts, ["x", "y"], 32)

    def bloom_shape(e):
        from duck_delta_share_spark.operators.bloom import bloom_semi_join

        small = e.select((F.col("user_id") % 50_000).alias("k")).limit(500)
        return bloom_semi_join(
            e.withColumn("k", F.col("user_id") % 50_000), small, "k"
        )

    def dv_mask_shape(e):
        # deletion-vector hot path: the per-file roaring mask apply —
        # serialize a DV over ~1/7 of the rows and filter via np.isin,
        # the same executor-side op _read_task performs per task
        import numpy as np

        from duck_delta_share_spark.sources.deletion_vectors import (
            parse_dv,
            serialize_dv,
        )

        @F.pandas_udf("boolean")
        def masked(idx):
            import pandas as pd

            deleted = parse_dv(
                serialize_dv(np.arange(0, 200_000, 7, dtype=np.uint64))
            ).astype(np.int64)
            return pd.Series(~np.isin(idx.to_numpy() % 200_000, deleted))

        return e.filter(masked(F.col("event_id")))

    def int8_topk_shape(emb):
        from duck_delta_share_spark.operators.similarity import int8_topk

        # query set stays constant (first-copy ids) while the base grows:
        # the realistic ANN-serving growth mode
        return int8_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)

    def sq8_topk_shape(emb):
        from duck_delta_share_spark.operators.similarity import sq8_topk

        # same growth mode as int8: constant probe set, growing base;
        # train's d-row collect is corpus-size-independent by design
        return sq8_topk(emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5)

    def contamination_shape(d):
        from duck_delta_share_spark.operators.dedup import benchmark_containment

        bench = d.filter(F.col("doc_id") % 50 == 0).limit(200)
        return benchmark_containment(d, bench, shingle_n=3)

    def decontaminate_shape(d):
        from duck_delta_share_spark.operators.dedup import decontaminate_rewrite

        # same growth mode as contamination: benchmark capped (an eval set
        # is corpus-size-independent), corpus grows — the rewrite adds the
        # per-doc rebuild join on top of the broadcast probe
        bench = d.filter(F.col("doc_id") % 50 == 0).limit(200)
        return decontaminate_rewrite(
            d.filter(F.col("doc_id") % 50 != 0), bench, shingle_n=3
        )

    def entropy_shape(d):
        from duck_delta_share_spark.functions.text import char_entropy_signals

        return char_entropy_signals(d)

    def bigram_lm_shape(d):
        from duck_delta_share_spark.functions.text import tokenize, word_shingles

        toks = tokenize("text")
        train = d.filter(F.col("doc_id") % 2 == 0)
        bi = (
            train.select(F.explode(word_shingles(toks, 2)).alias("bg"))
            .groupBy("bg")
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        db = d.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", F.explode(word_shingles(toks, 2)).alias("bg")
        )
        return (
            db.join(bi, "bg", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.coalesce("cb", F.lit(0))).alias("s"))
        )

    def pq_shape(emb):
        from duck_delta_share_spark.operators.similarity import pq_topk

        return pq_topk(
            emb,
            emb.filter(F.col("vec_id") < 10),
            dim=64,
            m=8,
            k_codes=32,
            rerank_factor=8,
        )

    def substring_dedup_shape(d):
        from duck_delta_share_spark.operators.dedup import duplicated_span_stats

        # hash_grams: the production width-cut (8-byte xxhash64 shuffle
        # key instead of the 40-char window)
        return duplicated_span_stats(d, n=40, hash_grams=True)

    def opq_pq_shape(emb):
        from duck_delta_share_spark.operators.similarity import (
            pq_topk,
            train_opq_rotation,
        )

        R = train_opq_rotation(emb, dim=64, m=8, k_codes=16, opq_iters=2)
        return pq_topk(
            emb,
            emb.filter(F.col("vec_id") < 10),
            dim=64,
            m=8,
            k_codes=32,
            rerank_factor=8,
            rotation=R,
        )

    def ivfpq_shape(emb):
        from duck_delta_share_spark.operators.similarity import ivfpq_topk

        return ivfpq_topk(
            emb,
            emb.filter(F.col("vec_id") < 10),
            dim=64,
            k=5,
            n_centroids=16,
            n_probe=4,
            m=8,
            k_codes=32,
            rerank_factor=8,
        )

    def range_search_shape(emb):
        from duck_delta_share_spark.operators.similarity import int8_range_search

        return int8_range_search(
            emb, emb.filter(F.col("vec_id") < 25), min_score_e6=300_000
        )

    def gopher_shape(d):
        from duck_delta_share_spark.plans.llm_ops import gopher_quality_frame

        return gopher_quality_frame(d.select("doc_id", "text"))

    def identity_assign_shape(e):
        from duck_delta_share_spark.sources.delta_log import (
            _assign_identity_values,
        )

        df, _total, handle = _assign_identity_values(
            e.select("event_id", "user_id"), {"row_seq": (1, 1)}
        )
        # the sizing pass (collect of one row per partition) runs eagerly
        # above; the timed noop write covers the assignment map itself.
        # The API contract says the CALLER unpersists the handle — stash
        # it for the harness loop to release after the timed write.
        pending_unpersist.append(handle)
        return df

    def dsir_shape(d):
        # the registered query takes (spark, sf_dir); re-express its core
        # over the blowup frame: explode -> 4096-bucket aggs -> broadcast
        # ratio join -> per-doc sum
        from pyspark.sql import functions as FF

        from duck_delta_share_spark.functions.text import tokenize, word_shingles

        tok = d.select("doc_id", "lang", tokenize("text").alias("__toks"))
        toks = tok.select(
            "doc_id",
            "lang",
            FF.explode(
                FF.concat(FF.col("__toks"), word_shingles(FF.col("__toks"), 2))
            ).alias("term"),
        )
        b = toks.select(
            "doc_id",
            "lang",
            (
                FF.conv(FF.substring(FF.md5("term"), 1, 7), 16, 10).cast("long")
                % 4096
            ).alias("bucket"),
        )
        raw = b.groupBy("bucket").agg(FF.count(FF.lit(1)).alias("qc"))
        tgt = (
            b.where(FF.col("lang") == "en")
            .groupBy("bucket")
            .agg(FF.count(FF.lit(1)).alias("tc"))
        )
        ratio = raw.join(tgt, "bucket", "left").select(
            "bucket",
            FF.floor(
                (FF.coalesce(FF.col("tc"), FF.lit(0)) + 1)
                * FF.lit(1000000.0)
                / (FF.col("qc") + 1)
            )
            .cast("long")
            .alias("ratio_e6"),
        )
        return (
            b.join(FF.broadcast(ratio), "bucket")
            .groupBy("doc_id")
            .agg(FF.sum("ratio_e6").cast("long").alias("dsir_score"))
        )

    def funnel_shape(e):
        from pyspark.sql import functions as FF

        ev = e.where(FF.col("event_type").isin("view", "click", "purchase"))
        code = (
            FF.when(FF.col("event_type") == "view", 1)
            .when(FF.col("event_type") == "click", 2)
            .otherwise(3)
        )
        enc = ev.select(
            "user_id",
            (FF.unix_micros(FF.col("ts").cast("timestamp")) * 8 + code)
            .cast("long")
            .alias("e"),
        )
        # mirrors the product query's bounded-memory running-min shape
        # (functions_sweep.funnel_stages) — the old collect_list fold
        # materialized a hot user's whole history in one aggregation row
        from pyspark.sql import Window as W

        win = 86_400_000_000
        ts = FF.floor(FF.col("e") / 8)
        kind = FF.col("e") % 8
        wrun = (
            W.partitionBy("user_id")
            .orderBy("e")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        s1 = enc.withColumn("__vrun", FF.min(FF.when(kind == 1, ts)).over(wrun))
        c_cand = FF.when((kind == 2) & FF.col("__vrun").isNotNull(), ts)
        s2 = s1.withColumn("__ccand", c_cand).withColumn(
            "__crun", FF.min(c_cand).over(wrun)
        )
        p_cand = FF.when(
            (kind == 3)
            & FF.col("__crun").isNotNull()
            & (FF.col("__crun") - FF.col("__vrun") <= win),
            ts,
        )
        res = (
            s2.select(
                "user_id",
                FF.when(kind == 1, ts).alias("__vc"),
                FF.col("__ccand"),
                p_cand.alias("__pc"),
            )
            .groupBy("user_id")
            .agg(
                FF.min("__vc").alias("v1"),
                FF.min("__ccand").alias("c1"),
                FF.min("__pc").alias("p1"),
            )
        )
        stage = (
            FF.when(
                FF.col("p1").isNotNull() & (FF.col("p1") - FF.col("c1") <= win), 3
            )
            .when(
                FF.col("c1").isNotNull() & (FF.col("c1") - FF.col("v1") <= win), 2
            )
            .when(FF.col("v1").isNotNull(), 1)
            .otherwise(0)
        )
        return res.select("user_id", stage.cast("int").alias("s"))

    def scd2_fold_shape(e):
        # the scd2 batch fold's data plane: per-key version chain with
        # no-op-churn collapse (one window shuffle keyed on the dimension
        # key), over an events-derived change feed
        from pyspark.sql import Window as W
        from pyspark.sql import functions as FF

        ch = e.select(
            FF.col("user_id").alias("k"),
            FF.col("event_type").alias("v"),
            FF.col("event_id").alias("__v"),
        )
        w = W.partitionBy("k").orderBy("__v")
        real = ch.withColumn("__p", FF.lag("v").over(w)).where(
            FF.col("__p").isNull() | (FF.col("v") != FF.col("__p"))
        )
        return real.select(
            "k",
            "v",
            FF.col("__v").alias("valid_from"),
            FF.lead("__v").over(w).alias("valid_to"),
            FF.lead("__v").over(w).isNull().cast("int").alias("is_current"),
        )

    def cdc_latest_shape(e):
        # apply_cdc_batch's data plane: latest action per key with the
        # churn tie-break (one window shuffle), then the upsert/delete split
        from pyspark.sql import Window as W
        from pyspark.sql import functions as FF

        ch = e.select(
            FF.col("user_id").alias("k"),
            FF.col("value").alias("v"),
            (FF.col("event_id") % 50).alias("_commit_version"),
            FF.when(FF.col("event_id") % 11 == 0, "delete")
            .when(FF.col("event_id") % 3 == 0, "update_postimage")
            .otherwise("insert")
            .alias("_change_type"),
        )
        w = W.partitionBy("k").orderBy(
            FF.col("_commit_version").desc(), FF.col("_change_type").desc()
        )
        latest = ch.withColumn("__rn", FF.row_number().over(w)).where("__rn = 1")
        return latest.select(
            "k", "v", (FF.col("_change_type") == "delete").alias("is_delete")
        )

    def pretrain_shape(d):
        # the wave-9 capstone composition: exact dedup -> Gopher rules ->
        # sequence packing (three shuffles, each keyed differently)
        from duck_delta_share_spark.operators import dedup as dd
        from duck_delta_share_spark.operators.sessionize import pack_sequences
        from duck_delta_share_spark.plans.llm_ops import gopher_quality_frame

        kept = dd.exact_dedup(d.select("doc_id", "text"), "text", "doc_id")
        survivors = (
            gopher_quality_frame(kept, carry=["text"])
            .where("keep = 1")
            .select("doc_id", "text")
        )
        out = pack_sequences(survivors, capacity_tokens=256)
        h = getattr(out, "_pack_sequences_cache", None)
        if h is not None:
            pending_unpersist.append(h)
        return out

    def semantic_dedup_shape(emb):
        # production posture: k grows with the corpus (SemDeDup uses
        # k ~ n/1000; here n/100 so the small frame still gets >= 20
        # clusters) and the arrow assignment engine (centroid matrix in
        # the task closure — the literal fold is for coarse oracle-grade
        # k). The count() runs during frame construction, OUTSIDE the
        # timed window.
        from duck_delta_share_spark.operators.dedup import semantic_dedup

        v = emb.select("vec_id", "embedding")
        k = max(20, v.count() // 100)
        return semantic_dedup(v, k=k, threshold=0.35, engine="arrow")

    def kmeans_shape(emb):
        from duck_delta_share_spark.operators.embeddings import kmeans_lloyd_update

        v = emb.select("vec_id", "embedding")
        k = max(20, v.count() // 100)
        return kmeans_lloyd_update(v, k=k, engine="arrow")

    def bm25_shape(d):
        # the registered query's core over the blowup frame: corpus-stats
        # agg + semi-filtered explode -> tf -> broadcast idf join
        from pyspark.sql import functions as FF

        from duck_delta_share_spark.functions.text import tokenize
        from duck_delta_share_spark.plans.registry import davg

        tok = d.select("doc_id", tokenize("text").alias("__toks"))
        totals = tok.select(FF.size("__toks").cast("long").alias("dl")).agg(
            FF.count(FF.lit(1)).cast("long").alias("n_docs"),
            davg("dl").alias("avgdl"),
        )
        terms = tok.select(
            "doc_id",
            FF.size("__toks").cast("long").alias("dl"),
            FF.explode("__toks").alias("term"),
        ).where(FF.col("term").isin("hash", "join", "scan", "vector"))
        tf = terms.groupBy("doc_id", "term").agg(
            FF.count(FF.lit(1)).cast("long").alias("tf"),
            FF.first("dl").alias("dl"),
        )
        df_t = tf.groupBy("term").agg(FF.count(FF.lit(1)).cast("long").alias("df"))
        idf = df_t.crossJoin(FF.broadcast(totals)).select(
            "term",
            FF.round(
                FF.log((FF.col("n_docs") - FF.col("df") + 0.5) / (FF.col("df") + 0.5) + 1), 6
            ).alias("idf"),
        )
        return (
            tf.join(FF.broadcast(idf), "term")
            .crossJoin(FF.broadcast(totals.select("avgdl")))
            .select(
                "doc_id",
                (FF.col("idf") * (FF.col("tf") * 2.2)
                 / (FF.col("tf") + 1.2 * (0.25 + 0.75 * FF.col("dl") / FF.col("avgdl")))
                 ).alias("s"),
            )
            .groupBy("doc_id")
            .agg(FF.sum("s").alias("bm25"))
        )

    def bag_dedup_shape(d):
        # one window shuffle keyed on the sorted-token fingerprint
        from pyspark.sql import Window as W

        norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
        fp = F.md5(F.concat_ws(" ", F.array_sort(F.split(norm, " "))))
        w = W.partitionBy("bag_fp").orderBy("doc_id")
        return (
            d.select("doc_id", fp.alias("bag_fp"))
            .withColumn("kept", (F.row_number().over(w) == 1).cast("int"))
        )

    def novelty_shape(d):
        # carried-stats: df via one window over the gram key, re-agg by doc
        # (gram array materialized in its own projection — an inline HOF
        # re-evaluates per exploded row, 16x slower)
        from pyspark.sql import Window as W

        from duck_delta_share_spark.functions.text import tokenize, word_shingles

        garr = d.select(
            "doc_id",
            F.array_distinct(word_shingles(tokenize("text"), 2)).alias("__g"),
        )
        rows = garr.select(
            "doc_id", F.size("__g").alias("ng"), F.explode("__g").alias("gram")
        )
        scored = rows.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("gram")))
        return scored.groupBy("doc_id").agg(
            F.first("ng").alias("n"),
            F.sum((F.col("df") == 1).cast("long")).alias("novel"),
        )

    def oov_shape(d):
        # O(K) vocab agg -> broadcast left join -> per-doc agg
        from duck_delta_share_spark.functions.text import tokenize

        toks = d.select("doc_id", F.explode(tokenize("text")).alias("term"))
        vocab = (
            toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(16)
            .select("term", F.lit(1).alias("iv"))
        )
        return (
            toks.join(F.broadcast(vocab), "term", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("iv").isNull().cast("long")).alias("oov"),
            )
        )

    def transitions_shape(e):
        # one user-keyed window shuffle + tiny (prev, next) hash agg
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            e.select(
                F.col("event_type").alias("p"),
                F.lead("event_type").over(w).alias("nx"),
            )
            .where(F.col("nx").isNotNull())
            .groupBy("p", "nx")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def pmi_shape(d):
        # two corpus passes (unigram + bigram aggs), totals folded from
        # the count frames, UN-hinted vocab joins (AQE decides)
        from duck_delta_share_spark.functions.text import tokenize, word_shingles

        toks = d.select(
            F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks")
        )
        uni = toks.select(F.explode("toks").alias("term"))
        bg_arr = toks.select(word_shingles(F.col("toks"), 2).alias("bgs"))
        big = bg_arr.select(F.explode("bgs").alias("bg"))
        cx = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
        bgc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cxy"))
        n_tok = cx.agg(F.sum("c").cast("double").alias("n_tok"))
        n_big = bgc.agg(F.sum("cxy").cast("double").alias("n_big"))
        return (
            bgc.where(F.col("cxy") >= 10)
            .withColumn("p", F.split_part("bg", F.lit(" "), F.lit(1)))
            .withColumn("nx", F.split_part("bg", F.lit(" "), F.lit(2)))
            .join(cx.withColumnsRenamed({"term": "p", "c": "c1"}), "p")
            .join(cx.withColumnsRenamed({"term": "nx", "c": "c2"}), "nx")
            .crossJoin(F.broadcast(n_tok))
            .crossJoin(F.broadcast(n_big))
            .select(
                "p",
                "nx",
                F.log(
                    (F.col("cxy") * F.col("n_tok") * F.col("n_tok"))
                    / (F.col("n_big") * F.col("c1") * F.col("c2"))
                ).alias("pmi"),
            )
        )

    def winsorize_shape(emb):
        # two (dim, x) shuffles into d groups — the exact type-1 rank
        # holds group values, the documented approx-swap lever at PB scale
        from pyspark.sql import Window as W

        x = emb.select(F.posexplode("embedding").alias("d", "xf")).select(
            "d", F.col("xf").cast("double").alias("x")
        )
        r = x.select(
            "d",
            "x",
            F.row_number().over(W.partitionBy("d").orderBy("x")).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy("d")).alias("n"),
        )
        p = r.groupBy("d").agg(
            F.min(
                F.when(F.col("rn") == F.expr("(n + 99) DIV 100"), F.col("x"))
            ).alias("p01"),
            F.min(
                F.when(F.col("rn") == F.expr("(99 * n + 99) DIV 100"), F.col("x"))
            ).alias("p99"),
        )
        return (
            x.join(p, "d")
            .select(
                "d",
                F.least(F.greatest("x", F.col("p01")), F.col("p99")).alias("cl"),
            )
            .groupBy("d")
            .agg(F.avg("cl").alias("m"))
        )

    def retention_shape(e):
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id")
        cw = F.date_trunc("week", F.min("ts").over(w))
        off = (
            F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))), F.to_date(cw)) / 7
        ).cast("int")
        return (
            e.select("user_id", F.to_date(cw).alias("cw"), off.alias("off"))
            .groupBy("cw", "off")
            .agg(F.countDistinct("user_id").alias("n_users"))
        )


    # edit-distance blocking needs its own growth mode: the standard
    # copy{i}-PREFIX perturbation overwrites the lead tokens, collapsing
    # every copy into ONE block per copy (the single-token key measured
    # 149x at 8x; even the two-token key still pays ~18x because the
    # prefix eats one of its tokens). The realistic corpus-growth mode —
    # new topics/domains — REMAPS the block key per copy instead: tag the
    # first two tokens with the copy id, so block COUNT grows 8x while
    # block SIZE stays put. Built lazily (cache+count only when the op
    # filter actually selects edit_distance — r7 self-review).
    def _build_dblkn():
        parts = []
        for i in range(n):
            dd = d1.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
            )
            if i > 0:
                dd = dd.withColumn(
                    "text",
                    F.regexp_replace(
                        "text", r"^(\S+) (\S+)", f"c{i}$1 c{i}$2"
                    ),
                )
            parts.append(dd)
        out = parts[0]
        for _p in parts[1:]:
            out = out.unionByName(_p)
        out = out.cache()
        out.count()
        return out

    # the six r7 query shapes run the SHARED frame-parameterized cores
    # (plans/llm_ops.py, plans/functions_sweep.py) — the registry plan
    # and the measured scale factor can never drift apart
    from duck_delta_share_spark.plans.functions_sweep import (
        event_debounce_core,
        event_volume_anomaly_core,
    )
    from duck_delta_share_spark.plans.functions_sweep import (
        agg_quantiles_mergeable_core,
        key_skew_profile_core,
        mad_outlier_profile_core,
        numeric_corr_matrix_core,
        table_profile_core,
        user_burstiness_core,
    )
    from duck_delta_share_spark.plans.llm_ops import (
        crawl_novelty_by_shard_core as _crawl_novelty_core,
    )
    from duck_delta_share_spark.plans.llm_ops import (
        dedup_savings_by_source_core as _dedup_savings_core,
    )
    from duck_delta_share_spark.plans.llm_ops import (
        boilerplate_chunk_dedup_core,
        doclen_log2_histogram_core,
        minhash_recall_audit_core,
        split_leakage_audit_core,
        conversion_lag_core,
        dedup_cluster_histogram_core,
        edit_distance_core,
        skipgram_core,
        source_overlap_matrix_core,
        source_term_lift_core,
        split_kl_divergence_core,
        token_budget_core,
    )
    from duck_delta_share_spark.plans.timeseries_queries import (
        ohlc_bars_core,
    )

    def hard_negatives_shape(emb):
        # constant query set (first-copy ids), growing base + label space
        # (label is id-remapped per copy): the realistic mining growth
        from duck_delta_share_spark.operators.similarity import (
            brute_force_topk,
        )

        return brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, exact=False,
            contrast_col="label",
        )

    def incremental_dedup_shape(d):
        # the QUERY plan of incremental_dedup_new_shard minus the Delta
        # I/O: within-shard exact dedup + anti-join of 16-byte fps
        # against the history store projection — the daily-ingest shape
        from pyspark.sql import Window

        from duck_delta_share_spark.functions.text import fingerprint

        bucket = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 100
        )
        dd2 = d.select("doc_id", "text", bucket.alias("__b"))
        hist_fps = (
            dd2.where(F.col("__b") < 70)
            .select(fingerprint("text").alias("__fp"))
            .dropDuplicates(["__fp"])
        )
        w = Window.partitionBy("__fp").orderBy("doc_id")
        within = (
            dd2.where(F.col("__b") >= 70)
            .withColumn("__fp", fingerprint("text"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        )
        return within.join(hist_fps, "__fp", "left_anti").select("doc_id", "__fp")

    def stratified_audit_shape(d):
        from duck_delta_share_spark.plans.llm_ops import stratified_sample_core

        return stratified_sample_core(d)

    def ivf_persisted_shape(emb):
        # full persisted-IVF lifecycle: train (bounded sample), assign +
        # partitioned index write, pruned probe — Delta I/O included
        import tempfile
        from pathlib import Path as _P

        from duck_delta_share_spark.operators.similarity import (
            ivf_build_index,
            ivf_probe_index,
        )

        idx = _P(tempfile.mkdtemp(prefix="ddss_scale_ivfidx_")) / "index"
        ivf_build_index(spark, emb, idx, dim=64, n_centroids=32)
        return ivf_probe_index(
            spark, emb.filter(F.col("vec_id") < 10), idx, k=5, n_probe=8
        )

    def incremental_neardup_shape(d, cap_mode="window", cap=2000):
        # the e2e daily near-dup ingest: build the band-bucket store from
        # history (signatures + Delta write INCLUDED — that cost scales
        # too), then the shard-vs-store candidate join at the production
        # cap
        import tempfile
        from pathlib import Path as _P

        from duck_delta_share_spark.operators.dedup import (
            incremental_neardup_candidates,
            minhash_md5_band_rows,
            minhash_md5_signatures,
        )
        from duck_delta_share_spark.sources.delta_log import write_delta

        bucket = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 100
        )
        dd2 = d.select("doc_id", "text", bucket.alias("__b"))
        hist = dd2.where(F.col("__b") < 70).drop("__b")
        shard = dd2.where(F.col("__b") >= 70).drop("__b")
        store = _P(tempfile.mkdtemp(prefix="ddss_scale_incnd_")) / "buckets"
        write_delta(
            minhash_md5_band_rows(
                minhash_md5_signatures(hist, num_hashes=8, shingle_n=3),
                num_hashes=8,
                bands=4,
            ),
            store,
        )
        return incremental_neardup_candidates(
            spark, shard, store, num_hashes=8, bands=4, shingle_n=3,
            max_bucket_size=cap, cap_mode=cap_mode,
        )

    def _hot_corpus(d):
        # SKEW-ADVERSARIAL variant (VERDICT r10 item 8): ~10% of EVERY
        # copy gets the SAME text — the hot (band, bucket) GROWS with N
        # (doc_id % 1e8 makes the hot set align across blowup copies),
        # unlike the uniform corpus where perturb_text keeps buckets
        # copy-local. One bucket then carries ~10% of all band rows.
        hot = F.pmod(F.col("doc_id"), F.lit(100_000_000)) % 10 == 0
        return d.withColumn(
            "text",
            F.when(hot, F.lit("identical hot boilerplate body " * 8)).otherwise(
                F.col("text")
            ),
        )

    def _incremental_neardup_hot(mode):
        # cap 400 < the 1x hot-bucket size (~500 union rows), so the hot
        # bucket is over-cap at BOTH scales — the factor then measures
        # the cap machinery under a growing hot key, not an asymmetric
        # drop (at 1x under-cap the hot pairs would be GENERATED, making
        # the 1x side artificially expensive and the factor meaningless)
        def shape(d):
            return incremental_neardup_shape(_hot_corpus(d), cap_mode=mode, cap=400)

        return shape

    ops = [
        ("q1_agg", q1_shape, l1, lN),
        ("incremental_dedup", incremental_dedup_shape, d1, dN),
        ("incremental_neardup", incremental_neardup_shape, d1, dN),
        ("incremental_neardup_hot", _incremental_neardup_hot("window"), d1, dN),
        (
            "incremental_neardup_hot_bcast",
            _incremental_neardup_hot("broadcast"),
            d1,
            dN,
        ),
        ("stratified_audit", stratified_audit_shape, d1, dN),
        ("crawl_novelty", _crawl_novelty_core, d1, dN),
        ("dedup_savings", _dedup_savings_core, d1, dN),
        ("ivf_persisted", ivf_persisted_shape, emb1, embN),
        ("minhash_lsh", minhash_shape, d1, dN),
        ("sessionization", sessionize_shape, e1, eN),
        ("pagerank_round", pagerank_shape, e1, eN),
        ("embedding_neardup", neardup_shape, emb1, embN),
        ("sequence_packing", packing_shape, d1, dN),
        ("heavy_hitters", heavy_hitters_shape, d1, dN),
        ("resample_gapfill", gapfill_shape, e1, eN),
        ("interval_join", interval_join_shape, e1, eN),
        ("embedding_quantize", quantize_shape, emb1, embN),
        ("incremental_rollup", ivm_shape, e1, eN),
        ("zorder_repartition", zorder_shape, e1, eN),
        ("bloom_semi_join", bloom_shape, e1, eN),
        ("dv_mask_apply", dv_mask_shape, e1, eN),
        ("int8_topk", int8_topk_shape, emb1, embN),
        ("sq8_topk", sq8_topk_shape, emb1, embN),
        ("pq_topk", pq_shape, emb1, embN),
        ("benchmark_contamination", contamination_shape, d1, dN),
        ("decontaminate_rewrite", decontaminate_shape, d1, dN),
        ("char_entropy", entropy_shape, d1, dN),
        ("bigram_lm_join", bigram_lm_shape, d1, dN),
        ("substring_dedup", substring_dedup_shape, d1, dN),
        ("opq_pq_topk", opq_pq_shape, emb1, embN),
        ("ivfpq_topk", ivfpq_shape, emb1, embN),
        ("range_search", range_search_shape, emb1, embN),
        ("gopher_rules", gopher_shape, d1, dN),
        ("identity_assign", identity_assign_shape, e1, eN),
        ("dsir_weights", dsir_shape, d1, dN),
        ("funnel_fold", funnel_shape, e1, eN),
        ("scd2_fold", scd2_fold_shape, e1, eN),
        ("cdc_latest", cdc_latest_shape, e1, eN),
        ("pretrain_pipeline", pretrain_shape, d1, dN),
        ("semantic_dedup", semantic_dedup_shape, emb1, embN),
        ("kmeans_round", kmeans_shape, emb1, embN),
        ("bm25_score", bm25_shape, d1, dN),
        ("bag_dedup", bag_dedup_shape, d1, dN),
        ("ngram_novelty", novelty_shape, d1, dN),
        ("oov_rate", oov_shape, d1, dN),
        ("retention_cohorts", retention_shape, e1, eN),
        ("event_transitions", transitions_shape, e1, eN),
        ("pmi_bigrams", pmi_shape, d1, dN),
        ("winsorized_stats", winsorize_shape, emb1, embN),
        ("edit_distance", edit_distance_core, d1, None),
        ("skipgram_cooccur", skipgram_core, d1, dN),
        ("source_term_lift", source_term_lift_core, d1, dN),
        ("token_budget", token_budget_core, d1, dN),
        ("event_debounce", event_debounce_core, e1, eN),
        ("volume_anomaly", event_volume_anomaly_core, e1, eN),
        ("hard_negatives", hard_negatives_shape, emb1, embN),
        ("dedup_histogram", dedup_cluster_histogram_core, d1, dN),
        ("conversion_lag", conversion_lag_core, e1, eN),
        ("boilerplate_chunks", boilerplate_chunk_dedup_core, d1, dN),
        ("source_overlap", source_overlap_matrix_core, d1, dN),
        ("split_kl", split_kl_divergence_core, d1, dN),
        ("ohlc_bars", ohlc_bars_core, e1, eN),
        ("user_burstiness", user_burstiness_core, e1, eN),
        ("agg_quantiles", agg_quantiles_mergeable_core, l1, lN),
        ("key_skew", key_skew_profile_core, e1, eN),
        ("table_profile", table_profile_core, l1, lN),
        ("numeric_corr", numeric_corr_matrix_core, l1, lN),
        ("mad_outlier", mad_outlier_profile_core, e1, eN),
        ("minhash_recall", minhash_recall_audit_core, d1, dN),
        ("doclen_histogram", doclen_log2_histogram_core, d1, dN),
        ("split_leakage", split_leakage_audit_core, d1, dN),
    ]
    if len(sys.argv) > 2:
        wanted = set(sys.argv[2].split(","))
        unknown = wanted - {name for name, *_ in ops}
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        ops = [o for o in ops if o[0] in wanted]
    results = []
    for name, fn, small, big in ops:
        if big is None:  # deferred build (edit_distance's remap corpus)
            big = _build_dblkn()
        fn(small).write.format("noop").mode("overwrite").save()  # warm
        t1 = timed(fn(small))
        tN = timed(fn(big))
        while pending_unpersist:
            pending_unpersist.pop().unpersist()
        factor = round(tN / t1, 2)
        results.append({"op": name, "t1": round(t1, 2), "tN": round(tN, 2), "factor": factor})
        print(json.dumps(results[-1]))
    worst = max(r["factor"] for r in results)
    print(json.dumps({"n_copies": n, "worst_factor": worst, "linear_bound": n}))


if __name__ == "__main__":
    main()
