#!/usr/bin/env python
"""A/B: LSH banded pair self-join — current (lineage evaluated per join
side) vs localCheckpoint'ed capped band rows (one evaluation, both sides
read cached blocks). Tests BOTH bench queries' shapes."""
import statistics, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
SF_DIR = "/root/testdata/sf0.1"

def _force(df): df.write.format("noop").mode("overwrite").save()

def main():
    from pyspark.sql import functions as F
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.session import get_spark
    from duck_delta_share_spark.operators import dedup as dd
    from duck_delta_share_spark.operators.dedup import (
        _cap_buckets, minhash_md5_band_rows,
    )

    spark = get_spark(app_name="r13-ab-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")

    def pairs_from(exploded, id_col="doc_id"):
        a = exploded.alias("a"); b = exploded.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                      & (F.col("a.bucket") == F.col("b.bucket"))
                      & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )

    # md5 twin query shape
    def md5_old():
        sigs = dd.minhash_md5_signatures(d, num_hashes=8, shingle_n=3)
        return dd.minhash_md5_lsh_pairs(sigs, num_hashes=8, bands=4).orderBy("id_a", "id_b")

    def md5_new():
        sigs = dd.minhash_md5_signatures(d, num_hashes=8, shingle_n=3)
        exploded = minhash_md5_band_rows(sigs, "doc_id", 8, 4)
        exploded = _cap_buckets(exploded, ["band", "bucket"], 2000).localCheckpoint(eager=False)
        return pairs_from(exploded).orderBy("id_a", "id_b")

    # production neardup query shape (sigs already checkpointed)
    def nd_old():
        from duck_delta_share_spark.plans import QUERIES
        return QUERIES["minhash_lsh_neardup"].spark_fn(spark, SF_DIR)

    def nd_new():
        sigs = dd.minhash_signatures(d, num_hashes=32, shingle_n=3).localCheckpoint(eager=False)
        rows_per_band = 4
        band_cols = []
        for bdx in range(8):
            cols = [F.col(f"mh_{bdx * rows_per_band + r}") for r in range(rows_per_band)]
            band_cols.append(F.struct(F.lit(bdx).alias("band"), F.xxhash64(*cols).alias("bucket")))
        exploded = sigs.select(F.col("doc_id"), F.explode(F.array(*band_cols)).alias("bb")).select(
            "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        exploded = _cap_buckets(exploded, ["band", "bucket"], 2000).localCheckpoint(eager=False)
        pairs = pairs_from(exploded)
        return dd.minhash_jaccard_estimate(sigs, pairs, num_hashes=32).orderBy("id_a", "id_b")

    for name, old, new in (("md5", md5_old, md5_new), ("neardup", nd_old, nd_new)):
        a = [tuple(r) for r in old().collect()]
        b = [tuple(r) for r in new().collect()]
        assert a == b, f"{name} DIVERGED {len(a)} vs {len(b)}"
        print(f"{name}: identical {len(a)} pairs")
        _force(old()); _force(new())
        ts = {"old": [], "new": []}
        for i in range(5):
            order = (("old", old), ("new", new)) if i % 2 == 0 else (("new", new), ("old", old))
            for nm, fn in order:
                t0 = time.perf_counter(); _force(fn()); ts[nm].append(time.perf_counter() - t0)
        for nm, v in ts.items():
            print(f"{name}/{nm}: median {statistics.median(v):.3f} min {min(v):.3f} max {max(v):.3f}")
    spark.stop()

if __name__ == "__main__":
    main()
