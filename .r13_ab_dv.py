#!/usr/bin/env python
"""A/B: DV-masked snapshot read — Python DataSource vs the r13 native
scan + broadcast row-index anti-join, on the delta_delete_dv shape."""
import statistics, sys, tempfile, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
SF_DIR = "/root/testdata/sf0.1"

def _force(df): df.write.format("noop").mode("overwrite").save()

def main():
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.session import get_spark
    from duck_delta_share_spark.sources.delta_log import (
        _datasource_read, delete_where, read_delta, write_delta,
    )
    spark = get_spark(app_name="r13-ab-dv")
    spark.sparkContext.setLogLevel("ERROR")
    t = Path(tempfile.mkdtemp(prefix="r13_dv_ab_")) / "t"
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal")
    write_delta(c.repartition(4), t)
    delete_where(spark, t, "c_acctbal < 0 OR c_nationkey = 7")

    def old(): return _datasource_read(spark, t, None, False).orderBy("c_custkey")
    def new(): return read_delta(spark, t).orderBy("c_custkey")

    a = [tuple(r) for r in old().collect()]
    b = [tuple(r) for r in new().collect()]
    assert a == b, "DIVERGED"
    print("identical:", len(a), "rows")
    for f in (old, new): _force(f())
    ts = {"old": [], "new": []}
    for i in range(7):
        order = (("old", old), ("new", new)) if i % 2 == 0 else (("new", new), ("old", old))
        for nm, fn in order:
            t0 = time.perf_counter(); _force(fn()); ts[nm].append(time.perf_counter() - t0)
    for nm, v in ts.items():
        print(f"{nm}: median {statistics.median(v):.3f} min {min(v):.3f} max {max(v):.3f}")
    spark.stop()

if __name__ == "__main__":
    main()
