"""Round-10 one-off: full-registry oracle sweep at sf0.1 (VERDICT item 1).

documents/embeddings only differentiate at sf0.1, so most text/embedding
oracles have never been hash-compared on the larger corpus. Same recipe as
.claude/skills/verify, pointed at /root/testdata/sf0.1.
"""
import sys, time, json, traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
from parity import duck_connection, compare_frames

SF = "/root/testdata/sf0.1"
con = duck_connection(SF)
qs, osql = E.queries(), E.oracle_sql()
fails, timings = [], {}
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        if name in osql:
            errs = compare_frames(sdf.toPandas(), con.execute(osql[name]).df(), name)
            if errs:
                fails.append((name, errs[:3]))
        else:
            sdf.count()
        timings[name] = round(time.time() - t0, 2)
        print(f"[sf0.1] {name}: {'FAIL' if fails and fails[-1][0] == name else 'ok'} "
              f"{timings[name]}s", flush=True)
    except Exception as e:
        timings[name] = round(time.time() - t0, 2)
        fails.append((name, [f"EXC: {type(e).__name__}: {e}"]))
        print(f"[sf0.1] {name}: EXC {timings[name]}s {type(e).__name__}: {e}",
              flush=True)
        traceback.print_exc()

with open("/root/repo/.r10_sf01_sweep_result.json", "w") as f:
    json.dump({"fails": fails, "timings": timings}, f, indent=1)
print("FAILURES:", fails or "none", flush=True)
sys.exit(1 if fails else 0)
