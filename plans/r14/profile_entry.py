"""Profile one or more bench entries with Spark event logging: per-job
wall time + per-stage shuffle bytes, attributed by job description.

Usage: python /tmp/profile_entry.py <entry> [<entry> ...]
Special names: lifecycle (runs bench.lifecycle_bench), plus any registry
query name (runs fn(spark, sf_dir) -> noop sink).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

EVDIR = "/tmp/spark-events"
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession

from polars_lake_spark.session import _RUNTIME_CONFS, configure_session

cpus = os.environ["SPARK_GRAFT_CPUS"]
builder = (
    SparkSession.builder.appName("profile")
    .master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .config("spark.sql.files.maxPartitionBytes", "134217728")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", EVDIR)
    .config("spark.eventLog.compress", "false")
)
for k, v in _RUNTIME_CONFS.items():
    builder = builder.config(k, v)
spark = configure_session(builder.getOrCreate())

# warmups (mirror bench.py)
spark.read.parquet(f"{sf_dir}/region.parquet").count()
n_workers = spark.sparkContext.defaultParallelism
spark.range(n_workers).repartition(n_workers).mapInPandas(
    lambda b: b, schema="id long"
).count()

from polars_lake_spark.queries import all_queries

registry = all_queries()

marks = []  # (label, t0, t1)


def run(label, thunk):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    thunk()
    t1 = time.perf_counter()
    spark.sparkContext.setJobDescription(None)
    marks.append((label, t0, t1))
    print(f"== {label}: {t1 - t0:.3f}s", flush=True)
    import gc

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


for name in sys.argv[1:]:
    if name == "lifecycle":
        import bench

        run("lifecycle", lambda: bench.lifecycle_bench(spark, sf_dir))
    elif name == "ivf_setup":
        import bench

        run("ivf_setup", lambda: bench.ivf_amortized_setup(spark, sf_dir))
    elif name == "dedup_setup":
        import bench

        run("dedup_setup", lambda: bench.dedup_amortized_setup(spark, sf_dir))
    else:
        fn = registry[name].fn
        run(
            name,
            lambda fn=fn: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

app_id = spark.sparkContext.applicationId
spark.stop()

# ---- parse event log ----
import glob
cand = glob.glob(os.path.join(EVDIR, app_id)) + glob.glob(
    os.path.join(EVDIR, f"eventlog_v2_{app_id}", "events_*")
)
path = cand[0]
jobs = {}
stages = {}
with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except Exception:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {
                "desc": e.get("Properties", {}).get(
                    "spark.job.description", ""
                ),
                "start": e["Submission Time"],
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", ""),
                "dur": (comp - sub) / 1000.0 if sub and comp else None,
                "tasks": si.get("Number of Tasks"),
            }

print("\n#### per-job breakdown (jobs >= 0.05s) ####")
for jid in sorted(jobs):
    j = jobs[jid]
    if "end" not in j:
        continue
    dur = (j["end"] - j["start"]) / 1000.0
    if dur < 0.05:
        continue
    st = [
        f"s{sid}:{stages[sid]['dur']:.2f}s/{stages[sid]['tasks']}t"
        for sid in j["stages"]
        if sid in stages and stages[sid]["dur"]
    ]
    print(f"job {jid:4d} {dur:7.2f}s  [{j['desc'][:40]:40s}] {' '.join(st)}")

print("\n#### job count + total per description ####")
agg = {}
for j in jobs.values():
    if "end" not in j:
        continue
    d = j["desc"][:40]
    a = agg.setdefault(d, [0, 0.0])
    a[0] += 1
    a[1] += (j["end"] - j["start"]) / 1000.0
for d, (n, t) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
    print(f"{n:4d} jobs {t:8.2f}s  {d}")
