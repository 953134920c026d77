"""Profile ONE registry query: run it once (warm) + once (timed) and
dump every Spark job's duration/description from the UI REST API —
the guide §1.1 empirical loop without leaving the terminal.

    python scripts/profile_jobs.py <query_name> [passes]

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.  NOT part of the bench
contract — an optimization-iteration tool only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from big_data_validator_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    name = sys.argv[1]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bdv-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[name]

    # warm pass (untimed, matches bench methodology)
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    first_job_after_warm = None
    st = spark.sparkContext.statusTracker()
    ids = st.getJobIdsForGroup()

    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4049/api/v1/applications/{app_id}/jobs"
    jobs = json.load(urllib.request.urlopen(url))
    jobs.sort(key=lambda j: j["jobId"])
    print(f"\n=== {name}: timed pass {wall:.3f}s ===")
    total = 0.0
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    for j in jobs:
        dur = ts(j["completionTime"]) - ts(j["submissionTime"]) if j.get("completionTime") else -1
        rows.append((j["jobId"], dur, j.get("numTasks"), (j.get("description") or j.get("name") or "")[:110]))
    # keep only the second half (the timed pass) heuristically: jobs are
    # monotonically ordered; print all with a midline marker instead
    for jid, dur, ntasks, desc in rows:
        print(f"job {jid:4d}  {dur:7.3f}s  tasks={ntasks:5d}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
