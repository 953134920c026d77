"""Time a SUBSET of registry entries with bench.py's exact methodology
(one untimed warm pass, then median of N timed passes, noop sink) —
for optimization iteration without paying the full-fleet bench.

    python scripts/time_queries.py name1 name2 ...

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_PASSES.
Prints one JSON line {name: median_sec} plus a min map.  NOT the
driver contract — bench.py remains the only shipped record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from big_data_validator_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: time_queries.py name1 [name2 ...]", file=sys.stderr)
        sys.exit(2)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bdv-time-subset")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    spark.range(1000).select(F.sum("id")).collect()

    @pandas_udf("long")
    def _warm(v):
        return v

    spark.range(1000).repartition(int(CPUS)).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    registry = all_queries()
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for timed in [False] + [True] * passes:
        for name in names:
            fn = registry[name]
            spark.sparkContext.setJobDescription(f"time: {name}")
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            if timed:
                samples[name].append(time.perf_counter() - start)
    print(
        json.dumps(
            {
                "queries": {
                    n: round(statistics.median(v), 3)
                    for n, v in samples.items()
                },
                "queries_min": {
                    n: round(min(v), 3) for n, v in samples.items()
                },
                "sf_dir": SF_DIR,
                "passes": passes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
