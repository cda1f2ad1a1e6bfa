"""Ad-hoc profile: time t9/t23 at a given SF dir (default sf0.1).

Usage: python scripts/profile_t23.py [sf_dir] [iters]
"""
import sys
import time

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .appName("profile_t23")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from dask_traj_spark.queries import queries  # noqa: E402

qs = queries()
for name in ("t9_char_bigram_logprob", "t23_perplexity_buckets"):
    fn = qs[name]
    times = []
    for i in range(iters):
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        times.append(round(time.monotonic() - t0, 3))
    print(name, "rows:", n, "times:", times)

spark.stop()
