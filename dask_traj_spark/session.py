"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (every pandas-UDF boundary is Arrow-batched),
shuffle partitions sized to cores instead of the 200 default, and a
UTC session timezone so results compare bit-for-bit against the
DuckDB oracle.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _xms_opt(driver_mem: str) -> str:
    """-Xms at half of the driver heap (see the builder comment).
    Only simple 'Ng'/'Nm' strings are parsed; anything else skips
    the option rather than risking -Xms > -Xmx."""
    m = re.fullmatch(r"(\d+)([gm])", driver_mem.strip().lower())
    if not m:
        return ""
    half = max(int(m.group(1)) // 2, 1)
    return f"-Xms{half}{m.group(2)}"


def get_spark(
    app_name: str = "dask-traj-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) overrides local
    parallelism; on a real cluster ``master`` comes from
    spark-submit and these configs still apply.
    """
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else DEFAULT_SHUFFLE_PARTITIONS

    # Python workers (UDFs, Python DataSources) unpickle classes from
    # this package in separate processes; make sure they can import it
    # even when the driver script added the repo to sys.path manually.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )

    builder = (

        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # At 100 TB these two govern scan-task granularity; 128 MiB
        # parquet splits keep ~800k tasks for the full dataset which
        # a 1000-executor cluster absorbs comfortably.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        # no \r progress spam on stdout — a tool capturing the tail
        # of the output (the driver's bench parser) must see clean
        # line-oriented text
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_mem)
        # pre-size the heap to half of -Xmx: measured on the round-4
        # host, lazy heap expansion made the first ~4 large Arrow
        # passes 2-3x slower than steady state (each iteration grew
        # the heap a bit more); with -Xms the session reaches steady-
        # state throughput from the second iteration
        .config("spark.driver.extraJavaOptions", _xms_opt(driver_mem))
        # ContextCleaner reclaims shuffle files / broadcasts only when
        # the JVM GCs their references; a big heap under no allocation
        # pressure can go 30+ min (the default interval) without one,
        # and the retained state throttles later Arrow-heavy stages.
        # Measured (round 8, idle local[32]): a 10x canonical pass
        # right after a shuffle-heavy MinHash suite ran 73/42/34 s vs
        # 25/18 s immediately after a forced GC.  5 min matches the
        # long-running-cluster guidance for shuffle-heavy apps.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_local_checkpoint(df) -> bool:
    """Best-effort unpersist of a ``localCheckpoint``'ed DataFrame's
    backing blocks.  For SUPERSEDED loop state only: iterative
    operators (PageRank, connected components, BPE merges) checkpoint
    every round, and each checkpoint pins its blocks in the block
    manager until the JVM happens to GC the RDD reference — in a
    long-lived session the stale rounds accumulate into thousands of
    pinned blocks and measurable GC/bookkeeping drag (the same leak
    class ``release_caches`` covers for tracked persists).  The
    released DataFrame is IRRECOVERABLE afterwards (localCheckpoint
    truncates lineage), so callers may only release state that
    nothing downstream references — i.e. the previous round after the
    next round's checkpoint has materialized.

    Returns True when blocks were released, False when the plan was
    not a materialized local checkpoint (wrong node type, or any
    py4j failure — never raises: releasing is an optimization, and a
    Spark version that renames the internals must degrade to the old
    keep-until-GC behavior, not break the operator)."""
    try:
        plan = df._jdf.queryExecution().logical()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False


# Operators that persist a shared intermediate referenced by the
# returned (lazy) plan register it here; a long-lived session running
# many such operators releases them all with ``release_caches()`` once
# the results are materialized.  Central registry — the dedup module's
# original tracker now delegates here so curation/dedup caches share
# one release point.
_TRACKED_CACHES: list = []


def track_cache(df):
    """Persist ``df`` (MEMORY_AND_DISK) and register it for
    ``release_caches``.  Returns the persisted DataFrame."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released.  Call after the operators' returned DataFrames are
    materialized (collected / written).  Re-using a result DataFrame
    afterwards generally stays CORRECT (Spark recomputes the
    lineage) — the one exception is sequence packing, whose collected
    partition offsets are baked into the plan as literals: its result
    must be fully materialized before release and not re-collected
    after (a recomputed range partitioning could re-sample
    boundaries)."""
    n = len(_TRACKED_CACHES)
    for df in _TRACKED_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _TRACKED_CACHES.clear()
    return n
