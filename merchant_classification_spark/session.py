"""SparkSession factory with scale-appropriate defaults.

The reference delegates all physical planning to the Databricks runtime
(SURVEY.md §4.1); our engine makes the good defaults explicit so the same
code runs on `local[N]` for tests and on a 1000-executor cluster unchanged:

  * AQE (adaptive query execution) — runtime shuffle-partition coalescing,
    skew-join splitting, and dynamic broadcast-join demotion/promotion.
    This is the primary 100 TB survival mechanism: static
    `spark.sql.shuffle.partitions` can never be right for every stage.
  * Arrow for all pandas interchange (pandas UDFs, toPandas).
  * UTC session timezone — deterministic timestamp semantics everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "merchant_classification_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real cluster the caller
    passes nothing and spark-submit's master wins.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # test corpus writes TIMESTAMP(NANOS) parquet, which Spark refuses
        # by default; read as long and convert in the source shim
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # long-lived sessions compile one codegen class per stage; the JVM
        # default 240m code cache can fill after a few hundred distinct
        # plans, silently disabling the JIT (3-10x slowdown on expression-
        # heavy plans). Sized for service-style sessions running thousands
        # of distinct queries.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        # the generated-class cache defaults to 100 entries — a workload of
        # tens of distinct multi-stage plans (each query compiles dozens of
        # projection/predicate/wholestage units) thrashes that LRU and
        # re-runs Janino per EXECUTION: measured 3-10x inflation on
        # expression-heavy operators (higher-order-function dedup/ANN
        # tiers), erratically spread across whichever queries ran after the
        # evictions. One compiled class is small; 10k entries ≈ a few
        # hundred MB of metaspace, the right trade for a query service.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        # proactive driver GC so the context cleaner releases out-of-scope
        # checkpoint/broadcast/shuffle blocks promptly — with a large heap,
        # organic GCs can be tens of minutes apart and block cleanup stalls
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
