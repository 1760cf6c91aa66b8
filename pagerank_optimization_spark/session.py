"""SparkSession factory.

The reference's "session" is `mpiexec -n 4` + OpenMP thread count
(run_test_rig.sh:82, tuned_variant_openmp.c:102). Here parallelism is
executor threads (`local[N]` in the sandbox); the same builder serves a real
cluster via spark-submit where master/memory come from the environment.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def iterative_conf(spark: SparkSession, shuffle_partitions: int | None = None):
    """Conf scope for fixed-shape iterative loops (PageRank/CC/LPA
    supersteps): AQE's per-stage adaptive re-planning is pure scheduling
    overhead when every superstep has the same plan over the same sizes —
    measured 2.2× per-superstep latency at local scale. Restored on exit;
    one-shot analytical queries keep AQE (skew-join, coalescing).

    ``shuffle_partitions``: align the loop's groupBy/join shuffle width
    with the operator's (scale-adaptive) partition count — with AQE off
    inside the loop nothing else coalesces the session-wide default, so a
    tiny graph's every aggregation would still fan out
    ``spark.sql.shuffle.partitions`` tasks AND mis-align with the
    canonical state layout (an extra exchange per superstep). Restored on
    exit."""
    key = "spark.sql.adaptive.enabled"
    skey = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, "true")
    sprev = spark.conf.get(skey)
    spark.conf.set(key, "false")
    if shuffle_partitions is not None:
        spark.conf.set(skey, str(int(shuffle_partitions)))
    try:
        yield
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(skey, sprev)


def get_spark(
    app_name: str = "pagerank-optimization-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - Arrow enabled: every pandas UDF exchange is columnar (the Spark analog
      of the reference's AVX2 vectorization, tuned_variant_simd.c:282-310).
    - AQE enabled: runtime coalescing + skew-join splitting (the reference
      ignores skew entirely; Kronecker graphs are power-law).
    - UTC timezone pinned for DuckDB-oracle parity.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores

    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cores}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
