"""Per-superstep checkpoint / resume / metrics (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference has no persistence at all — its 'state' is the `buff[2m]`
ping-pong buffer (pagerank.h:40-45) that dies with the process. Here every
superstep lands durably:

    <root>/<run_id>/ranks/superstep=<s>/   rank vector AFTER superstep s
    <root>/<run_id>/lineage/               (superstep, partition_id, rows,
                                            min_id, max_id) per partition
    <root>/<run_id>/metrics/               (superstep, l1_delta,
                                            edges_processed, wall_ms,
                                            dangling_mass, n_partitions)

Write ordering is the commit protocol: ranks first, lineage second, the
metrics row LAST — a superstep is complete iff its metrics row exists, so
a kill between writes can never yield a half-trusted superstep. ``resume``
finds the max complete superstep and restarts after it; the resumed run is
float64-bitwise identical to an uninterrupted one (parquet round-trips
float64 exactly).

Tables are Parquet behind a format knob: on a cluster with Iceberg jars the
same layout becomes Iceberg tables by swapping ``table_format`` — the
sandbox has no Iceberg runtime (SURVEY.md §7), so "iceberg" raises with
instructions rather than silently degrading.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        run_id: str,
        *,
        id_col: str = "entity",
        table_format: str = "parquet",
        lineage: bool = True,
    ) -> None:
        if table_format == "iceberg":
            raise NotImplementedError(
                "Iceberg runtime jars are not on this classpath; add "
                "iceberg-spark-runtime and set spark.sql.catalog.* configs, "
                "then this layout maps 1:1 onto Iceberg tables."
            )
        if table_format != "parquet":
            raise ValueError(f"unknown table_format {table_format!r}")
        self.spark = spark
        self.root = root.rstrip("/")
        self.run_id = run_id
        self.id_col = id_col
        self.lineage = lineage
        self.base = f"{self.root}/{run_id}"

    # -- paths --------------------------------------------------------------
    def _ranks_path(self, superstep: int) -> str:
        return f"{self.base}/ranks/superstep={superstep}"

    @property
    def _metrics_path(self) -> str:
        return f"{self.base}/metrics"

    @property
    def _lineage_path(self) -> str:
        return f"{self.base}/lineage"

    # -- write side ---------------------------------------------------------
    def save(self, superstep: int, ranks: DataFrame, metrics_row: dict[str, Any]) -> None:
        ranks.write.mode("overwrite").parquet(self._ranks_path(superstep))
        if self.lineage:
            lin = (
                ranks.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.count("*").alias("rows"),
                    F.min(self.id_col).cast("string").alias("min_id"),
                    F.max(self.id_col).cast("string").alias("max_id"),
                )
                .withColumn("superstep", F.lit(superstep))
            )
            lin.write.mode("append").parquet(self._lineage_path)
        row = dict(metrics_row)
        row.setdefault("superstep", superstep)
        row["run_id"] = self.run_id
        row["wall_clock"] = time.time()
        self.spark.createDataFrame([json.dumps(row)], "string").selectExpr(
            "from_json(value, 'superstep INT, l1_delta DOUBLE, edges_processed BIGINT, "
            "wall_ms DOUBLE, dangling_mass DOUBLE, dangling_mass_next DOUBLE, "
            "n_partitions INT, run_id STRING, wall_clock DOUBLE') AS r"
        ).select("r.*").write.mode("append").parquet(self._metrics_path)

    # -- read side ----------------------------------------------------------
    def last_complete_superstep(self) -> int | None:
        try:
            m = self.spark.read.parquet(self._metrics_path)
        except Exception:  # path absent → fresh run  # noqa: BLE001
            return None
        row = m.agg(F.max("superstep")).collect()[0]
        return None if row[0] is None else int(row[0])

    def last_metrics(self) -> dict[str, Any] | None:
        """Metrics row of the max complete superstep (for bitwise-exact
        restoration of loop-carried scalars like the dangling mass)."""
        last = self.last_complete_superstep()
        if last is None:
            return None
        rows = self.metrics().filter(F.col("superstep") == last).collect()
        return rows[0].asDict() if rows else None

    def resume(self) -> tuple[int, DataFrame] | None:
        """→ (next_superstep, ranks_after_last_complete) or None (fresh)."""
        last = self.last_complete_superstep()
        if last is None:
            return None
        ranks = self.spark.read.parquet(self._ranks_path(last))
        return last + 1, ranks

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self._metrics_path)

    def lineage_table(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_path)
