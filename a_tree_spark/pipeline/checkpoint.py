"""Per-stage checkpointing with per-partition lineage + exact resume.

north_rule requirement: "every stage checkpoints per-partition lineage +
row counts to enable exact resume at 1e12-document scale". Design:

- work is keyed by an explicit UNIT id column (at 100 TB: an input file,
  a partition range, a WARC segment). Units are the resume granularity —
  idempotent and order-free, unlike task ids;
- a completed unit's output lives under <root>/<stage>/data as parquet
  rows tagged with the unit id; the manifest (one parquet per batch of
  completed units) records (unit_id, row_count, content_hash) where
  content_hash is an order-insensitive xor-style aggregate of row
  hashes — cheap to recompute for audits;
- resume = anti-join pending units against the manifest, process only
  the remainder, append. A unit is never half-visible: data is written
  before its manifest row, and readers go through the manifest join.

The driver-side API is deliberately tiny: ``run_stage`` is the whole
lifecycle (plan -> skip done -> compute -> append -> manifest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class StageCheckpoint:
    def __init__(self, spark: SparkSession, root: str, stage: str):
        self.spark = spark
        self.stage = stage
        self.data_path = os.path.join(root, stage, "data")
        self.manifest_path = os.path.join(root, stage, "manifest")

    # ------------------------------------------------------------ state

    def completed_units(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.manifest_path).select("unit_id")
        except Exception:
            return self.spark.createDataFrame([], "unit_id bigint")

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.manifest_path)

    def output(self) -> DataFrame:
        """Only rows whose unit completed (manifest is the commit log)."""
        data = self.spark.read.parquet(self.data_path)
        return data.join(
            F.broadcast(self.completed_units()), "unit_id", "semi"
        )

    # ------------------------------------------------------------- run

    def run_stage(self, units: DataFrame, compute, unit_col: str = "unit_id") -> DataFrame:
        """units: DataFrame with unit_col listing ALL work units.
        compute: fn(pending_units_df) -> result DataFrame that carries
        unit_col on every row. Returns the stage's full output."""
        pending = units.join(
            F.broadcast(self.completed_units().withColumnRenamed("unit_id", unit_col)),
            unit_col,
            "left_anti",
        )
        n_pending = pending.count()
        if n_pending:
            result = compute(pending)
            if unit_col != "unit_id":
                result = result.withColumnRenamed(unit_col, "unit_id")
            result.write.mode("append").parquet(self.data_path)

            written = self.spark.read.parquet(self.data_path).join(
                F.broadcast(
                    pending.select(F.col(unit_col).alias("unit_id")).distinct()
                ),
                "unit_id",
                "semi",
            )
            lineage = written.groupBy("unit_id").agg(
                F.count("*").alias("row_count"),
                # order-insensitive, overflow-free content hash
                # canonical column order: joins reorder columns, and xxhash64 over
                # a struct is order-sensitive
                F.bit_xor(F.xxhash64(F.struct(*sorted(written.columns)))).alias("content_hash"),
            ).withColumn("stage", F.lit(self.stage))
            lineage.write.mode("append").parquet(self.manifest_path)
        return self.output()

    # ----------------------------------------------------------- audit

    def verify(self) -> DataFrame:
        """Recompute per-unit row counts against the manifest — the
        audit half of the lineage contract. Returns mismatching units
        (empty = consistent)."""
        data = self.spark.read.parquet(self.data_path)
        actual = data.groupBy("unit_id").agg(
            F.count("*").alias("actual_rows"),
            F.bit_xor(F.xxhash64(F.struct(*sorted(data.columns)))).alias("actual_hash"),
        )
        recorded = self.manifest().select("unit_id", "row_count", "content_hash")
        return (
            recorded.join(actual, "unit_id", "left")
            .where(
                (F.col("actual_rows") != F.col("row_count"))
                | (F.col("actual_hash") != F.col("content_hash"))
                | F.col("actual_rows").isNull()
            )
        )
