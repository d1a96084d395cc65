"""Rollup storage: incremental MERGE of tier partials + checkpoint manifest.

On a real cluster this layer targets Iceberg (`MERGE INTO` keyed on
(series, metric, bucket_start), partition spec (days(bucket_start),
bucket(N, conv_id)), snapshot expiry for TTL). This sandbox has no Iceberg
runtime jar, so the same contract is implemented as parquet
partition-overwrite emulation: tier tables live under
``<base>/tier=<t>/day=<yyyy-mm-dd>/`` and a MERGE rewrites exactly the
affected day partitions (idempotent upsert — re-running the same input
window is a no-op).

The checkpoint manifest (JSON) carries the high-watermark `ts`, run lineage
and per-partition row/byte metrics, making every job resumable
(north_rule). `use_iceberg()` flips to real MERGE INTO when the catalog is
configured.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsprofiler_spark.operators.ingest import SERIES_COLS

TIER_KEY = SERIES_COLS + ["metric", "bucket_start"]
PARTIALS = ["n", "s1", "s2", "vmin", "vmax"]


def use_iceberg(spark: SparkSession) -> bool:
    return bool(spark.conf.get("spark.sql.catalog.local", None))


@dataclass
class Manifest:
    path: str
    watermark: str | None = None  # max ingested ts (ISO)
    runs: list = field(default_factory=list)

    @staticmethod
    def load(path: str) -> "Manifest":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            return Manifest(path=path, watermark=d.get("watermark"), runs=d.get("runs", []))
        return Manifest(path=path)

    def record_run(self, run_id: str, watermark: str, partitions: list[dict]) -> None:
        self.watermark = watermark
        self.runs.append(
            {
                "run_id": run_id,
                "watermark": watermark,
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "partitions": partitions,
            }
        )
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"watermark": self.watermark, "runs": self.runs}, f, indent=1)
        os.replace(tmp, self.path)  # atomic commit of the checkpoint


class RollupStore:
    """Tier tables with MERGE-by-partition semantics and lineage metrics."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = base_path
        self.manifest = Manifest.load(os.path.join(base_path, "manifest.json"))

    def _tier_path(self, tier: str) -> str:
        return os.path.join(self.base, f"tier={tier}")

    def read_tier(self, tier: str) -> DataFrame | None:
        p = self._tier_path(tier)
        if not os.path.isdir(p):
            return None
        return self.spark.read.option("basePath", p).parquet(p)

    def merge_tier(
        self,
        new_partials: DataFrame,
        tier: str,
        affected: list[str] | None = None,
    ) -> list[dict]:
        """Upsert tier partials by re-aggregating with stored partials on the
        affected day partitions only (continuous aggregate).

        Associative combine: n/s1/s2 sum, vmin min, vmax max — so
        late/duplicate windows fold exactly, and re-running the same input
        yields byte-identical partitions (idempotent).

        ``affected`` (the touched yyyy-MM-dd day partitions) can be passed in
        when the caller already knows it — the set is identical for every
        tier of one batch (day truncation of the same bucket range), so the
        incremental job computes it once instead of one collect per tier.
        """
        new_partials = new_partials.withColumn(
            "day", F.date_format(F.date_trunc("day", "bucket_start"), "yyyy-MM-dd")
        )
        if affected is None:
            affected = [r.day for r in new_partials.select("day").distinct().collect()]
        existing = self.read_tier(tier)
        combined = new_partials.select(*TIER_KEY, *PARTIALS, "day")
        if existing is not None:
            old = existing.where(F.col("day").isin(affected)).select(
                *TIER_KEY, *PARTIALS, "day"
            )
            merged = combined.unionByName(old).groupBy(*TIER_KEY, "day").agg(
                F.sum("n").alias("n"),
                F.sum("s1").alias("s1"),
                F.sum("s2").alias("s2"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        else:
            # bootstrap load: partials come out of a groupBy on exactly
            # (TIER_KEY, bucket day) — already one row per key, so the merge
            # re-aggregation would be an identity shuffle of the full tier;
            # skip it.
            merged = combined
        # overwrite ONLY the affected day partitions in ONE write job
        # (Iceberg: MERGE INTO / dynamic partition overwrite)
        staged = merged.persist()
        per_day = {
            r.day: r.rows
            for r in staged.groupBy("day").agg(F.count(F.lit(1)).alias("rows")).collect()
        }
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Repartition by (day, conv_id-hash) — NOT by day alone: one shuffle
        # partition per day would serialize the write to #days tasks and leave
        # one giant file per day partition, strangling downstream scan
        # parallelism. Multiple files per day-dir is fine for dynamic
        # partition overwrite (and for Iceberg MERGE on a real cluster).
        n_out = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        staged.repartition(n_out, "day", "conv_id").write.partitionBy(
            "day"
        ).mode("overwrite").parquet(self._tier_path(tier))
        staged.unpersist()
        lineage = []
        for day in affected:
            part_path = os.path.join(self._tier_path(tier), f"day={day}")
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(part_path)
                for f in fs
            )
            lineage.append(
                {"tier": tier, "day": day, "rows": per_day.get(day, 0), "bytes": size}
            )
        return lineage

    def expire(self, tier: str, ttl_days: int) -> list[str]:
        """TTL expiry: drop whole day partitions older than watermark - ttl
        (Iceberg: DELETE WHERE + expire_snapshots)."""
        if self.manifest.watermark is None:
            return []
        import datetime as dt

        wm = dt.datetime.fromisoformat(self.manifest.watermark)
        cutoff = (wm - dt.timedelta(days=ttl_days)).strftime("%Y-%m-%d")
        dropped = []
        tier_path = self._tier_path(tier)
        if not os.path.isdir(tier_path):
            return dropped
        for entry in sorted(os.listdir(tier_path)):
            if entry.startswith("day=") and entry[4:] < cutoff:
                shutil.rmtree(os.path.join(tier_path, entry))
                dropped.append(entry[4:])
        return dropped
