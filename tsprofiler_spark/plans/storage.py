"""Rollup storage: snapshot-committed MERGE of tier partials + manifest.

On a real cluster this layer targets Iceberg (`MERGE INTO` keyed on
(series, metric, bucket_start), partition spec (days(bucket_start),
bucket(N, conv_id)), snapshot expiry for TTL). This sandbox has no Iceberg
runtime jar, so the same *commit semantics* are implemented directly:

* tier data lives in per-day **versioned** directories
  ``<base>/tier=<t>/day=<yyyy-mm-dd>/v=<run_id>/``;
* a MERGE **stages** new day versions (write-then-swap: one Spark write job
  into a staging dir, then a rename per affected day);
* the checkpoint manifest (JSON, atomic ``os.replace``) holds the committed
  ``{tier: {day: version}}`` pointers, the high-watermark `ts`, and run
  lineage — readers only ever see committed versions.

This is what makes ingestion **exactly-once under at-least-once replay**
(Structured Streaming's foreachBatch, or a re-run batch job): a crash
anywhere before the single manifest commit leaves the committed pointers
untouched, so the replay recomputes the same day versions from the same
committed base snapshot and idempotently overwrites the staged dirs. There
is no window in which a partially-merged tier is visible, and no additive
double-count — the same mechanism (and the same reason) as an Iceberg
snapshot commit.
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


LINEAGE_KEEP = 256  # full per-day lineage kept for the most recent N runs


@dataclass
class Manifest:
    path: str
    watermark: str | None = None  # max ingested ts (ISO)
    runs: list = field(default_factory=list)
    # committed snapshot pointers: tier -> {day -> version (run_id)}
    tiers: dict = field(default_factory=dict)
    # run_ids of runs whose full lineage has been compacted away; together
    # with runs' ids this is the complete replay-dedup set. A long-lived
    # minute-cadence stream commits ~500k runs/year — at a few tens of bytes
    # per compacted id the manifest stays small, whereas unbounded full
    # lineage (per-day partition records) grew it without limit.
    compacted_run_ids: list = field(default_factory=list)
    # tier -> sorted list of days whose committed content is INCOMPLETE
    # (a TTL-resurrected day holds only late rows, not the expired
    # history). Durable because the incompleteness outlives the batch that
    # created it: a SECOND late batch for the same day must keep additive
    # merge semantics toward the coarser tiers — re-deriving "resurrected"
    # from pointer presence alone would see the day committed and take the
    # replace path, rebuilding the 1h/1d day from late rows only and
    # silently destroying the surviving long-TTL rollup. The flag clears
    # when the day TTL-expires out of the tier again (drop_days).
    partial: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self._run_ids = set(self.compacted_run_ids)
        self._run_ids.update(r.get("run_id") for r in self.runs)

    @staticmethod
    def load(path: str) -> "Manifest":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            return Manifest(
                path=path,
                watermark=d.get("watermark"),
                runs=d.get("runs", []),
                tiers=d.get("tiers", {}),
                compacted_run_ids=d.get("compacted_run_ids", []),
                partial=d.get("partial", {}),
            )
        return Manifest(path=path)

    def has_run(self, run_id: str) -> bool:
        return run_id in self._run_ids

    def partial_days(self, tier: str) -> set[str]:
        """Days committed in ``tier`` with INCOMPLETE content (see `partial`)."""
        return set(self.partial.get(tier, []))

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {
                    "watermark": self.watermark,
                    "runs": self.runs,
                    "tiers": self.tiers,
                    "compacted_run_ids": self.compacted_run_ids,
                    "partial": self.partial,
                },
                f,
                indent=1,
            )
        os.replace(tmp, self.path)  # THE atomic commit point

    def record_run(
        self,
        run_id: str,
        watermark: str,
        partitions: list[dict],
        pointers: dict[str, dict[str, str]] | None = None,
        partial_days: dict[str, list[str]] | None = None,
    ) -> None:
        """Single atomic commit: watermark + lineage + tier snapshot pointers
        (+ newly-partial day flags, committed in the SAME atomic save so a
        crash can never publish a resurrected day without its flag)."""
        self.watermark = watermark
        self.runs.append(
            {
                "run_id": run_id,
                "watermark": watermark,
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "partitions": partitions,
            }
        )
        self._run_ids.add(run_id)
        while len(self.runs) > LINEAGE_KEEP:
            self.compacted_run_ids.append(self.runs.pop(0)["run_id"])
        for tier, days in (pointers or {}).items():
            self.tiers.setdefault(tier, {}).update(days)
        for tier, days in (partial_days or {}).items():
            if days:
                self.partial[tier] = sorted(set(self.partial.get(tier, [])) | set(days))
        self._save()

    def drop_days(self, tier: str, days: list[str]) -> None:
        """Commit a TTL expiry (pointer removal) before any dir deletion.
        A dropped day's `partial` flag clears with it: once the incomplete
        version is gone, the next late row re-resurrects from scratch."""
        t = self.tiers.get(tier, {})
        for d in days:
            t.pop(d, None)
        if tier in self.partial:
            keep = [d for d in self.partial[tier] if d not in set(days)]
            if keep:
                self.partial[tier] = keep
            else:
                del self.partial[tier]
        self._save()


class RollupStore:
    """Tier tables with snapshot-commit MERGE semantics and lineage metrics."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = base_path
        self.manifest = Manifest.load(os.path.join(base_path, "manifest.json"))

    def _tier_path(self, tier: str) -> str:
        return os.path.join(self.base, f"tier={tier}")

    def _day_dir(self, tier: str, day: str, version: str) -> str:
        return os.path.join(self._tier_path(tier), f"day={day}", f"v={version}")

    def read_versions(self, tier: str, pointers: dict[str, str]) -> DataFrame:
        """Read a specific {day: version} set of a tier (committed or staged)."""
        paths = [self._day_dir(tier, day, ver) for day, ver in sorted(pointers.items())]
        df = self.spark.read.option("basePath", self._tier_path(tier)).parquet(*paths)
        # partition inference types day= as DATE; keep the string contract
        return df.drop("v").withColumn(
            "day", F.date_format(F.col("day"), "yyyy-MM-dd")
        )

    def read_tier(
        self,
        tier: str,
        start_day: str | None = None,
        end_day: str | None = None,
    ) -> DataFrame | None:
        """Committed snapshot of a tier (only manifest-pointed versions).

        ``start_day``/``end_day`` (inclusive ``yyyy-MM-dd`` bounds) prune at
        the PATH level: days outside the range are never listed, let alone
        scanned — the manifest is the partition index, so a time-range query
        over years of tiers opens only the requested days' files (the
        Iceberg-manifest analogue of partition pruning)."""
        pointers = self.manifest.tiers.get(tier)
        if pointers and (start_day or end_day):
            pointers = {
                d: v
                for d, v in pointers.items()
                if (start_day is None or d >= start_day)
                and (end_day is None or d <= end_day)
            }
        if not pointers:
            return None
        return self.read_versions(tier, pointers)

    def _merged_tier_plan(
        self,
        new_partials: DataFrame,
        tier: str,
        affected: list[str],
        replace: bool = False,
        merge_days: list[str] | None = None,
    ) -> DataFrame:
        """MERGE plan for one tier against its committed snapshot.

        Associative combine: n/s1/s2 sum, vmin min, vmax max — so
        late/duplicate windows fold exactly, and re-staging the same input
        (replay with the same run_id) overwrites the same version dirs
        byte-identically.

        ``replace``: the partials are already the COMPLETE content of every
        affected day (e.g. cascaded from a tier whose affected-day versions
        were just merged) — skip the existing-union entirely; the staged
        day version simply supersedes the old one.

        ``merge_days``: exception list for ``replace=True`` — days whose
        partials are NOT complete (the finer tier had no committed version
        to fold the day's history from, e.g. a late row for a day already
        TTL-expired out of 1m while 1h/1d still retain it). Those days keep
        the existing-union semantics so the longer-TTL rollup is preserved
        instead of silently replaced by the late rows alone.
        """
        new_partials = new_partials.withColumn(
            "day", F.date_format(F.date_trunc("day", "bucket_start"), "yyyy-MM-dd")
        )
        union_days = list(merge_days or []) if replace else list(affected)
        # Read ONLY the union days' committed versions — the manifest is the
        # partition index, so this opens a handful of day dirs instead of
        # scanning the whole tier (a full-history read of the 10y 1d tier to
        # recover one resurrected day was the measured worst case).
        committed = self.manifest.tiers.get(tier) or {}
        pointers = {d: v for d, v in committed.items() if d in set(union_days)}
        if not pointers:
            # bootstrap load (or pure replace): partials come out of a
            # groupBy on exactly (TIER_KEY, bucket day) — already one row
            # per key, so the merge re-aggregation would be an identity
            # shuffle of the full tier; skip it.
            return new_partials.select(*TIER_KEY, *PARTIALS, "day")
        combined = new_partials.select(*TIER_KEY, *PARTIALS, "day")
        old = self.read_versions(tier, pointers).select(
            *TIER_KEY, *PARTIALS, "day"
        )
        return combined.unionByName(old).groupBy(*TIER_KEY, "day").agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )

    def merge_tiers(
        self,
        partials_by_tier: dict[str, DataFrame],
        run_id: str,
        affected: list[str] | None = None,
        replace: bool = False,
        distribute: bool = True,
        merge_days: list[str] | None = None,
    ) -> tuple[list[dict], dict[str, dict[str, str]]]:
        """Stage the MERGE of EVERY tier's partials as new day versions in
        ONE write job (NOT yet visible — the caller publishes atomically via
        `commit_run`).

        All tiers union into a single (tier, day)-partitioned write instead
        of one write job per tier: at cluster scale this is one shuffle +
        one commit pipeline instead of three job barriers, and in the
        scaling harness it removes two rounds of driver round-trips per
        batch. Write-then-swap: the job lands in a staging dir, then one
        rename per (tier, day) into the versioned location (the sandbox
        analogue of an Iceberg multi-table snapshot commit).

        ``affected`` (the touched yyyy-MM-dd day partitions) can be passed
        in when the caller already knows it — the set is identical for
        every tier of one batch (day truncation of the same bucket range).

        Returns (lineage, pointers) with pointers = {tier: {day: run_id}}.
        """
        if affected is None:
            days = None
            for df in partials_by_tier.values():
                d = df.select(
                    F.date_format(F.date_trunc("day", "bucket_start"), "yyyy-MM-dd").alias("day")
                ).distinct()
                days = d if days is None else days.union(d)
            affected = [r.day for r in days.distinct().collect()]
        plans = [
            self._merged_tier_plan(
                df, tier, affected, replace=replace, merge_days=merge_days
            ).withColumn("tier", F.lit(tier))
            for tier, df in partials_by_tier.items()
        ]
        merged = plans[0]
        for p in plans[1:]:
            merged = merged.unionByName(p)
        # ONE write job, NO executor-memory cache of the merged data: the
        # staged parquet itself is the materialization (columnar, compressed
        # — a fraction of a deserialized JVM cache, and what an Iceberg
        # MERGE produces anyway). Row counts for lineage/validation come
        # from a cheap metadata-ish count over the staged files afterwards.
        #
        # ``distribute=True``: repartition by (tier, day, conv_id-hash) — NOT
        # by partition dirs alone: one shuffle partition per (tier, day)
        # would serialize the write to #dirs tasks and leave one giant file
        # per partition, strangling downstream scan parallelism. Multiple
        # files per dir is fine (and matches how an Iceberg MERGE
        # distributes its writes).
        #
        # ``distribute=False``: the caller guarantees the partials are
        # already hash-distributed across ~shuffle.partitions tasks (e.g.
        # retention pre-partitions the raw series by the series key, which
        # the 1m groupBy then reuses) — writing directly saves a FULL
        # second shuffle of the merged tier, the single largest exchange in
        # the job at finest-tier scale. Each task then writes one file per
        # (tier, day) dir it holds rows for; with the series-key layout a
        # conversation's rows stay colocated in one file, which is exactly
        # what lets the 1h/1d cascade's map-side combine collapse 60:1.
        # Sort within partitions by the full segment key + time. The dynamic
        # partitionBy write needs a local sort on (tier, day) anyway (one
        # open writer per dir); widening it to the series key and
        # bucket_start costs the same single SortExec but makes every staged
        # file SEGMENT-CONTIGUOUS and time-ordered — parquet delta/dict
        # encoding compresses better, range scans read ordered data, and the
        # codec can stream segments straight off the scan with no shuffle
        # (operators/compress.py compress_points_colocated).
        staging = os.path.join(self.base, f"_staging-{run_id}")
        if distribute:
            n_out = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            merged = merged.repartition(n_out, "tier", "day", "conv_id")
        merged = merged.sortWithinPartitions(
            "tier", "day", *SERIES_COLS, "metric", "bucket_start"
        )
        # The planned-write optimizer (Spark 3.4+, on by default) requires
        # ordering on `empty2null(<string partition col>)`, which never
        # semantically matches a user sort on the raw column — so it layers
        # its own UNSTABLE sort on (tier, day) over ours and scrambles the
        # segment order inside every file. The legacy write path compares
        # orderings on the attributes themselves, sees ours as a superset,
        # and adds nothing. Scoped set/restore: writes are synchronous and
        # this store is single-writer by contract (manifest commit).
        planned = "spark.sql.optimizer.plannedWrite.enabled"
        prev = self.spark.conf.get(planned, None)
        self.spark.conf.set(planned, "false")
        try:
            merged.write.partitionBy("tier", "day").mode("overwrite").parquet(staging)
        finally:
            if prev is None:
                self.spark.conf.unset(planned)
            else:
                self.spark.conf.set(planned, prev)
        back = self.spark.read.parquet(staging)
        per_key = {
            (r.tier, r.day): r.rows
            for r in back.groupBy(
                "tier", F.date_format("day", "yyyy-MM-dd").alias("day")
            )
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        }
        # a staged day outside `affected` means its existing rows were never
        # unioned in — committing would silently drop them. The invariant
        # (ts-derived touched_days covers every tier-bucket day) is cheap to
        # enforce here because per_key is collected anyway.
        missing = sorted({d for (_, d) in per_key} - set(affected))
        if missing:
            shutil.rmtree(staging, ignore_errors=True)
            raise ValueError(
                f"merge_tiers: staged days {missing} not covered by "
                f"affected={sorted(affected)} — existing data would be lost"
            )
        pointers: dict[str, dict[str, str]] = {}
        lineage = []
        for tier, day in sorted(per_key):
            src = os.path.join(staging, f"tier={tier}", f"day={day}")
            dst = self._day_dir(tier, day, run_id)
            if os.path.isdir(dst):
                shutil.rmtree(dst)  # replayed run_id: idempotent overwrite
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
            pointers.setdefault(tier, {})[day] = run_id
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(dst)
                for f in fs
            )
            lineage.append(
                {"tier": tier, "day": day, "rows": per_key[(tier, day)], "bytes": size}
            )
        shutil.rmtree(staging, ignore_errors=True)
        return lineage, pointers

    def merge_tier(
        self,
        new_partials: DataFrame,
        tier: str,
        run_id: str,
        affected: list[str] | None = None,
    ) -> tuple[list[dict], dict[str, str]]:
        """Single-tier convenience wrapper over `merge_tiers`."""
        lineage, pointers = self.merge_tiers({tier: new_partials}, run_id, affected)
        return lineage, pointers.get(tier, {})

    def commit_run(
        self,
        run_id: str,
        watermark: str,
        lineage: list[dict],
        pointers: dict[str, dict[str, str]],
        partial_days: dict[str, list[str]] | None = None,
    ) -> None:
        """Atomically publish every staged tier version + watermark, then GC
        superseded version dirs (safe post-commit: readers only follow the
        manifest)."""
        old = {
            tier: dict(self.manifest.tiers.get(tier, {})) for tier in pointers
        }
        self.manifest.record_run(
            run_id, watermark, lineage, pointers, partial_days=partial_days
        )
        for tier, days in pointers.items():
            for day, ver in days.items():
                prev = old.get(tier, {}).get(day)
                if prev is not None and prev != ver:
                    shutil.rmtree(
                        self._day_dir(tier, day, prev), ignore_errors=True
                    )

    def expire(self, tier: str, ttl_days: int) -> list[str]:
        """TTL expiry: drop whole day partitions older than watermark - ttl
        (Iceberg: DELETE WHERE + expire_snapshots). Pointer removal commits
        first; dir deletion is post-commit cleanup."""
        if self.manifest.watermark is None:
            return []
        import datetime as dt

        wm = dt.datetime.fromisoformat(self.manifest.watermark)
        cutoff = (wm - dt.timedelta(days=ttl_days)).strftime("%Y-%m-%d")
        dropped = sorted(
            d for d in self.manifest.tiers.get(tier, {}) if d < cutoff
        )
        if not dropped:
            return dropped
        self.manifest.drop_days(tier, dropped)
        for day in dropped:
            shutil.rmtree(
                os.path.join(self._tier_path(tier), f"day={day}"), ignore_errors=True
            )
        return dropped

    def _day_files(self, tier: str, day: str, version: str) -> list[str]:
        d = self._day_dir(tier, day, version)
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        ]

    def compact_tier(
        self,
        tier: str,
        run_id: str,
        target_bytes: int = 128 << 20,
        slack: float = 1.5,
    ) -> list[dict]:
        """Small-file compaction of committed day partitions (the Iceberg
        ``rewrite_data_files`` maintenance action).

        Every incremental MERGE writes ~shuffle.partitions files per
        affected (tier, day) — right for write parallelism, but a
        low-volume day then carries hundreds of KB-sized files whose
        open/footer cost dominates reads at 100 TB. For each committed day
        whose file count exceeds ``slack ×`` the ideal
        ``ceil(bytes / target_bytes)``, this rewrites that day into the
        ideal file count and swaps the manifest pointer atomically —
        readers never see a half-compacted day, and a crashed compaction
        leaves only an invisible staged version (same write-then-swap
        contract as MERGE; an already-committed ``run_id`` is a no-op, so
        replays are safe). Data is byte-identical by construction: the
        rewrite is a repartition of the same rows, no re-aggregation.

        One Spark job per compacted day, driver-looped: compaction is a
        background maintenance pass over the few days the size heuristic
        selects, not a data-path stage (on a real cluster the same policy
        runs as Iceberg's rewrite_data_files with commit conflicts handled
        by the table format). Returns lineage rows for the compacted days.
        """
        if self.manifest.has_run(run_id):
            return []
        pointers = self.manifest.tiers.get(tier, {})
        plan: list[tuple[str, str, int]] = []  # (day, old_version, n_target)
        for day, ver in sorted(pointers.items()):
            files = self._day_files(tier, day, ver)
            size = sum(os.path.getsize(f) for f in files)
            want = max(1, -(-size // target_bytes))
            if len(files) > slack * want:
                plan.append((day, ver, int(want)))
        if not plan:
            return []
        lineage = []
        new_pointers: dict[str, str] = {}
        staging = os.path.join(self.base, f"_staging-{run_id}")
        for day, ver, want in plan:
            df = self.read_versions(tier, {day: ver}).drop("day")
            stage_day = os.path.join(staging, f"day={day}")
            # hash by series key + re-sort: merge_tiers writes every day
            # SEGMENT-CONTIGUOUS and time-ordered (see the staged-write
            # comment above), and compress_points_colocated's zero-shuffle
            # path depends on that layout — a bare round-robin repartition
            # here would interleave segments and silently de-optimize every
            # post-compaction codec run (and worsen parquet delta encoding)
            (
                df.repartition(want, *SERIES_COLS)
                .sortWithinPartitions(*SERIES_COLS, "metric", "bucket_start")
                .write.mode("overwrite")
                .parquet(stage_day)
            )
            rows = self.spark.read.parquet(stage_day).count()
            dst = self._day_dir(tier, day, run_id)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(stage_day, dst)
            new_pointers[day] = run_id
            size = sum(os.path.getsize(f) for f in self._day_files(tier, day, run_id))
            lineage.append(
                {"tier": tier, "day": day, "rows": rows, "bytes": size,
                 "compacted_to_files": want}
            )
        shutil.rmtree(staging, ignore_errors=True)
        self.commit_run(
            run_id, self.manifest.watermark, lineage, {tier: new_pointers}
        )
        return lineage
