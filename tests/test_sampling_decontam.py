"""Deterministic sampling / splits and benchmark decontamination.

Covers operators/sampling.py (hash_split, stratified_sample) and the
decontaminate + synth_benchmark pair in operators/dedup.py. Everything is
keyed on the cross-engine h32 hash, so the core property under test is
determinism: same input -> identical assignment regardless of
partitioning; plus planted-contamination recall (every doc that feeds the
synthesized benchmark must be flagged against itself).
"""

import pytest
from pyspark.sql import functions as F

from tsprofiler_spark.operators.dedup import decontaminate, synth_benchmark
from tsprofiler_spark.operators.sampling import hash_split, stratified_sample
from tsprofiler_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_hash_split_partitions_everything(docs):
    out = hash_split(docs).cache()
    total = docs.count()
    by_split = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == total
    assert set(by_split) <= {"train", "val", "test"}
    # 80/10/10 within generous tolerance at small n
    assert by_split["train"] / total > 0.6
    assert by_split["train"] / total < 0.95
    out.unpersist()


def test_hash_split_stable_under_repartition(docs):
    a = hash_split(docs)
    b = hash_split(docs.repartition(13))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_hash_split_bucket_consistent_with_split(docs):
    bad = hash_split(docs, train_pct=80, val_pct=10).where(
        ((F.col("bucket") < 80) & (F.col("split") != "train"))
        | ((F.col("bucket") >= 80) & (F.col("bucket") < 90) & (F.col("split") != "val"))
        | ((F.col("bucket") >= 90) & (F.col("split") != "test"))
    )
    assert bad.isEmpty()


def test_stratified_sample_rates_and_determinism(docs):
    fr = {"en": 0.35, "zh": 0.8}
    out = stratified_sample(docs, fr, default_fraction=0.6).cache()
    # deterministic: re-run equals first run
    again = stratified_sample(docs.repartition(7), fr, default_fraction=0.6)
    assert out.exceptAll(again).isEmpty() and again.exceptAll(out).isEmpty()
    n_in = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_out = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in {**fr, "de": 0.6}.items():
        got = n_out.get(lang, 0) / n_in[lang]
        assert abs(got - frac) < 0.25, (lang, got, frac)
    out.unpersist()


def test_stratified_sample_zero_fraction_drops_stratum(docs):
    out = stratified_sample(docs, {"en": 0.0}, default_fraction=1.0)
    assert out.where(F.col("lang") == "en").isEmpty()
    assert out.count() == docs.where(F.col("lang") != "en").count()


def test_decontaminate_flags_planted_sources(docs):
    bench = synth_benchmark(docs, every=29, skip_words=3, n_words=10)
    out = decontaminate(docs, bench, n=5).cache()
    # one row per doc, schema as promised
    assert out.count() == docs.count()
    # every doc whose snippet fed the benchmark AND is long enough to form
    # a 5-gram from its 10-word slice must be flagged against itself
    long_enough = docs.where(
        (F.col("doc_id") % 29 == 0) & (F.size(F.split(F.lower("text"), " ")) >= 13)
    ).select("doc_id")
    n_planted = long_enough.count()
    assert n_planted > 0, "fixture too small: no planted benchmark docs"
    flagged = out.where(F.col("contaminated")).select("doc_id")
    missed = long_enough.exceptAll(flagged.join(long_enough, "doc_id").select("doc_id"))
    assert missed.isEmpty()
    # hit counts are bounded by totals
    assert out.where(F.col("n_hit_shingles") > F.col("n_shingles")).isEmpty()
    out.unpersist()


def test_decontaminate_clean_benchmark_flags_nothing(spark, docs):
    bench = spark.createDataFrame(
        [(0, "zzzq qqzz zqzq qzqz zzqq wwww")], ["bench_id", "text"]
    )
    out = decontaminate(docs, bench, n=5)
    assert out.where(F.col("contaminated")).isEmpty()


def test_decontaminate_plan_broadcasts_benchmark(docs):
    bench = synth_benchmark(docs)
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
