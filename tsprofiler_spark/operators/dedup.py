"""Deduplication operators for large-scale training-data pipelines.

Four strategies over the `documents` table, all pure DataFrame expressions
(JVM-side, no Python in the data path):

* exact       — md5(text) hash-groupBy; the cheapest pass, always first.
* minhash+LSH — word-shingle MinHash signatures banded into LSH buckets;
                candidate pairs come from bucket joins only (never the
                full O(n²) cross join) — this is the 100 TB path.
* simhash     — 32-bit sign-aggregated token-hash fingerprint; near-dups
                differ in few bits.
* n-gram Jaccard — exact shingle-set similarity on candidate pairs; the
                verifier stage after LSH (here exposed standalone via a
                shingle-join for oracle comparability at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsprofiler_spark.functions.hashing import h32
from tsprofiler_spark.functions.spread import spread


def _word_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array column (size - n + 1
    shingles; empty array for texts shorter than n words)."""
    words = F.split(F.lower(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, shingles).otherwise(F.array().cast("array<string>"))
    )


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: one keeper (min doc_id) per md5(text)."""
    return documents.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_spread = spread  # shared helper: see functions/spread.py


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    return _spread(documents).select(
        "doc_id", F.explode(_word_shingles(F.col("text"), n)).alias("shingle")
    )


def minhash_signatures(documents: DataFrame, k: int = 12, n: int = 3) -> DataFrame:
    """k MinHash values per doc: min over shingles of h32(j || ':' || shingle).

    Shuffle profile: one explode + one groupBy(doc_id) — linear in corpus
    size, independent of pair count.
    """
    sh = doc_shingles(documents, n)
    hashed = sh.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(j) for j in range(k)])
        ).alias("j"),
        "shingle",
    ).select(
        "doc_id",
        "j",
        h32(F.concat_ws(":", F.col("j").cast("string"), F.col("shingle"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "j").agg(F.min("h").alias("minhash"))


def lsh_bands(signatures: DataFrame, rows_per_band: int = 3) -> DataFrame:
    """Band the signature: band_id = j / r, band_hash = joined minhashes.
    Docs sharing (band_id, band_hash) are LSH candidates."""
    with_band = signatures.withColumn(
        "band_id", (F.col("j") / rows_per_band).cast("int")
    )
    return with_band.groupBy("doc_id", "band_id").agg(
        F.concat_ws(
            "-",
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "minhash"))),
                lambda x: x.minhash.cast("string"),
            ),
        ).alias("band_hash")
    )


def minhash_candidates(documents: DataFrame, k: int = 12, rows_per_band: int = 3) -> DataFrame:
    """Candidate near-dup pairs from LSH bucket joins (a < b)."""
    bands = lsh_bands(minhash_signatures(documents, k), rows_per_band)
    left = bands.alias("a")
    right = bands.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash(documents: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per bit, sign-sum of token-hash bits.

    Shuffle profile: ONE groupBy(doc_id) moving one 8-byte hash per token.
    The per-bit ±1 sign sums fold JVM-side over the collected hash list
    (`aggregate` + `zip_with` elementwise array add) — no per-bit row
    explosion. The naive formulation (explode token × bit, double groupBy)
    shuffles 32× the rows for the same fingerprint; at 100 TB that factor
    IS the job cost.

    A token list for one document is bounded by document size (collect_list
    is per-doc, not per-corpus), so executor memory is safe at scale.
    """
    tokens = _spread(documents).select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    hashed = tokens.select("doc_id", h32(F.col("token")).alias("h"))
    agg = hashed.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))

    bit_seq = F.sequence(F.lit(0), F.lit(bits - 1))
    zeros = F.transform(bit_seq, lambda b: F.lit(0).cast("bigint"))
    sign_sums = F.aggregate(
        F.col("hs"),
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            bit_seq,
            lambda a, b: a
            + F.when(
                (F.floor(h / F.pow(F.lit(2.0), b)).cast("bigint") % 2) == 1,
                F.lit(1).cast("bigint"),
            ).otherwise(F.lit(-1).cast("bigint")),
        ),
    )
    fingerprint = F.aggregate(
        F.zip_with(
            sign_sums,
            bit_seq,
            lambda s, b: F.when(s > 0, F.pow(F.lit(2.0), b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return agg.select("doc_id", fingerprint.alias("simhash"))


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over shingle joins: |A∩B| / |A∪B| >= threshold.

    Intended as the LSH verifier; standalone it joins on shared shingles,
    so cost is bounded by true overlap, not n². Jaccard is emitted in
    integer micro-units for cross-engine hash parity.

    ``max_df``: document-frequency cap for the standalone path. A single
    hot shingle shared by m documents makes its join key emit m² candidate
    rows — boilerplate/stop-shingles go quadratic at corpus scale. Shingles
    with df > max_df are dropped from the JOIN side only (the standard
    stop-shingle cut); sizes (|A|, |B|) still count every shingle, so the
    reported Jaccard only ever *under*-counts overlap for affected pairs.
    ``None`` (default) keeps exact semantics — matching the oracle at test
    scale; production sets a cap (e.g. 1000).
    """
    sh = doc_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = (
            sh.join(F.broadcast(df_counts.where(F.col("_df") > max_df)), "shingle", "left_anti")
        )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    joined = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
    )
    return joined.where(F.col("jaccard") >= threshold).select(
        "doc_a",
        "doc_b",
        "common",
        "na",
        "nb",
        F.floor(F.col("jaccard") * 1000000 + F.lit(0.5)).cast("long").alias("jaccard_u"),
    )


def verify_candidates(
    documents: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs — the stage a real
    dedup pipeline runs between `minhash_candidates` and keeper resolution.

    Cost is proportional to |candidates| × shingles-per-doc, never all
    pairs and never all shared-shingle pairs: the shingle table is
    semi-joined down to candidate docs first, then intersections are
    counted only on (shingle ⋈ shingle) rows that land inside a candidate
    pair. At LSH's operating point candidates are a vanishing fraction of
    the corpus, so both joins are small; the hot-shingle quadratic blowup
    of the standalone shingle self-join (`ngram_jaccard_pairs`) cannot
    happen because the pair set is fixed up front.

    Emits (doc_a, doc_b, common, na, nb, jaccard_u, is_dup) for EVERY
    candidate — the false positives LSH banding admits are exactly the rows
    with is_dup = 0, which makes banding precision directly queryable.
    """
    sh = doc_shingles(documents, n)
    docs_in_pairs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = sh.join(F.broadcast(docs_in_pairs), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        F.broadcast(pairs.alias("p"))
        .join(a, F.col("a.doc_id") == F.col("p.doc_a"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("p.doc_b"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    joined = (
        pairs.join(common, ["doc_a", "doc_b"], "left")
        .na.fill({"common": 0})
        .join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
    )
    return joined.select(
        "doc_a",
        "doc_b",
        "common",
        "na",
        "nb",
        F.floor(F.col("jaccard") * 1000000 + F.lit(0.5)).cast("long").alias("jaccard_u"),
        (F.col("jaccard") >= threshold).cast("int").alias("is_dup"),
    )


def dedup_components(
    documents: DataFrame,
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected-components keeper resolution over near-dup candidate pairs.

    The step after LSH in a real dedup pipeline: candidate pairs (doc_a,
    doc_b) form an undirected graph; every document in a component keeps
    the component's min doc_id as its canonical ``keeper_id`` (singletons
    keep themselves). Emits (doc_id, keeper_id, is_keeper). Pair endpoints
    must be drawn from ``documents`` (always true for LSH candidates over
    the same corpus).

    Algorithm: iterative min-label propagation — each round every node
    takes the min label among itself and its neighbors; converges in
    O(graph diameter) rounds (near-dup clusters are shallow: diameter is
    typically 2-4, never the corpus). Only nodes that appear in a
    candidate pair can ever change label — singletons are fixed points —
    so the loop iterates over the TOUCHED SUBGRAPH only (|nodes in pairs|,
    typically a sliver of the corpus at real dup rates) and the corpus is
    joined back exactly once at the end. Each round is one co-partitioned
    join + one groupBy on doc_id over that sliver. The driver-side loop is
    control plane only (a one-row convergence aggregate per round); at
    10^9+ docs swap the propagation for the alternating large-star/
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce"), which bounds rounds at O(log n) under heavy skew — same
    output contract.
    """
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    edges.persist()
    # the union above emits every paired node on BOTH sides, so distinct
    # src == the touched-node set; everything else keeps itself untouched
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("comp")
    )
    changed = -1
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(edges.dst.alias("doc_id"))
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        new_labels.persist()
        # full count (no limit-short-circuit) so this action also fills the
        # new_labels cache completely before the old generation is dropped
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # running out of rounds means some component's labels are still
        # intermediate — silently returning them would split components
        # into multiple "keepers" and dedup incorrectly
        labels.unpersist()
        raise RuntimeError(
            f"dedup_components did not converge in {max_iterations} rounds: "
            f"{changed} labels still changing — a component's diameter "
            f"exceeds max_iterations; raise it (or use star-contraction at "
            f"this scale)"
        )
    # NOTE: the returned DataFrame reads from the final persisted labels
    # generation (unpersisting here would force a full loop-lineage
    # recompute on first use); callers that run many resolutions in one
    # session should materialize the result and clear the cache.
    # One corpus-wide pass: untouched docs (the vast majority) keep
    # themselves. The resolved-label side is the candidate subgraph —
    # usually small enough that AQE turns this into a broadcast join (not
    # forced: at pathological dup rates the subgraph can outgrow the
    # driver, and a shuffle join is then the right plan).
    return documents.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("keeper_id"),
        (F.coalesce(F.col("comp"), F.col("doc_id")) == F.col("doc_id"))
        .cast("int")
        .alias("is_keeper"),
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket-restricted.

    The scale path for vector near-dup at 10^9+ embeddings: candidates come
    only from equal random-hyperplane LSH buckets (`operators/similarity.py
    lsh_buckets` — deterministic planes, identical in DuckDB), then exact
    cosine filters at ``threshold``. The candidate join is bucket-local
    (never the O(n^2) cross join); at cluster scale the corpus partitions
    by bucket. Returns (keep_id, dup_id, cosine) with keep_id < dup_id.

    Expects columns (vec_id, embedding array<float|double>).
    """
    from tsprofiler_spark.operators.similarity import cosine_expr, lsh_buckets

    base = vectors.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    buckets = lsh_buckets(vectors, n_planes=n_planes, dim=dim)
    b = base.join(buckets, "vec_id")
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") < F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("keep_id"),
        F.col("c.vec_id").alias("dup_id"),
        cosine_expr(F.col("a.emb"), F.col("c.emb")).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold).select(
        "keep_id", "dup_id", F.round("cosine", 6).alias("cosine")
    )


def synth_benchmark(
    documents: DataFrame, every: int = 29, skip_words: int = 3, n_words: int = 10
) -> DataFrame:
    """Deterministic held-out "benchmark" set derived from the corpus: every
    ``every``-th doc contributes one eval snippet (words ``skip_words+1 ..
    skip_words+n_words`` of its text). Used by tests and the driver query to
    get guaranteed planted contamination without external data; a real
    deployment passes its own (bench_id, text) table to ``decontaminate``."""
    words = F.split(F.lower("text"), " ")
    return documents.where(F.col("doc_id") % every == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(words, skip_words + 1, n_words)).alias("text"),
    )


def decontaminate(documents: DataFrame, benchmark: DataFrame, n: int = 5) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word ``n``-gram
    with a held-out eval set (the standard 13-gram-overlap test-set leakage
    check in LLM training pipelines, shortened to ``n`` for test corpora).

    Plan shape for 100 TB: the benchmark side is tiny (eval sets are MBs),
    so its shingle set is **broadcast** — the corpus is never shuffled for
    the probe join; the only shuffle is the groupBy(doc_id) over *hit* rows
    (a minuscule fraction of the corpus). The final left join attaching hit
    counts back to per-doc shingle totals is computed from the same corpus
    scan; no all-pairs work anywhere.

    Returns one row per doc: (doc_id, n_shingles, n_hit_shingles,
    n_bench_matches, contaminated).
    """
    doc_sh = doc_shingles(documents, n)
    bench_sh = benchmark.select(
        "bench_id", F.explode(_word_shingles(F.col("text"), n)).alias("shingle")
    ).distinct()
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("bench_id").alias("n_bench_matches"),
        )
    )
    base = documents.select(
        "doc_id", F.size(_word_shingles(F.col("text"), n)).alias("n_shingles")
    )
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("int").alias("n_shingles"),
        F.coalesce("n_hit_shingles", F.lit(0)).cast("int").alias("n_hit_shingles"),
        F.coalesce("n_bench_matches", F.lit(0)).cast("int").alias("n_bench_matches"),
        (F.coalesce("n_hit_shingles", F.lit(0)) > 0).alias("contaminated"),
    )
