"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the (small) query set
  against the corpus; dot products as one flat codegen SQL expression
  (JVM-side, no Python, no interpreted lambdas). The correctness baseline.
* lsh_buckets / ann_topk — random-hyperplane LSH: deterministic
  pseudo-random planes from h32(plane, dim), signature = sign-bit int.
  The scale path: candidates only from matching buckets (multi-probe via
  allowing Hamming-adjacent buckets is a natural extension), so the join
  is bucket-local instead of O(n·q).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsprofiler_spark.functions.hashing import h32, h32_py
from tsprofiler_spark.functions.spread import spread


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


_spread = spread  # shared helper: see functions/spread.py

# All dot/norm/distance kernels below unroll to FLAT arithmetic parsed
# from ONE SQL string instead of aggregate(zip_with(...)) folds or
# Python-composed Column trees. Two measured costs motivate this: Spark
# evaluates higher-order-function lambdas interpreted per element (outside
# whole-stage codegen — 5.3 s for 8-plane signatures over just 2,000
# vectors), and composing the ~2,000-node flat tree Column-by-Column from
# Python pays a py4j JVM round-trip per node (~4 s per query just to BUILD
# the plan). A single F.expr string is one py4j call and the parsed tree
# compiles into the codegen stage. Bit-identical to the fold: same
# left-to-right add order ("a + b + c" parses left-associative), and the
# fold's 0.0 seed is an IEEE no-op (0.0 + x == x for every x except -0.0,
# where only the sign of an all-zero total can differ — rank ties and
# integer canonicalization are unaffected). Kernels take SQL fragments
# (column names / dotted refs), not Column objects.
_DIM = 64


def _dot_sql(a: str, b: str, dim: int = _DIM) -> str:
    return " + ".join(f"({a}[{d}] * {b}[{d}])" for d in range(dim))


def _sq_sql(a: str, dim: int = _DIM) -> str:
    return " + ".join(f"({a}[{d}] * {a}[{d}])" for d in range(dim))


def _dot(a: str, b: str, dim: int = _DIM):
    return F.expr(_dot_sql(a, b, dim))


def _norm(a: str, dim: int = _DIM):
    return F.expr(f"sqrt({_sq_sql(a, dim)})")


def _sq_l2(a: str, b: str, dim: int = _DIM):
    return F.expr(
        " + ".join(f"(({a}[{d}] - {b}[{d}]) * ({a}[{d}] - {b}[{d}]))" for d in range(dim))
    )


def cosine_expr(a: str, b: str, dim: int = _DIM):
    return F.expr(
        f"({_dot_sql(a, b, dim)}) / (sqrt({_sq_sql(a, dim)}) * sqrt({_sq_sql(b, dim)}))"
    )


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 10,
    query_mod: int = 100,
    dim: int = _DIM,
) -> DataFrame:
    """Exact top-k neighbors for query vectors (vec_id % query_mod == 0).

    The query side is tiny -> broadcast join; corpus side streams once.
    Ties break on neighbor id for determinism.
    """
    base = _spread(embeddings).select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    queries = base.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_expr("q_emb", "emb", dim).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cosine") * 1000000 + F.lit(0.5)).cast("long").alias("cosine_u"),
        )
    )


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1): (h32 % 2001 - 1000)/1000.

    Computed driver-side (hashlib md5 == the JVM/DuckDB h32: first 8 hex
    chars as uint32) so planes reach the executors as folded double
    literals inside the codegen stage, not per-row md5 expressions."""
    return ((h32_py(f"{plane}-{dim}") % 2001) - 1000) / 1000.0


def lsh_buckets(embeddings: DataFrame, n_planes: int = 12, dim: int = 64) -> DataFrame:
    """Random-hyperplane signature as a bucket integer per vector."""
    base = _spread(embeddings).select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    # one SQL string per signature: repr() round-trips each weight double
    # exactly, and the D suffix keeps the parser off DECIMAL literals
    bits = []
    for p in range(n_planes):
        dot = " + ".join(
            f"(emb[{d}] * ({_plane_weight(p, d)!r}D))" for d in range(dim)
        )
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END)")
    bucket = F.expr(" + ".join(bits))
    return base.select("vec_id", bucket.cast("bigint").alias("bucket"))


def ann_topk(
    embeddings: DataFrame,
    k: int = 10,
    query_mod: int = 100,
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: brute-force cosine *within* LSH buckets only.

    Multi-probe: each query also probes every bucket within Hamming
    distance ``multiprobe`` of its own signature (standard LSH trick —
    boosts recall without growing the index). Candidate cost is
    (1 + n_planes) per query at multiprobe=1 versus n·q for brute force.
    """
    buckets = lsh_buckets(embeddings, n_planes, dim)
    base = _spread(embeddings).select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    ).join(buckets, "vec_id")
    # every bucket within Hamming distance `multiprobe` of the query's own
    # signature: XOR masks of 1..multiprobe set bits (sum of C(n_planes, d)
    # probes — at the usual n_planes<=16 / multiprobe<=2 this stays tiny)
    masks = [0]
    for d in range(1, min(multiprobe, n_planes) + 1):
        masks += [
            sum(1 << p for p in bits) for bits in combinations(range(n_planes), d)
        ]
    probe_buckets = F.array(
        *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
    )
    queries = (
        base.where(F.col("vec_id") % query_mod == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.explode(probe_buckets).alias("q_bucket"),
        )
    )
    pairs = base.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_expr("q_emb", "emb", dim).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.floor(F.col("cosine") * 1000000 + F.lit(0.5)).cast("long").alias("cosine_u"))
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    seed: int = 159,
    vec_col: str = "embedding",
):
    """IVF coarse quantizer (the classic inverted-file ANN layout).

    KMeans (pyspark.ml, seeded → deterministic) learns ``n_centroids``
    coarse centroids; every corpus vector is assigned to its nearest
    centroid's inverted list. At 100 TB the corpus partitions by
    ``centroid_id`` so a query touches only ``n_probe`` partitions instead
    of the whole table. Returns (assigned, centroids): assigned =
    (vec_id, centroid_id) for the full corpus; centroids = tiny
    (centroid_id, centroid array<double>) table meant to be broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = embeddings.select(
        "vec_id", array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=8).fit(train)
    assigned = model.transform(train).select(
        "vec_id", F.col("prediction").cast("int").alias("centroid_id")
    )
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, centroid array<double>",
    )
    return assigned, centroids


def kmeans_integer(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-exact seeded Lloyd's KMeans — an oracle-checkable IVF
    coarse quantizer.

    MLlib's KMeans (`ivf_index`) is seeded-deterministic, but its
    iterative float math can't be replayed in SQL, leaving that training
    step outside the value-check. This variant makes TRAINING itself
    cross-engine exact so the whole IVF path (train → assign → probe →
    score) is relational-oracle-checkable:

    * vectors quantize to micro-units ``floor(x*1e6 + 0.5)`` as BIGINT —
      every distance is an exact integer sum of squares;
    * init = the ``n_centroids`` vectors ranking first by
      ``(h32(vec_id), vec_id)`` — a deterministic "random" seed draw;
    * each Lloyd round assigns to the nearest centroid (squared L2, ties
      on centroid_id) and recomputes centroids as the floor-division mean
      (Python ``s // n`` == SQL ``(s - pmod(s, n)) div n`` — exact BIGINT
      at any scale, no float mean), so centroids stay on the integer grid;
      empty clusters keep their previous centroid.

    Scale shape: each round is ONE map-side-combining hash aggregate over
    the corpus (COUNT + 64 per-dim SUMs per centroid; the assignment is a
    pure JVM expression over broadcast-literal centroids — no join, no
    vector shuffle); only the k×dim-int centroid table reaches the driver,
    the same aggregate-collect control loop MLlib itself runs. Returns
    (centroid_id int, centroid array<double>) with centroid =
    micro-units / 1e6 (one IEEE division — exact to reproduce in SQL).
    """
    # the per-round assignment inlines n_centroids*dim literal subtrees into
    # ONE Catalyst expression — fine at the IVF coarse-quantizer scale
    # (k*dim = 16*64 = 1k), but a k=4096 caller would hand Catalyst a
    # multi-hundred-thousand-node tree (codegen blowup / 64KB method limit).
    # Fail fast with the remedy instead.
    if n_centroids * dim > 16_384:
        raise ValueError(
            f"kmeans_integer: n_centroids*dim = {n_centroids}*{dim} = "
            f"{n_centroids * dim} exceeds the 16384 literal-expression "
            "budget; use ivf_index (MLlib KMeans) for large codebooks"
        )
    base = _spread(embeddings).select(
        "vec_id",
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.floor(x * scale + F.lit(0.5)).cast("bigint"),
        ).alias("eu"),
    )
    # persist BEFORE the seed draw: the seed job then also fills the cache,
    # so the quantization scan of the corpus runs once, not twice
    base = base.persist()
    seed_rows = (
        base.select("vec_id", "eu", h32(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_centroids)
        .collect()
    )
    seed_rows = sorted(seed_rows, key=lambda r: (r["h"], r["vec_id"]))
    cents = [[int(v) for v in r["eu"]] for r in seed_rows]
    # a corpus smaller than n_centroids degrades to one centroid per
    # vector (the SQL oracle's QUALIFY rank <= n does the same) instead
    # of crashing on cents[j] in the Lloyd loop below
    n_centroids = len(cents)

    try:
        for _ in range(iters):
            def _d2(cu):
                return F.expr(
                    " + ".join(
                        f"((eu[{d}] - {c}L) * (eu[{d}] - {c}L))"
                        for d, c in enumerate(cu)
                    )
                )

            d2s = [_d2(cu) for cu in cents]
            arr = F.array(*d2s)
            assigned = base.select(
                "eu",
                (F.array_position(arr, F.array_min(arr)) - 1)
                .cast("int")
                .alias("centroid_id"),
            )
            agg = assigned.groupBy("centroid_id").agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("eu")[d]).alias(f"s{d}") for d in range(dim)],
            ).collect()
            new = {
                int(r["centroid_id"]): [int(r[f"s{d}"]) // int(r["n"]) for d in range(dim)]
                for r in agg
            }
            cents = [new.get(j, cents[j]) for j in range(n_centroids)]
    finally:
        base.unpersist()

    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(j, [c / scale for c in cu]) for j, cu in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    )


def assign_centroids(base: DataFrame, centroids: DataFrame, dim: int = _DIM) -> DataFrame:
    """Nearest-centroid assignment (squared euclidean, ties on centroid_id)
    against a broadcast centroid table — the inverted-list build step when
    the coarse quantizer is supplied explicitly instead of learned.

    ``base`` = (vec_id, emb array<double>); ``centroids`` = (centroid_id,
    centroid array<double>).
    """
    scored = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "centroid_id", _sq_l2("emb", "centroid", dim).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 10,
    query_mod: int = 100,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 159,
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    dim: int = _DIM,
) -> DataFrame:
    """Approximate top-k via IVF: queries score only the ``n_probe``
    inverted lists whose centroids are nearest the query.

    Query→centroid distance ranks against the broadcast centroid table;
    candidate scoring joins corpus vectors on centroid_id (bucket-local,
    never O(n·q)); cosine runs JVM-side as one flat codegen SQL string.

    ``centroids`` (centroid_id, centroid array<double>) supplies an
    explicit coarse quantizer (deterministic sample, product-of-experts,
    pre-trained codebook, ...); default None learns seeded KMeans centroids
    via `ivf_index`.
    """
    base = _spread(embeddings).select("vec_id", _as_double(F.col(vec_col)).alias("emb"))
    if centroids is None:
        assigned, centroids = ivf_index(embeddings, n_centroids, seed, vec_col)
    else:
        assigned = assign_centroids(base, centroids, dim)
    corpus = base.join(assigned, "vec_id")

    queries = base.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    # rank centroids per query on the broadcast centroid table
    q_cent = queries.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "q_emb",
        "centroid_id",
        _dot("q_emb", "centroid", dim).alias("qc_dot"),
        _norm("centroid", dim).alias("c_norm"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        (F.col("qc_dot") / (F.lit(1e-12) + F.col("c_norm"))).desc(),
        F.col("centroid_id"),
    )
    probes = (
        q_cent.withColumn("probe_rank", F.row_number().over(w_probe))
        .where(F.col("probe_rank") <= n_probe)
        .select("query_id", "q_emb", "centroid_id")
    )

    cand = probes.join(corpus, "centroid_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_expr("q_emb", "emb", dim).alias("cosine"),
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_k))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
