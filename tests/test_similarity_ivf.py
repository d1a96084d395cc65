"""IVF ANN (operators/similarity.py ivf_index/ivf_topk): deterministic
under a fixed seed, bucket-local candidate generation, and acceptable
recall vs the exact brute-force baseline on the driver embeddings table."""

import pytest

from tsprofiler_spark.operators.similarity import brute_force_topk, ivf_topk
from tsprofiler_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _neighbors(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_brute(spark, embs):
    exact = _neighbors(brute_force_topk(embs, k=10, query_mod=100))
    approx = _neighbors(ivf_topk(embs, k=10, query_mod=100, n_centroids=8, n_probe=3))
    assert set(approx) == set(exact)
    recalls = [
        len(approx[q] & exact[q]) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    # probing 3/8 lists on random-ish embeddings: recall well above chance;
    # the point is the bucket-local join shape, not SOTA recall
    assert mean_recall >= 0.5, mean_recall


def test_ivf_deterministic(spark, embs):
    a = sorted(map(tuple, ivf_topk(embs, k=5, query_mod=100, seed=7).collect()))
    b = sorted(map(tuple, ivf_topk(embs, k=5, query_mod=100, seed=7).collect()))
    assert a == b


def test_kmeans_integer_ivf_recall_and_grid(spark, embs):
    """The oracle-checkable quantizer: centroids live on the 1e-6 grid
    (so c*1e6 round-trips to an exact integer), the learned-quantizer IVF
    beats chance recall, and repeated training is bit-identical (exact
    integer arithmetic -> no partitioning sensitivity)."""
    from tsprofiler_spark.operators.similarity import kmeans_integer

    cents = kmeans_integer(embs, n_centroids=8, iters=3).collect()
    assert len(cents) == 8
    for r in cents:
        assert len(r.centroid) == 64
        for c in r.centroid:
            assert c == round(c * 1e6) / 1e6

    exact = _neighbors(brute_force_topk(embs, k=10, query_mod=100))
    cdf = kmeans_integer(embs, n_centroids=8, iters=3)
    approx = _neighbors(ivf_topk(embs, k=10, query_mod=100, n_probe=3, centroids=cdf))
    assert set(approx) == set(exact)
    recalls = [len(approx[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5

    again = sorted(
        (r.centroid_id, tuple(r.centroid))
        for r in kmeans_integer(embs.repartition(7), n_centroids=8, iters=3).collect()
    )
    first = sorted((r.centroid_id, tuple(r.centroid)) for r in cents)
    assert again == first


def test_kmeans_integer_small_corpus_degrades(spark):
    """Corpus smaller than n_centroids: one centroid per vector (the SQL
    oracle's QUALIFY rank <= n draws the same), not an IndexError in the
    Lloyd loop."""
    from tsprofiler_spark.operators.similarity import kmeans_integer

    tiny = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_integer(tiny, n_centroids=8, iters=2).collect()
    assert len(cents) == 5


def test_kmeans_integer_expression_budget_guard(spark):
    """k*dim over the literal-expression budget must fail fast with the
    remedy named, not hand Catalyst a quarter-million-node tree."""
    import pytest

    from tsprofiler_spark.operators.similarity import kmeans_integer

    tiny = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ivf_index"):
        kmeans_integer(tiny, n_centroids=4096, iters=1)
