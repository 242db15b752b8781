"""Semantic properties of the embedding-column operators (the oracle
match itself is auto-covered by test_operators_oracle)."""

import pyspark.sql.functions as F

from flink_project_userbehavioranalysis_spark.io import load_table
from flink_project_userbehavioranalysis_spark.operators import embeddings_ops as EMB


def test_centroid_shape_and_counts(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(F.size("embedding").alias("d")).agg(F.max("d")).collect()[0][0]
    rows = EMB.embedding_centroids_vec(spark, sf_dir).collect()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["label"] for r in rows} == labels
    assert all(len(r["centroid"]) == dims for r in rows)
    assert all(len(r["centroid_q"]) == dims for r in rows)
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        # every centroid component must lie within the corpus value
        # range, and the double mean must be the exact-integer sum
        # divided out (the derivation _centroids_by documents)
        assert all(-1.0 <= c <= 1.0 for c in r["centroid"])
        for q, c in zip(r["centroid_q"], r["centroid"]):
            assert c == q / (r["n_vecs"] * 1e9)


def test_centroid_long_matches_vec(spark, sf_dir):
    """The registered long-format view carries EXACTLY the vec API's
    per-dim integer state: pivoting the long rows back by dim must
    reproduce each label's centroid_q array, and every registered cell
    must be a driver-hashable scalar (the r6 red-row regression)."""
    vec = {
        r["label"]: r for r in EMB.embedding_centroids_vec(spark, sf_dir).collect()
    }
    long_rows = EMB.embedding_centroids(spark, sf_dir).collect()
    assert all(
        not isinstance(v, (list, dict)) for r in long_rows for v in r
    ), "registered centroid surface must emit scalar cells only"
    by_label: dict[str, dict[int, tuple[int, int]]] = {}
    for r in long_rows:
        by_label.setdefault(r["label"], {})[r["dim"]] = (r["s_q"], r["n_vecs"])
    assert by_label.keys() == vec.keys()
    for label, dims in by_label.items():
        v = vec[label]
        assert [dims[d][0] for d in sorted(dims)] == v["centroid_q"]
        assert all(n == v["n_vecs"] for _, n in dims.values())


def test_kmeans_summary_digest_pins_centroids(spark, sf_dir):
    """kmeans_summary ≡ kmeans_lloyd with the centroid array collapsed
    to a deterministic md5 of its comma-joined integer components."""
    import hashlib

    arr = {r["cid"]: r for r in EMB.kmeans_lloyd(spark, sf_dir, k=4, iters=1).collect()}
    dig = {r["cid"]: r for r in EMB.kmeans_summary(spark, sf_dir, k=4, iters=1).collect()}
    assert arr.keys() == dig.keys()
    for cid, r in dig.items():
        a = arr[cid]
        assert (r["n_points"], r["inertia_q"]) == (a["n_points"], a["inertia_q"])
        want = hashlib.md5(
            ",".join(str(x) for x in a["centroid_q"]).encode()
        ).hexdigest()
        assert r["centroid_md5"] == want


def test_quantize_saturates_max_component(spark, sf_dir):
    # derive the dim bound from the data, not a literal: testdata is
    # regenerated between rounds and the embedding width is not pinned
    # (test_testdata_schema deliberately avoids it), so a hard-coded 64
    # would fail a width change with a confusing bound error
    import os

    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )["embedding"][0]
    )
    rows = EMB.quantize_embeddings(spark, sf_dir).collect()
    assert rows, "non-empty corpus must quantize"
    for r in rows:
        # the max-|x| component maps to exactly ±127 ⇒ at least one
        # saturated entry per vector, and the sum is bounded by dim*127
        assert r["n_sat"] >= 1
        assert r["scale"] > 0
        assert abs(r["sum_q"]) <= 127 * dim


def test_quantize_plan_is_map_only(spark, sf_dir):
    plan = EMB.quantize_embeddings(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "quantization must not shuffle"
    assert "BatchEvalPython" not in plan


def test_kmeans_lloyd(spark, sf_dir):
    """Iterative k-means: oracle-match (recurrence unrolled), exact
    partition of the corpus, Lloyd improvement over the seed
    assignment, and a JVM-only plan."""
    from tests.oracle import assert_matches_oracle

    df = EMB.kmeans_lloyd(spark, sf_dir, k=4, iters=2)
    assert_matches_oracle(
        df, EMB.kmeans_lloyd_oracle_sql(k=4, iters=2), sf_dir
    )
    rows = df.collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_points"] for r in rows) == n_vecs  # exact partition
    assert 1 <= len(rows) <= 4
    # two Lloyd rounds must not be worse than the raw seed assignment
    seed_inertia = sum(
        r["inertia_q"]
        for r in EMB.kmeans_lloyd(spark, sf_dir, k=4, iters=0).collect()
    )
    two_inertia = sum(r["inertia_q"] for r in rows)
    assert two_inertia <= seed_inertia
    plan = (
        EMB.kmeans_lloyd(spark, sf_dir, k=4, iters=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_pca_matches_numpy(spark, sf_dir):
    """embedding_pca ≡ single-node numpy PCA: identical projections
    (same deterministic sign convention), descending component
    variance, and orthonormal implied components."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / X.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    V = evecs[:, order]
    for c in range(V.shape[1]):
        piv = int(np.argmax(np.abs(V[:, c])))
        if V[piv, c] < 0:
            V[:, c] = -V[:, c]
    ref = (X - mu) @ V  # n x 4

    rows = EMB.embedding_pca(spark, sf_dir, k=4).orderBy("vec_id").collect()
    got = np.asarray([[r[f"pc{c}"] for c in range(4)] for r in rows])
    assert got.shape == ref.shape
    # distributed partial-Gram order only perturbs sums at ~1e-12
    # relative; eigenvector perturbation stays far under this tol
    assert np.allclose(got, ref, atol=1e-6)
    # explained variance must be descending across components
    var = got.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))
    # projected variances must equal the top eigenvalues
    assert np.allclose(var, np.sort(evals)[::-1][:4], atol=1e-6)
