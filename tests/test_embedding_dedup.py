"""Embedding-cosine dedup vs single-node oracle (exact quantized-int math)."""

import numpy as np

from text_dedup_spark.functions.embedding_dedup import embedding_cosine_dedup
from text_dedup_spark.kernels.union_find import UnionFind


def make_vectors(n=120, dim=16, seed=9):
    rng = np.random.RandomState(seed)
    base = rng.randn(n // 3, dim)
    vecs = []
    for i in range(n):
        b = base[i % (n // 3)]
        if i < n // 3:
            v = b  # originals
        elif i < 2 * n // 3:
            v = b + rng.randn(dim) * 0.02  # near-duplicates (cos ~ 0.999)
        else:
            v = rng.randn(dim)  # unrelated
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
    return vecs


def oracle(vecs, threshold):
    q = [np.round(np.asarray(v, dtype=np.float64) * 1000).astype(np.int64) for v in vecs]
    uf = UnionFind()
    t2m = int(round(threshold * threshold * 1_000_000))
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            dot = int(q[i] @ q[j])
            na, nb = int(q[i] @ q[i]), int(q[j] @ q[j])
            if dot >= 0 and dot * dot * 1_000_000 >= na * nb * t2m:
                uf.union(i, j)
    return uf.get_clusters()


def test_matches_oracle(spark):
    vecs = make_vectors()
    expected = oracle(vecs, 0.95)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in embedding_cosine_dedup(df, threshold=0.95).collect()
    }
    assert len(got) == len(vecs)
    n_dups = 0
    for i in range(len(vecs)):
        exp_cluster = expected.get(i, i)
        assert got[i][0] == exp_cluster, f"vec {i}"
        assert got[i][1] == (1 if i in expected else 0)
        n_dups += got[i][1]
    assert n_dups >= 2 * (len(vecs) // 3) * 0.9  # planted near-dups found
