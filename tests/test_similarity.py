"""ANN verification: brute-force exactness properties and LSH recall.

``lsh_bucketed_topk`` is approximate by design, so it is verified by a
pinned recall floor against the oracle-green ``brute_force_topk`` on a
planted near-duplicate fixture (clusters with within-cluster cosine ~0.99 —
the regime the sketch is built for; the driver's synthetic embeddings have
max pairwise cosine ~0.51, i.e. no near neighbors to recall). The hot-bucket
skew cap is verified observably via ``pyspark.sql.Observation``.
"""

import numpy as np
import pytest

from text_dedup_spark.functions.similarity import brute_force_topk, lsh_bucketed_topk


def planted_embeddings(spark, n_clusters=60, cluster_size=5, dim=64, seed=7):
    """Unit vectors in tight clusters (pairwise cosine ~0.99 within)."""
    rng = np.random.RandomState(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for _ in range(cluster_size):
            v = base + 0.012 * rng.randn(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def planted(spark):
    return planted_embeddings(spark).cache()


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    return out


class TestLshRecall:
    def test_recall_at_3_vs_brute_force(self, spark, planted):
        truth = _topk_map(brute_force_topk(planted, k=3))
        approx = _topk_map(lsh_bucketed_topk(planted, k=3))
        recalls = [
            len(approx.get(vid, set()) & nbrs) / len(nbrs)
            for vid, nbrs in truth.items()
        ]
        avg = sum(recalls) / len(recalls)
        assert len(truth) == 300
        assert avg >= 0.9, f"recall@3 {avg:.3f} below pinned floor 0.9"

    def test_deterministic(self, spark, planted):
        a = sorted(map(tuple, lsh_bucketed_topk(planted, k=3).collect()))
        b = sorted(map(tuple, lsh_bucketed_topk(planted, k=3).collect()))
        assert a == b

    def test_subset_of_exact_scores(self, spark, planted):
        """Every LSH (vec, neighbor, dot) must agree with the exact dot."""
        exact = {
            (r["vec_id"], r["neighbor_id"]): r["dot"]
            for r in brute_force_topk(planted, k=299).collect()
        }
        for r in lsh_bucketed_topk(planted, k=3).collect():
            assert exact[(r["vec_id"], r["neighbor_id"])] == r["dot"]


class TestIvfRecall:
    def test_recall_at_3_vs_brute_force(self, spark, planted):
        from text_dedup_spark.functions.similarity import ivf_topk

        truth = _topk_map(brute_force_topk(planted, k=3))
        approx = _topk_map(ivf_topk(planted, k=3, n_centroids=16, nprobe=4))
        recalls = [
            len(approx.get(vid, set()) & nbrs) / len(nbrs)
            for vid, nbrs in truth.items()
        ]
        avg = sum(recalls) / len(recalls)
        assert avg >= 0.9, f"IVF recall@3 {avg:.3f} below pinned floor 0.9"

    def test_deterministic_and_exact_scores(self, spark, planted):
        from text_dedup_spark.functions.similarity import ivf_topk

        a = sorted(map(tuple, ivf_topk(planted, k=3).collect()))
        b = sorted(map(tuple, ivf_topk(planted, k=3).collect()))
        assert a == b
        exact = {
            (r["vec_id"], r["neighbor_id"]): r["dot"]
            for r in brute_force_topk(planted, k=299).collect()
        }
        for vid, nid, dot, _rank in a:
            assert exact[(vid, nid)] == dot


class TestBucketCap:
    def test_cap_drops_observably(self, spark, planted):
        from pyspark.sql import Observation

        obs = Observation("lsh_cap")
        out = lsh_bucketed_topk(planted, k=3, max_bucket_size=3, observation=obs)
        n_rows = out.count()
        got = obs.get
        assert got["n_buckets_dropped"] > 0
        assert got["n_postings_dropped"] >= got["n_buckets_dropped"] * 4
        assert n_rows >= 0  # capped run still completes with a valid frame

    def test_no_drops_under_large_cap(self, spark, planted):
        from pyspark.sql import Observation

        obs = Observation("lsh_nocap")
        out = lsh_bucketed_topk(planted, k=3, max_bucket_size=10_000, observation=obs)
        capped = sorted(map(tuple, out.collect()))
        assert obs.get["n_buckets_dropped"] == 0
        default = sorted(map(tuple, lsh_bucketed_topk(planted, k=3).collect()))
        assert capped == default
