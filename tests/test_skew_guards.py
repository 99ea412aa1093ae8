"""Skew guards for boilerplate-heavy corpora: the caps bound the quadratic
within-bucket / within-cluster work, are OBSERVABLE (Observation metrics),
and the "scale" profile pins them on through the TOML pipeline."""

import numpy as np
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
from text_dedup_spark.kernels.simhash_kernel import SimHashKernel
from text_dedup_spark.operators.minhash import minhash_dedup
from text_dedup_spark.operators.simhash import simhash_dedup


@pytest.fixture(scope="module")
def boilerplate_corpus(spark):
    """Pathological web corpus: 60 docs are one shared boilerplate page
    (hot bucket / giant cluster), 40 docs are unique."""
    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(400)]

    def doc(n):
        return " ".join(words[i] for i in rng.randint(0, 400, size=n))

    boiler = doc(60)
    # DISTINCT per-doc tails: 60 distinct near-miss signatures that still
    # share buckets (what the cap bounds). Identical-text floods are handled
    # upstream by the exact-duplicate signature contraction and never reach
    # the bucket join, so they cannot exercise the cap.
    rows = [(i, boiler + f" tail{i}") for i in range(60)]
    rows += [(100 + i, doc(rng.randint(40, 90))) for i in range(40)]
    return spark.createDataFrame(rows, "__INDEX__ long, text string")


class TestSimHashBucketCap:
    def test_cap_observable_and_bounding(self, spark, boilerplate_corpus):
        kernel = SimHashKernel(f=64, bit_diff=3, num_bucket=4, ngram_size=3, min_length=5)
        obs = Observation("simhash_cap")
        res = simhash_dedup(
            boilerplate_corpus, kernel, max_bucket_size=20, observation=obs
        )
        n_dup_capped = res.docs.where(F.col("__duplicate__")).count()
        got = obs.get
        assert got["n_buckets_dropped"] > 0
        assert got["n_postings_dropped"] > 20 * got["n_buckets_dropped"] / 2
        # uncapped run for contrast: boilerplate cluster is found in full
        res_full = simhash_dedup(boilerplate_corpus, kernel)
        n_dup_full = res_full.docs.where(F.col("__duplicate__")).count()
        assert n_dup_full >= 59  # the 60 boilerplate docs cluster
        assert n_dup_capped <= n_dup_full

    def test_large_cap_is_noop(self, spark, boilerplate_corpus):
        kernel = SimHashKernel(f=64, bit_diff=3, num_bucket=4, ngram_size=3, min_length=5)
        obs = Observation("simhash_nocap")
        res = simhash_dedup(
            boilerplate_corpus, kernel, max_bucket_size=100_000, observation=obs
        )
        capped = sorted(
            (r["__INDEX__"], r["__CLUSTER__"]) for r in res.docs.collect()
        )
        assert obs.get["n_buckets_dropped"] == 0
        res_full = simhash_dedup(boilerplate_corpus, kernel)
        assert capped == sorted(
            (r["__INDEX__"], r["__CLUSTER__"]) for r in res_full.docs.collect()
        )


class TestMinHashVerifyCap:
    def test_bypass_observable_and_assignment_kept(self, spark, boilerplate_corpus):
        kernel = MinHashKernel(num_perm=64, ngram_size=2, min_length=5, threshold=0.5)
        obs = Observation("fp_cap")
        res = minhash_dedup(
            boilerplate_corpus,
            kernel,
            check_false_positive=True,
            max_cluster_verify=10,
            observation=obs,
        )
        rows = {r["__INDEX__"]: r["__CLUSTER__"] for r in res.docs.collect()}
        assert obs.get["n_bypassed"] >= 60  # giant cluster skipped verification
        # bypassed members keep their cluster assignment (no silent unclustering)
        boiler_clusters = {rows[i] for i in range(60)}
        assert len(boiler_clusters) == 1


class TestScaleProfileToml:
    def test_profile_scale_runs_pipeline(self, spark, boilerplate_corpus, tmp_path):
        """TOML with profile='scale' pins the guards and completes."""
        from text_dedup_spark.config import load_config
        from text_dedup_spark.pipeline import run_pipeline

        src = tmp_path / "docs.parquet"
        boilerplate_corpus.write.parquet(str(src))
        cfg_path = tmp_path / "scale.toml"
        cfg_path.write_text(
            f"""
[input]
input_type = "local_files"
file_type = "parquet"
[input.read_arguments]
path = "{src}"
[algorithm]
algorithm_name = "simhash"
text_column = "text"
index_column = "__INDEX__"
profile = "scale"
f = 64
bit_diff = 3
num_bucket = 4
ngram_size = 3
min_length = 5
[output]
output_dir = "{tmp_path / 'out'}"
"""
        )
        cfg = load_config(str(cfg_path))
        assert cfg.algorithm.profile == "scale"
        summary = run_pipeline(cfg, spark=spark)
        assert 0 < summary["rows_after"] <= 100
