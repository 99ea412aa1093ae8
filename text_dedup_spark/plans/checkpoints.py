"""Checkpoint-resumable stage runner with per-partition lineage + metrics.

SURVEY.md §7.8: each pipeline stage writes a parquet table
``{run_dir}/{stage}/data`` plus a manifest json (stage name, config hash,
row count, partition count, wall time); a re-run with the same config hash
skips the stage and reads the checkpoint — crash-resumability for multi-hour
100 TB jobs. (Iceberg would slot in as the table format where its runtime
jar is on the classpath; plain parquet keeps this container-portable —
the runner's contract is format-agnostic.)

Lineage: every checkpointed stage can attach ``spark_partition_id()`` (and
``input_file_name()`` when scanning files) to a sidecar metrics table so
skew and partition health are observable per stage.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def config_hash(obj) -> str:
    """Stable hash of any json-serializable config (dataclasses supported)."""
    try:
        from dataclasses import asdict, is_dataclass

        if is_dataclass(obj):
            obj = asdict(obj)
    except Exception:
        pass

    def default(o):
        import numpy as np

        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.integer, np.floating)):
            return o.item()
        if isinstance(o, type):
            return o.__name__
        return str(o)

    payload = json.dumps(obj, sort_keys=True, default=default)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass
class StageRunner:
    spark: SparkSession
    run_dir: str
    collect_lineage: bool = True
    manifest_log: list[dict] = field(default_factory=list)

    def _paths(self, stage: str) -> tuple[Path, Path, Path]:
        base = Path(self.run_dir) / stage
        return base, base / "data", base / "manifest.json"

    def stage(
        self,
        name: str,
        cfg,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        """Run (or resume) a stage. ``build`` produces the stage output
        DataFrame; it is only invoked when no valid checkpoint exists."""
        base, data_path, manifest_path = self._paths(name)
        chash = config_hash(cfg)
        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            if manifest.get("config_hash") == chash:
                self.manifest_log.append({**manifest, "resumed": True})
                return self.spark.read.parquet(str(data_path))
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(str(data_path))
        out = self.spark.read.parquet(str(data_path))
        n_rows = out.count()
        n_parts = out.rdd.getNumPartitions()
        manifest = {
            "stage": name,
            "config_hash": chash,
            "rows": n_rows,
            "partitions": n_parts,
            "wall_sec": round(time.time() - t0, 3),
            "resumed": False,
        }
        if self.collect_lineage:
            lineage = (
                out.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count(F.lit(1)).alias("rows"))
                .orderBy("partition_id")
            )
            lineage.write.mode("overwrite").parquet(str(base / "lineage"))
            stats = lineage.agg(
                F.max("rows").alias("max"), F.avg("rows").alias("avg")
            ).collect()[0]
            manifest["partition_skew"] = round(
                (stats["max"] / stats["avg"]) if stats["avg"] else 1.0, 3
            )
        base.mkdir(parents=True, exist_ok=True)
        manifest_path.write_text(json.dumps(manifest, indent=2))
        self.manifest_log.append(manifest)
        return out


def observe_counts(df: DataFrame, name: str) -> DataFrame:
    """Attach an ``observe`` metric (row count) surfaced in QueryExecution
    listeners — zero-cost signature/shuffle counters (SURVEY.md §7.8)."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))
