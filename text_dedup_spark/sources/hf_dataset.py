"""HF ``save_to_disk`` dataset-directory source (reference S1).

Reference: ``src/text_dedup/data_sources/io.py:29-45`` loads a directory
written by ``datasets.Dataset.save_to_disk`` via ``load_from_disk``. The
on-disk layout is public (HF datasets docs): ``state.json`` listing
``_data_files`` shard names, each shard an Arrow IPC *stream* file; a
``DatasetDict`` dir instead has ``dataset_dict.json`` naming per-split
subdirectories.

Spark-first read: shards are listed on the driver (state.json is tiny), the
schema is peeked from the first shard, then each shard is decoded inside
``mapInPandas`` on the executors — a distributed scan with one task per
shard, no driver materialization. The ``datasets`` package itself is not
required (absent in this container); only pyarrow is used.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _resolve_split_dir(path: str, split: str | None) -> str:
    """DatasetDict dir -> the split's subdir; Dataset dir -> itself."""
    if os.path.exists(os.path.join(path, "dataset_dict.json")):
        with open(os.path.join(path, "dataset_dict.json")) as f:
            splits = json.load(f)["splits"]
        base = (split or "train").split("[")[0].strip()
        if base not in splits:
            raise ValueError(f"split {base!r} not in dataset dict {splits}")
        return os.path.join(path, base)
    return path


def _shard_files(split_dir: str) -> list[str]:
    state_path = os.path.join(split_dir, "state.json")
    if not os.path.exists(state_path):
        raise FileNotFoundError(
            f"{split_dir} is not an HF save_to_disk dataset dir (no state.json)"
        )
    with open(state_path) as f:
        state = json.load(f)
    files = [os.path.join(split_dir, d["filename"]) for d in state["_data_files"]]
    if not files:
        raise ValueError(f"{split_dir}: state.json lists no data files")
    return files


HF_ROW_COL = "__hf_row__"


def _shard_row_counts(files: list[str]) -> list[int]:
    """Per-shard row counts from the IPC record-batch headers (driver-side,
    one mmap pass per shard; save_to_disk dirs are single-node artifacts so
    this stays cheap at their scale)."""
    import pyarrow as pa

    counts = []
    for f in files:
        n = 0
        with pa.memory_map(f) as source:
            reader = pa.ipc.open_stream(source)
            for batch in reader:
                n += batch.num_rows
        counts.append(n)
    return counts


def hf_row_count(path: str, split: str | None = None) -> int:
    """Total row count of a save_to_disk dir from the IPC headers (driver-
    side; no Spark job) — lets percent split slicing stay metadata-only."""
    return sum(_shard_row_counts(_shard_files(_resolve_split_dir(path, split))))


def read_hf_dataset_dir(
    spark: SparkSession,
    path: str,
    split: str | None = None,
    with_row_index: bool = True,
) -> DataFrame:
    """Distributed read of an HF ``save_to_disk`` directory.

    A hash repartition gives one task per shard, which scrambles partition
    order — so HF on-disk row order is carried EXPLICITLY: shard offsets are
    computed on the driver and each task emits ``__hf_row__`` (global 0..n-1
    position, exactly HF's row index). Split slicing and load-order index
    assignment key off that column; pass ``with_row_index=False`` to drop
    it when order is irrelevant."""
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import LongType, StructField

    split_dir = _resolve_split_dir(path, split)
    files = _shard_files(split_dir)

    with pa.memory_map(files[0]) as source:
        arrow_schema = pa.ipc.open_stream(source).schema
    base_schema = from_arrow_schema(arrow_schema)
    out_schema = base_schema.add(StructField(HF_ROW_COL, LongType()))

    counts = _shard_row_counts(files)
    offsets = []
    acc = 0
    for c in counts:
        offsets.append(acc)
        acc += c

    fdf = spark.createDataFrame(
        [(f, o) for f, o in zip(files, offsets)], "shard_path string, row_offset long"
    ).repartition(len(files), "shard_path")

    def decode(batches):
        import pandas as pd  # noqa: F401

        for pdf in batches:
            for shard, offset in zip(pdf["shard_path"], pdf["row_offset"]):
                pos = int(offset)
                with pa.memory_map(shard) as source:
                    reader = pa.ipc.open_stream(source)
                    for batch in reader:
                        out = batch.to_pandas()
                        out[HF_ROW_COL] = range(pos, pos + len(out))
                        pos += len(out)
                        yield out

    df = fdf.mapInPandas(decode, schema=out_schema)
    return df if with_row_index else df.drop(HF_ROW_COL)


def write_hf_dataset_dir(df, path: str, shards: int | None = None) -> None:
    """Small-scale compatibility writer (tests/fixtures): writes the
    ``save_to_disk`` layout — state.json + Arrow IPC stream shards."""
    import pyarrow as pa

    os.makedirs(path, exist_ok=True)
    pdf = df.toPandas() if hasattr(df, "toPandas") else df
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    n = shards or 1
    rows = len(table)
    per = (rows + n - 1) // n if rows else 1
    names = []
    for i in range(n):
        chunk = table.slice(i * per, per)
        name = f"data-{i:05d}-of-{n:05d}.arrow"
        names.append(name)
        with pa.OSFile(os.path.join(path, name), "wb") as sink:
            with pa.ipc.new_stream(sink, table.schema) as writer:
                writer.write_table(chunk)
    with open(os.path.join(path, "state.json"), "w") as f:
        json.dump(
            {
                "_data_files": [{"filename": n} for n in names],
                "_fingerprint": "synthetic",
                "_format_columns": None,
                "_format_kwargs": {},
                "_format_type": None,
                "_output_all_columns": False,
                "_split": None,
            },
            f,
        )
    with open(os.path.join(path, "dataset_info.json"), "w") as f:
        json.dump({"description": "synthetic fixture", "features": None}, f)
