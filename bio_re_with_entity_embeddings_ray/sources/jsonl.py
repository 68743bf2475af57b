"""JSONL source/sink — the dominant interchange format for crawl /
training-data corpora (one JSON object per line). Reads are file-parallel
(Arrow JSON parser); writes shard one file per block like the Parquet and
TSV sinks. Parquet remains the preferred engine format (typed, columnar,
prunable) — this is the ingestion/egress compatibility surface for
pipelines whose upstream emits JSONL."""

from __future__ import annotations


def read_jsonl(path: str, columns: list[str] | None = None):
    """Read JSONL file(s)/directory into a Dataset. ``columns`` projects
    after parse (row-oriented format — no read-side column pruning;
    convert hot inputs to Parquet once)."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds, path: str):
    """Write a Dataset as sharded JSONL files under ``path``."""
    ds.write_json(path)
    return path
