"""TSV source/sink — the reference's native interchange format
(pd.read_csv/to_csv TSVs throughout: prepare_entity_dataset.py:62/74,
prepare_pair_dataset.py:58-68, learn_embeddings.py:25). A reference user's
existing TSV artifacts read straight into Dataset pipelines and results
can be written back as sharded TSV.

Arrow's CSV reader/writer handles quoting (tabs/newlines/quotes inside
fields) and reads are file-parallel like every other source; Parquet
remains the engine's preferred format (typed, columnar, prunable) — this
is the compatibility surface."""

from __future__ import annotations


def read_tsv(path: str, columns: list[str] | None = None):
    """Read a TSV file/directory into a Dataset (header row expected).
    ``columns`` projects after parse — CSV is row-oriented, so unlike
    Parquet the read itself cannot prune columns; convert hot inputs to
    Parquet once for pruned reads."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    ds = rd.read_csv(path, parse_options=pacsv.ParseOptions(delimiter="\t"))
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_tsv(ds, path: str):
    """Write a Dataset as sharded TSV files under ``path`` (one file per
    block — resumable/parallel like the Parquet sinks; the options are
    built worker-side because pyarrow WriteOptions does not pickle)."""
    import pyarrow.csv as pacsv

    ds.write_csv(
        path,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(delimiter="\t")
        },
    )
    return path
