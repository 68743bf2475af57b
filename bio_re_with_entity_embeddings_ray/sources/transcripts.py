"""Transcript sources.

Three ways to obtain the engine's primary input table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json input_hint):

1. :func:`read_transcripts` — read an existing partitioned Parquet table.
2. :func:`derive_transcripts` — deterministically derive transcripts from
   the driver's synthetic ``documents`` table (each document becomes one
   conversation; its tokens are chunked into 8-word turns). The rule is
   intentionally simple enough that the DuckDB oracle reproduces it
   exactly (:func:`transcripts_sql_cte`), which is what makes the whole
   KG pipeline value-hash-checkable.
3. :func:`generate_synthetic` — seeded generator with pathological
   annotation forms, skewed hot entities, and corrupt spans (FIXTURES.md),
   used by pytest + bench.

Reference analog: the PubTator offset corpus reader
(/root/reference/data/pubtator.py:336-355) which materializes the whole
70 GB corpus in driver RAM — here reads stream as Arrow blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TURN_WORDS = 8
_TS_BASE_STRIDE = 10_000  # seconds between conversations; 1s between turns


def _role_of(turn_idx: int) -> str:
    if turn_idx % 4 == 3:
        return "tool"
    return "user" if turn_idx % 2 == 0 else "assistant"


def derive_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> transcripts rows. Pure, deterministic.

    Vectorized: a turn's text is a character-range slice of the (single-
    space-separated) document text, so all boundaries are numpy cumsums
    over token lengths — the only per-row Python is the final substring
    slice per TURN (not per token)."""
    import pyarrow.compute as pc

    batch = batch.replace_schema_metadata(None)
    if batch.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "tool": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    doc_ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    tok = pc.split_pattern(batch["text"], " ")
    la = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
    offs = la.offsets.to_numpy().astype(np.int64)  # ndocs+1 token offsets
    lens = pc.utf8_length(la.values).to_numpy().astype(np.int64)
    ndocs = len(doc_ids)
    ntok = int(offs[-1])
    n_per_doc = np.diff(offs)
    doc_idx = np.repeat(np.arange(ndocs), n_per_doc)
    pos = np.arange(ntok, dtype=np.int64) - offs[:-1][doc_idx]

    # char offset of each token within its doc
    cs = np.zeros(ntok + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=cs[1:])
    tok_start = cs[:-1] - cs[offs[:-1]][doc_idx]
    tok_end = tok_start + lens

    first = np.flatnonzero(pos % TURN_WORDS == 0)  # first token of each turn
    last = np.append(first[1:] - 1, ntok - 1)
    t_doc = doc_idx[first]
    t_idx = (pos[first] // TURN_WORDS).astype(np.int32)
    t_start = tok_start[first]
    t_end = tok_end[last]
    text_out = [texts[d][s:e] for d, s, e in zip(t_doc, t_start, t_end)]

    mod4 = t_idx % 4
    roles = np.where(mod4 == 3, "tool", np.where(t_idx % 2 == 0, "user", "assistant"))
    first_len = lens[first]
    tool_out: list[str | None] = [None] * len(t_idx)
    for j in np.flatnonzero(mod4 == 3):
        tool_out[j] = texts[t_doc[j]][t_start[j] : t_start[j] + first_len[j]]
    ts_us = (doc_ids[t_doc] * _TS_BASE_STRIDE + t_idx) * 1_000_000

    return pa.table(
        {
            "conv_id": pc.cast(pa.array(doc_ids[t_doc]), pa.string()),
            "turn_idx": pa.array(t_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(text_out, pa.string()),
            "tool": pa.array(tool_out, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )


def derive_transcripts(sf_dir: str):
    """Ray Dataset of transcripts derived from ``{sf_dir}/documents.parquet``.

    Column-pruned read (only doc_id, text leave storage); the derivation is
    a stateless ``map_batches`` flat transform.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(derive_batch, batch_format="pyarrow")


def transcripts_sql_cte(name: str = "transcripts_v") -> str:
    """DuckDB CTE body reproducing :func:`derive_batch` from the
    pre-registered ``documents`` view. Splice into a WITH clause."""
    return f"""
__p AS (
  SELECT CAST(doc_id AS VARCHAR) AS conv_id, doc_id,
         string_split(text, ' ') AS parts
  FROM documents
),
__tok AS (
  SELECT conv_id, doc_id,
         unnest(parts) AS w,
         unnest(range(1, 1 + len(parts))) AS i
  FROM __p
),
{name} AS (
  SELECT conv_id,
         CAST((i - 1) // {TURN_WORDS} AS INT) AS turn_idx,
         CASE WHEN ((i - 1) // {TURN_WORDS}) % 4 = 3 THEN 'tool'
              WHEN ((i - 1) // {TURN_WORDS}) % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         string_agg(w, ' ' ORDER BY i) AS text,
         CASE WHEN ((i - 1) // {TURN_WORDS}) % 4 = 3 THEN arg_min(w, i)
              ELSE NULL END AS tool,
         make_timestamp((doc_id * {_TS_BASE_STRIDE} + (i - 1) // {TURN_WORDS}) * 1000000) AS ts
  FROM __tok
  GROUP BY conv_id, doc_id, (i - 1) // {TURN_WORDS}
)"""


def read_transcripts(path: str):
    """Read an existing transcripts Parquet table (file or directory)."""
    import ray.data as rd

    return rd.read_parquet(path)
