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
    """documents(doc_id, text) -> transcripts rows. Pure, deterministic."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    conv_id: list[str] = []
    turn_idx: list[int] = []
    role: list[str] = []
    text_out: list[str] = []
    tool: list[str | None] = []
    ts: list[int] = []
    for did, txt in zip(doc_ids, texts):
        toks = txt.split(" ")
        cid = str(did)
        for t in range(0, (len(toks) + TURN_WORDS - 1) // TURN_WORDS):
            chunk = toks[t * TURN_WORDS : (t + 1) * TURN_WORDS]
            r = _role_of(t)
            conv_id.append(cid)
            turn_idx.append(t)
            role.append(r)
            text_out.append(" ".join(chunk))
            tool.append(chunk[0] if r == "tool" else None)
            ts.append((did * _TS_BASE_STRIDE + t) * 1_000_000)
    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text_out, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
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
