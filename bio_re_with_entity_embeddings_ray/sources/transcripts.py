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

    Fully Arrow-native (round-4 memcpy push: this is the single hottest
    full-corpus stage, and the round-3 version materialized every doc AND
    every turn as a Python string): turns exactly TILE the token stream
    produced by ``split_pattern``, so a turn's text is
    ``binary_join`` over a re-offsetted ``LargeListArray`` view of the
    same token values buffer — zero Python string objects, zero
    per-token copies. Matches the oracle's ``string_agg(w, ' ')``
    literally (the engine contract is single-space-separated document
    text, same as the round-3 char-slice arithmetic assumed)."""
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
    tok = pc.split_pattern(batch["text"], " ")
    la = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
    offs = la.offsets.to_numpy().astype(np.int64)  # ndocs+1 token offsets
    ndocs = len(doc_ids)
    ntok = int(offs[-1])
    n_per_doc = np.diff(offs)
    doc_idx = np.repeat(np.arange(ndocs), n_per_doc)
    pos = np.arange(ntok, dtype=np.int64) - offs[:-1][doc_idx]

    first = np.flatnonzero(pos % TURN_WORDS == 0)  # first token of each turn
    t_doc = doc_idx[first]
    t_idx = (pos[first] // TURN_WORDS).astype(np.int32)

    # turn boundaries tile [0, ntok): a LargeListArray view over the SAME
    # token values buffer, then one C-level join per turn
    turn_offs = pa.array(np.append(first, ntok), pa.int64())
    turns = pa.LargeListArray.from_arrays(turn_offs, la.values)
    text_arr = pc.binary_join(turns, " ")

    mod4 = t_idx % 4
    # turn_idx%4 -> role; %4==3 is tool, else even=user / odd=assistant
    roles = pa.array(["user", "assistant", "user", "tool"], pa.string()).take(
        pa.array(mod4.astype(np.int64))
    )
    first_tok = la.values.take(pa.array(first))
    tool_arr = pc.if_else(
        pa.array(mod4 == 3), first_tok, pa.nulls(len(first), pa.string())
    )
    ts_us = (doc_ids[t_doc] * _TS_BASE_STRIDE + t_idx) * 1_000_000

    return pa.table(
        {
            "conv_id": pc.cast(pa.array(doc_ids[t_doc]), pa.string()),
            "turn_idx": pa.array(t_idx, pa.int32()),
            "role": roles,
            "text": text_arr,
            "tool": tool_arr,
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
