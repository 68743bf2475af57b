"""Stage 2 — conversation reassembly.

Reference analog: ``parse_raw_documents`` + ``Document.text()``
(/root/reference/data/pubtator.py:289-316, :25-30): title ⊕ " " ⊕ abstract.
Here: turns concatenated with a single space in stable ``turn_idx`` order.

Per-row invariant (BASELINE.json): turn text is NEVER altered — the
separator is only inserted between turns in the derived conversation text,
so ``conversation.split-by-turn == original turns`` byte-for-byte. (The
reference strips tabs only because of its TSV sink, data/pubtator.py:27-29;
our Parquet sink needs no such mangling.)
"""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

SEP = " "


def _reassemble(bucket: pd.DataFrame) -> pd.DataFrame:
    b = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = b.groupby("conv_id", sort=False)["text"]
    out = g.agg(SEP.join).reset_index()
    out["n_turns"] = g.size().to_numpy().astype("int32")
    return out


def conversations(transcripts, num_buckets: int = 64):
    """transcripts -> (conv_id, text, n_turns); one hash shuffle on conv_id."""
    turns = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    return bucketed_group_apply(turns, "conv_id", _reassemble, num_buckets)
