"""Chat-template / training-example construction over the transcripts
table — the step that turns raw (conv_id, turn_idx, role, text) rows into
the flattened documents and (context, target) pairs an SFT pipeline
trains on. No reference analog (the reference stops at entity pairs);
these are the transcript-axis operators a web-scale LLM-data engine needs
on top of it.

All three operators share one scale shape: a narrow projection, ONE
conv-keyed exchange (conversations are the natural partitioning key —
every op here needs a conversation's turns together and nothing else),
and C-level kernels inside the bucket (Arrow ``group_by + binary_join``
via aggregate.group_join; the context builder is |ctx_turns| vectorized
shifted-concat passes, never a per-row Python join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.aggregate import group_join
from bio_re_with_entity_embeddings_ray.stages.common import (
    bucketed_group_apply,
    merge_partials,
)

_NL = "\n"


def _rendered(b: pd.DataFrame) -> pd.Series:
    """role || ': ' || text, vectorized."""
    return b["role"].astype(str) + ": " + b["text"].astype(str)


def render_conversations(transcripts, num_buckets: int = 32,
                         conv_partitioned: bool = False):
    """Flatten each conversation into ONE chat-template document:
    newline-joined ``role: text`` lines in turn order, plus the turn
    count — the conv-level document every conversation-granularity pass
    (dedup, quality, packing) runs on.

    Returns (conv_id, rendered, n_turns).

    ``conv_partitioned=True`` asserts every conversation's turns already
    sit in ONE block (the bench corpus layout) and skips the conv-keyed
    exchange entirely — per-block apply, zero shuffle (same contract as
    graph.cooccurrence_graph's conv_partitioned)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int64"),
                "rend": _rendered(batch),
            }
        )

    proj = transcripts.map_batches(prep, batch_format="pandas")

    def per_conv(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        out = group_join(b, ["conv_id"], "rend", "rendered", sep=_NL)
        n = b.groupby("conv_id", sort=False).size()
        out["n_turns"] = n.loc[out["conv_id"]].to_numpy().astype("int64")
        return out

    if conv_partitioned:
        return proj.map_batches(per_conv, batch_format="pandas",
                                batch_size=None)
    return bucketed_group_apply(proj, "conv_id", per_conv, num_buckets)


def sft_examples(transcripts, ctx_turns: int = 4, num_buckets: int = 32,
                 conv_partitioned: bool = False):
    """(context, target) SFT pairs: one example per ASSISTANT turn, the
    context being the previous ``ctx_turns`` turns rendered ``role: text``
    and newline-joined (empty string when the assistant speaks first) and
    the target the assistant's text.

    The context builder is ``ctx_turns`` vectorized shifted-concat passes
    over the conv-sorted bucket (oldest shift first, C-level string ops
    throughout) — the per-example Python join a naive implementation
    would do is exactly the hot-path anti-pattern this engine bans.

    Returns (conv_id, turn_idx, context, target). ``conv_partitioned``
    as in :func:`render_conversations` — per-block apply, zero exchange
    (context text never crosses the wire)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int64"),
                "role": batch["role"],
                "text": batch["text"],
            }
        )

    proj = transcripts.map_batches(prep, batch_format="pandas")

    def per_conv(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        rend = _rendered(b)
        conv = b["conv_id"].to_numpy()
        ctx = pd.Series(np.full(len(b), "", dtype=object))
        for k in range(ctx_turns, 0, -1):
            piece = rend.shift(k)
            same = np.zeros(len(b), dtype=bool)
            if k < len(b):
                same[k:] = conv[k:] == conv[:-k]
            piece = piece.where(same)
            has = piece.notna().to_numpy()
            empty = (ctx == "").to_numpy()
            ctx = pd.Series(
                np.where(
                    has,
                    np.where(empty, piece.fillna(""), ctx + _NL + piece.fillna("")),
                    ctx,
                ),
                dtype=object,
            )
        keep = (b["role"] == "assistant").to_numpy()
        return pd.DataFrame(
            {
                "conv_id": conv[keep],
                "turn_idx": b["turn_idx"].to_numpy()[keep],
                "context": ctx.to_numpy()[keep],
                "target": b["text"].to_numpy()[keep],
            }
        )

    if conv_partitioned:
        return proj.map_batches(per_conv, batch_format="pandas",
                                batch_size=None)
    return bucketed_group_apply(proj, "conv_id", per_conv, num_buckets)


def tool_chains(transcripts, num_buckets: int = 32,
                conv_partitioned: bool = False):
    """Per-conversation ordered tool-call chain: the ';;;'-joined sequence
    of tool names over the conversation's TOOL turns, plus the call count
    — the trace signature agent-analytics pipelines group by.

    Conversations with no tool turns are absent (the SQL-join-free
    semantics). Returns (conv_id, chain, n_calls). ``conv_partitioned``
    as in :func:`render_conversations`."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["role"] == "tool"]
        return pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].astype("int64"),
                "tool": b["tool"].astype(str),
            }
        )

    proj = transcripts.map_batches(prep, batch_format="pandas")

    def per_conv(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        out = group_join(b, ["conv_id"], "tool", "chain", sep=";;;")
        n = b.groupby("conv_id", sort=False).size()
        out["n_calls"] = n.loc[out["conv_id"]].to_numpy().astype("int64")
        return out

    if conv_partitioned:
        return proj.map_batches(per_conv, batch_format="pandas",
                                batch_size=None)
    return bucketed_group_apply(proj, "conv_id", per_conv, num_buckets)


def conv_dedup(transcripts, num_buckets: int = 32,
               conv_partitioned: bool = False):
    """Conversation-level exact dedup: flatten each conversation to its
    chat-template document (:func:`render_conversations`), then keep the
    lexicographically-smallest conv_id per distinct rendered content —
    the composition that removes verbatim-duplicate conversations before
    training. Returns the keep set (conv_id, content_md5).

    Scale shape: rendering is conv-keyed (or zero-exchange under
    ``conv_partitioned``); the dedup exchange then ships only ~40-byte
    digests (dedup.exact_dedup_hashed's min-combiner), never the rendered
    text."""
    from bio_re_with_entity_embeddings_ray.stages.dedup import exact_dedup_hashed

    rendered = render_conversations(
        transcripts, num_buckets, conv_partitioned=conv_partitioned
    )

    def as_docs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["conv_id"], "text": b["rendered"]}
        )

    keep = exact_dedup_hashed(
        rendered.map_batches(as_docs, batch_format="pandas"), num_buckets
    )
    return keep.map_batches(
        lambda b: b.rename(columns={"doc_id": "conv_id"}),
        batch_format="pandas",
    )


def tool_transitions(transcripts, num_buckets: int = 16):
    """Markov transition counts over TOOL names: how often tool B is
    called after tool A within a conversation (intervening non-tool turns
    skipped) — the agent-behavior analog of relational.role_transitions.

    Scale shape: filter to tool turns first (the projection is
    tool-turn-bounded), one conv-keyed exchange, vectorized shift +
    C-level count partials, lazy tree merge (|tools|^2-bounded)."""

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["role"] == "tool"]
        return pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].astype("int64"),
                "tool": b["tool"].astype(str),
            }
        )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "prev_tool": pd.Series([], dtype=str),
                    "tool": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        cid = b["conv_id"].to_numpy()
        tool = b["tool"].to_numpy()
        same = np.zeros(n, dtype=bool)
        same[1:] = cid[1:] == cid[:-1]
        prev = np.empty(n, dtype=object)
        prev[0] = ""
        prev[1:] = tool[:-1]
        t = pd.DataFrame({"prev_tool": prev[same], "tool": tool[same]})
        g = t.groupby(["prev_tool", "tool"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    slimmed = transcripts.map_batches(slim, batch_format="pandas")
    partials = bucketed_group_apply(slimmed, "conv_id", per_bucket,
                                    num_buckets)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["prev_tool", "tool"], as_index=False)["n"].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.sort_values(["prev_tool", "tool"]).reset_index(
            drop=True
        )
        out["n"] = out["n"].astype("int64")
        return out

    return merge_partials(
        partials, ["prev_tool", "tool"], combine, finalize, num_buckets,
        plan="tree",
    )
