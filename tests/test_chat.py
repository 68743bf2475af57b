"""Chat-template / SFT-example construction (stages/chat.py) —
brute-force checks over a hand-built conversation table."""

import numpy as np
import pandas as pd
import pytest


def _transcripts():
    rows = []
    for conv, n in [("a", 6), ("b", 2), ("c", 1)]:
        for i in range(n):
            role = "tool" if i % 4 == 3 else ("user" if i % 2 == 0 else
                                              "assistant")
            rows.append(
                (conv, i, role, f"text-{conv}-{i}",
                 "srch" if role == "tool" else None,
                 pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i))
            )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def test_render_conversations(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.chat import render_conversations

    t = _transcripts().sample(frac=1, random_state=7)  # shuffled input
    out = (
        render_conversations(rd.from_pandas(t).repartition(3), 4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out["n_turns"].tolist() == [6, 2, 1]
    a = out[out["conv_id"] == "a"]["rendered"].iloc[0]
    lines = a.split("\n")
    assert lines[0] == "user: text-a-0"
    assert lines[3] == "tool: text-a-3"
    assert len(lines) == 6


def test_sft_examples_context_window(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.chat import sft_examples

    t = _transcripts().sample(frac=1, random_state=3)
    out = (
        sft_examples(rd.from_pandas(t).repartition(3), ctx_turns=2,
                     num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # assistant turns: a1, a5, b1 (i%4==3 is tool; assistant = odd, not 3)
    assert list(zip(out["conv_id"], out["turn_idx"])) == [
        ("a", 1), ("a", 5), ("b", 1)
    ]
    # a1: one prior turn only
    assert out["context"][0] == "user: text-a-0"
    # a5: exactly the previous 2 turns (3=tool, 4=user)
    assert out["context"][1] == "tool: text-a-3\nuser: text-a-4"
    assert out["target"][1] == "text-a-5"


def test_sft_examples_empty_context_when_first(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.chat import sft_examples

    t = pd.DataFrame(
        {
            "conv_id": ["z"],
            "turn_idx": [0],
            "role": ["assistant"],
            "text": ["hi"],
            "tool": [None],
            "ts": [pd.Timestamp("2025-01-01")],
        }
    )
    import ray.data as rd

    out = sft_examples(rd.from_pandas(t), ctx_turns=4,
                       num_buckets=2).to_pandas()
    assert out["context"].tolist() == [""]
    assert out["target"].tolist() == ["hi"]


def test_tool_chains(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.chat import tool_chains

    t = _transcripts()
    # add a second tool turn to conv a at idx 7 (i%4==3)
    t = pd.concat(
        [
            t,
            pd.DataFrame(
                {
                    "conv_id": ["a"],
                    "turn_idx": [7],
                    "role": ["tool"],
                    "text": ["text-a-7"],
                    "tool": ["calc"],
                    "ts": [pd.Timestamp("2025-01-01")],
                }
            ),
        ],
        ignore_index=True,
    ).sample(frac=1, random_state=11)
    out = (
        tool_chains(rd.from_pandas(t).repartition(3), 4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # convs b, c have no tool turns -> absent
    assert out["conv_id"].tolist() == ["a"]
    assert out["chain"].tolist() == ["srch;;;calc"]
    assert out["n_calls"].tolist() == [2]


def test_chat_conv_partitioned_equivalence(ray_session):
    """conv_partitioned=True (zero-exchange per-block apply) must equal
    the generic conv-keyed shuffle when convs are block-contiguous."""
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import chat

    t = _transcripts()  # conv-sorted -> contiguous in the single block
    ds = rd.from_pandas(t)
    for fn, kw, sort_cols in [
        (chat.render_conversations, {}, ["conv_id"]),
        (chat.sft_examples, {"ctx_turns": 3}, ["conv_id", "turn_idx"]),
        (chat.tool_chains, {}, ["conv_id"]),
    ]:
        a = (
            fn(ds, num_buckets=4, **kw)
            .to_pandas()
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        b = (
            fn(ds, conv_partitioned=True, **kw)
            .to_pandas()
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


def test_conv_dedup_keeps_min_conv(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.chat import conv_dedup

    t = _transcripts()
    # clone conv "b" as conv "x" (identical turns -> identical rendered)
    dup = t[t["conv_id"] == "b"].copy()
    dup["conv_id"] = "x"
    t2 = pd.concat([t, dup], ignore_index=True).sample(frac=1,
                                                       random_state=5)
    out = conv_dedup(rd.from_pandas(t2).repartition(3), 4).to_pandas()
    # 3 distinct contents survive; "x" lost to "b" (lexicographic min)
    assert sorted(out["conv_id"]) == ["a", "b", "c"]
    assert out["content_md5"].nunique() == 3


def test_tool_transitions_counts(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.chat import tool_transitions

    rows = []
    for conv, tools in [("a", ["s", "t", "s"]), ("b", ["t", "s"])]:
        for i, tl in enumerate(tools):
            rows.append((conv, i * 4 + 3, "tool", "x", tl,
                         pd.Timestamp("2025-01-01")))
        rows.append((conv, 0, "user", "q", None, pd.Timestamp("2025-01-01")))
    t = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                    "tool", "ts"])
    out = (
        tool_transitions(rd.from_pandas(t).repartition(3), 4)
        .to_pandas()
        .sort_values(["prev_tool", "tool"])
        .reset_index(drop=True)
    )
    # a: s->t, t->s ; b: t->s  => (s,t):1, (t,s):2
    assert list(zip(out["prev_tool"], out["tool"], out["n"])) == [
        ("s", "t", 1), ("t", "s", 2)
    ]
