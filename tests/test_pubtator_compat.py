"""PubTator offset-format compat reader: whole-file and byte-range-sharded
parses must agree, and annotations must flow through span verification
(the reference's extraction semantics)."""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.sources import pubtator_compat as pt

FIXTURE = """\
101|t|Sort and merge basics
101|a|A join over a table needs a key
101\t0\t4\tSort\top\tOP:SORT
101\t9\t14\tmerge\top\tOP:MERGE
101\t36\t41\ttable\tres\tRES:TABLE
101\t99\t104\tbogus\tres\tRES:ROW

102|t|Filter the batch
102|a|Scan each row of the column
102\t0\t6\tFilter\top\tOP:FILTER
102\t11\t16\tbatch\tres\tRES:BATCH
102\t17\t21\trow\top\tOP:SCAN

103|t|No annotations here
103|a|Just text
"""


def _write(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text(FIXTURE)
    return str(p)


def test_whole_file_parse(tmp_path):
    path = _write(tmp_path)
    docs = pt.read_pubtator(path).to_pandas().sort_values("doc_id")
    assert list(docs["doc_id"]) == ["101", "102", "103"]
    assert docs.iloc[0]["text"] == "Sort and merge basics A join over a table needs a key"
    anns = pt.read_pubtator(path, annotations=True).to_pandas()
    assert len(anns) == 7
    assert set(anns["doc_id"]) == {"101", "102"}


def test_sharded_parse_matches_whole_file(tmp_path):
    path = _write(tmp_path)
    whole = pt.read_pubtator(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # tiny shard size forces multiple ranges through boundary scanning
    offs = pt.shard_offsets(path, 80)
    assert len(offs) >= 3
    assert offs[0][0] == 0 and offs[-1][1] == len(FIXTURE.encode())
    sharded = (
        pt.read_pubtator_sharded(path, shard_bytes=80)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, sharded)
    a_whole = pt.read_pubtator(path, annotations=True).to_pandas()
    a_shard = pt.read_pubtator_sharded(path, shard_bytes=80, annotations=True).to_pandas()
    assert len(a_whole) == len(a_shard) == 7


def test_annotations_flow_through_span_verification(tmp_path):
    """End-to-end reference semantics: parse -> join on doc text ->
    span-verify (drop out-of-range/mismatched) -> normalized mentions."""
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.mentions import verify_annotations

    path = _write(tmp_path)
    docs = pt.read_pubtator(path)
    anns = pt.read_pubtator(path, annotations=True)

    # adapt to the transcript-shaped verifier: doc == single-turn conv
    def to_turns(batch):
        batch = batch.rename(columns={"doc_id": "conv_id"})
        batch["turn_idx"] = 0
        return batch[["conv_id", "turn_idx", "text"]]

    def to_ann(batch):
        batch = batch.rename(columns={"doc_id": "conv_id"})
        batch["turn_idx"] = 0
        return batch

    turns = docs.map_batches(to_turns, batch_format="pandas")
    ann_rows = anns.map_batches(to_ann, batch_format="pandas")
    out = verify_annotations(ann_rows, turns, num_partitions=4).to_pandas()
    # the bogus out-of-range annotation (101: 99..104) must be dropped;
    # mention 'row' at 102:17..21 mismatches the actual span 'Scan' -> dropped
    got = sorted(zip(out["conv_id"], out["entity_id"]))
    assert ("101", "RES:ROW") not in got
    assert ("102", "OP:SCAN") not in got
    assert ("101", "OP:SORT") in got and ("101", "OP:MERGE") in got
    assert ("101", "RES:TABLE") in got
    assert ("102", "OP:FILTER") in got and ("102", "RES:BATCH") in got
