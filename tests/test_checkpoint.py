"""Kill-and-resume over the per-partition lineage layer (BASELINE.md
resumability criterion)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from bio_re_with_entity_embeddings_ray.stages import aggregate
from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions
from bio_re_with_entity_embeddings_ray.state import checkpoint


def _make_input(fixture_dir):
    import ray.data as rd

    def factory():
        return rd.read_parquet(f"{fixture_dir}/transcripts.parquet")

    return factory


def _stage(ds):
    # conv-keyed aggregate: partition key (conv_id) makes each partition's
    # output complete for its keys, so the per-partition union equals one
    # global run — the property a checkpointable stage must have
    m = scan_mentions(ds, include_tool=True, concurrency=2)
    return aggregate.conv2entity(m, num_buckets=4)


class Boom(RuntimeError):
    pass


def test_resume_skips_committed_partitions(fixture_dir, tmp_path):
    out = str(tmp_path / "ckpt")
    factory = _make_input(fixture_dir)

    calls = {"n": 0}

    def failing_stage(ds):
        calls["n"] += 1
        if calls["n"] == 3:  # die while processing the third partition
            raise Boom("simulated worker loss")
        return _stage(ds)

    with pytest.raises(Boom):
        checkpoint.run_checkpointed(
            factory, failing_stage, out, num_partitions=4, input_fingerprint="fp1"
        )
    committed = checkpoint.read_lineage(out)
    assert len(committed) == 2  # two partitions committed before the crash

    # resume: completes the remaining partitions without re-running done ones
    calls2 = {"n": 0}

    def counting_stage(ds):
        calls2["n"] += 1
        return _stage(ds)

    records = checkpoint.run_checkpointed(
        factory, counting_stage, out, num_partitions=4, input_fingerprint="fp1"
    )
    assert calls2["n"] == 2  # only the two uncommitted partitions ran
    assert [r["reused"] for r in records] == [True, True, False, False]
    assert all(r["input_fingerprint"] == "fp1" for r in records)
    assert {r["partition"] for r in records} == {0, 1, 2, 3}

    # committed output equals a clean one-shot run
    files = [
        f"{out}/part={p:05d}/{name}"
        for p in range(4)
        for name in os.listdir(f"{out}/part={p:05d}")
    ]
    ds = pads.dataset(files, format="parquet").to_table()
    clean = _stage(factory()).to_pandas()
    got = ds.to_pandas().sort_values("conv_id").reset_index(drop=True)
    clean = clean.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, clean)

    # changed input fingerprint invalidates the cache
    records2 = checkpoint.run_checkpointed(
        factory, counting_stage, out, num_partitions=4, input_fingerprint="fp2"
    )
    assert all(not r["reused"] for r in records2)


def test_lineage_records_have_metrics(fixture_dir, tmp_path):
    out = str(tmp_path / "ckpt2")
    checkpoint.run_checkpointed(
        _make_input(fixture_dir), _stage, out, num_partitions=2, input_fingerprint="x"
    )
    recs = checkpoint.read_lineage(out)
    assert len(recs) == 2
    for r in recs:
        assert r["rows"] > 0 and r["wall_s"] >= 0
        assert os.path.isdir(f"{out}/part={r['partition']:05d}")
        with open(f"{out}/_lineage/part-{r['partition']:05d}.json") as f:
            assert json.load(f)["rows"] == r["rows"]

def test_changed_partition_layout_invalidates_reuse(fixture_dir, tmp_path):
    """A re-run with a different num_partitions (or key) must NOT reuse
    part files written under the old layout — each old part holds a
    different keyspace slice, and reusing them silently drops rows."""
    out = str(tmp_path / "ckpt_layout")
    factory = _make_input(fixture_dir)

    first = checkpoint.run_checkpointed(
        factory, _stage, out, num_partitions=4, input_fingerprint="fp1"
    )
    assert all(not r["reused"] for r in first)
    total4 = sum(r["rows"] for r in first)

    again = checkpoint.run_checkpointed(
        factory, _stage, out, num_partitions=2, input_fingerprint="fp1"
    )
    # same fingerprint, different layout: everything recomputed, nothing reused
    assert all(not r["reused"] for r in again)
    assert sum(r["rows"] for r in again) == total4

    # and the matching layout IS reused on the next run
    third = checkpoint.run_checkpointed(
        factory, _stage, out, num_partitions=2, input_fingerprint="fp1"
    )
    assert all(r["reused"] for r in third)


def test_partitioned_layout_prunes_reads(fixture_dir, tmp_path):
    """Read-side pruning: total input rows read across all partitions ==
    corpus rows (one pass), not corpus x N; output equals the filter-based
    path; kill-resume works with the pruned reader."""
    import ray.data as rd

    src = rd.read_parquet(f"{fixture_dir}/transcripts.parquet")
    n_src = src.count()
    in_dir = str(tmp_path / "part_in")
    checkpoint.write_partitioned_input(src, in_dir, key="conv_id", num_partitions=4)
    reader = checkpoint.partitioned_input_reader(in_dir)

    # pruned reads: each partition dir holds a disjoint slice, summing to
    # exactly one corpus (the no-N-full-scans property)
    per_part = [reader(p).count() for p in range(4)]
    assert sum(per_part) == n_src
    assert all(n > 0 for n in per_part)

    # crash mid-run, then resume over the pruned reader
    calls = {"n": 0}

    def failing_stage(ds):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom("simulated loss")
        return _stage(ds)

    out = str(tmp_path / "ckpt_pruned")
    with pytest.raises(Boom):
        checkpoint.run_checkpointed(
            reader, failing_stage, out, num_partitions=4, input_fingerprint="fp"
        )
    records = checkpoint.run_checkpointed(
        reader, _stage, out, num_partitions=4, input_fingerprint="fp"
    )
    assert [r["reused"] for r in records] == [True, False, False, False]
    assert all(r["pruned_read"] for r in records)

    files = [
        f"{out}/part={p:05d}/{name}"
        for p in range(4)
        for name in os.listdir(f"{out}/part={p:05d}")
    ]
    got = (
        pads.dataset(files, format="parquet")
        .to_table()
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    clean = _stage(src).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, clean)


def test_empty_hash_partition_commits(tmp_path):
    """A partitioned layout where some hash partitions hold zero rows (all
    keys collide into a few buckets) must still run end to end: absent
    part=<i>/ dirs read as empty datasets with the layout's schema."""
    import ray.data as rd

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # one distinct key -> exactly one non-empty partition out of 4
    df = pd.DataFrame({"conv_id": ["c0"] * 8, "text": [f"t{i}" for i in range(8)]})
    checkpoint.write_partitioned_input(rd.from_pandas(df), src, "conv_id", 4)
    reader = checkpoint.partitioned_input_reader(src, columns=["conv_id", "text"])

    def stage(ds):
        return ds

    recs = checkpoint.run_checkpointed(
        reader, stage, out, key="conv_id", num_partitions=4,
        input_fingerprint="skew", engine_fingerprint="v1",
    )
    assert len(recs) == 4
    assert sum(r["rows"] for r in recs) == 8
    assert sorted(r["rows"] for r in recs) == [0, 0, 0, 8]
