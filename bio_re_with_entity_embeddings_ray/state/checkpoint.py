"""Per-partition checkpoint / lineage layer.

The reference's resume story is coarse per-stage file-existence caching
(/root/reference/prepare_entity_dataset.py:104-126, use_caching gates) and
an append-TSV crawler resume (utils/mapping_utils.py:21-27). Here resume is
per PARTITION, which is what a 10^12-turn job needs:

- the input keyspace is split into N hash partitions on a chosen key;
- each partition runs its own (fully parallel) Ray Data subpipeline and is
  committed ATOMICALLY against concurrent readers: results land in
  ``part=<i>.tmp/``, are renamed to ``part=<i>/``, then a lineage record
  is fsynced and renamed into place (rename atomicity; full power-loss
  durability additionally depends on the filesystem syncing the Parquet
  payloads, which Ray's writers own); the record
  ``_lineage/part-<i>.json`` carries rows, wall seconds, the input
  fingerprint, the engine fingerprint and the partition layout;
- a rerun skips every partition whose lineage record matches the current
  input/engine fingerprints — the job "resumes from the last committed
  partition checkpoint" (north rule).

Read-side pruning: ``make_input`` may either take no arguments (the
whole input is scanned and hash-filtered per partition — N full scans,
only acceptable for small single-file test inputs) or accept the
partition index (``make_input(part)``), in which case ONLY that
partition's input is read — one corpus pass total across all partitions.
:func:`write_partitioned_input` produces the matching ``part=<i>/``
hive layout in one pass (``write_parquet(partition_cols=...)``) and
:func:`partitioned_input_reader` returns a part-aware factory over it.
The commit/lineage protocol is identical either way; lineage records
carry ``pruned_read`` so a resume audit can see which path ran.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import hash_bucket

LINEAGE_DIR = "_lineage"


def _lineage_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, LINEAGE_DIR, f"part-{part:05d}.json")


def partition_filter(ds, key: str, part: int, num_partitions: int):
    """Keep only rows whose hash(key) lands in ``part``."""

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[key].to_numpy(), num_partitions)
        return batch[b == part]

    return ds.map_batches(keep, batch_format="pandas")


def write_partitioned_input(ds, out_dir: str, key: str, num_partitions: int):
    """ONE streaming pass that lays the input out as ``part=<i>/`` hive
    directories by hash(key) — the layout ``run_checkpointed`` prunes at
    the read (no per-partition full scans). At production scale this is
    the upstream writer's job; the helper exists so any dataset can be
    re-laid-out once and resumed cheaply forever after."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["part"] = hash_bucket(batch[key].to_numpy(), num_partitions)
        return batch

    ds.map_batches(assign, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["part"]
    )
    return out_dir


def partitioned_input_reader(in_dir: str, columns=None):
    """Part-aware input factory over a :func:`write_partitioned_input`
    layout: ``make(part)`` reads ONLY ``in_dir/part=<part>/`` (pruned,
    column-projected read)."""

    def make(part: int):
        import ray.data as rd

        pdir = os.path.join(in_dir, f"part={part}")
        if not os.path.isdir(pdir):
            # a hash partition with ZERO rows produces no part=<i>/ dir
            # (write_parquet(partition_cols=...) writes only non-empty
            # ones) — serve an empty dataset with the layout's schema from
            # any sibling partition so skewed/small inputs still commit
            siblings = sorted(
                d
                for d in os.listdir(in_dir)
                if d.startswith("part=") and os.path.isdir(os.path.join(in_dir, d))
            )
            if not siblings:
                raise FileNotFoundError(
                    f"partitioned_input_reader: no part=*/ dirs under {in_dir}"
                )
            return rd.read_parquet(
                os.path.join(in_dir, siblings[0]), columns=columns
            ).limit(0)
        return rd.read_parquet(pdir, columns=columns)

    return make


def _accepts_partition(fn: Callable) -> bool:
    import inspect

    try:
        params = inspect.signature(fn).parameters.values()
    except (TypeError, ValueError):
        return False
    return any(
        p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD) and p.default is p.empty
        for p in params
    )


def run_checkpointed(
    make_input: Callable[[], "object"],
    stage_fn: Callable[["object"], "object"],
    out_dir: str,
    key: str = "conv_id",
    num_partitions: int = 8,
    input_fingerprint: str = "",
    engine_fingerprint: str = "",
    force: bool = False,
) -> list[dict]:
    """Run ``stage_fn`` over each hash partition of the input, committing
    Parquet + lineage per partition; skip already-committed partitions
    whose fingerprint matches. Returns all lineage records (committed +
    reused). ``make_input`` taking a required positional arg is called as
    ``make_input(part)`` and must return ONLY that partition's rows
    (read-side pruning — see :func:`partitioned_input_reader`); a zero-arg
    factory falls back to scan + hash filter."""
    os.makedirs(os.path.join(out_dir, LINEAGE_DIR), exist_ok=True)
    pruned_read = _accepts_partition(make_input)
    # layout marker: a rerun under a DIFFERENT layout must not leave the
    # old layout's part dirs behind — a reader of out_dir would see every
    # row twice (old slices overlap new ones). Wipe stale parts first.
    layout_path = os.path.join(out_dir, "_layout.json")
    layout = {"key": key, "num_partitions": num_partitions}
    prev = None
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            prev = json.load(f)
    if prev != layout:
        for name in os.listdir(out_dir):
            if name.startswith("part="):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        lin_dir = os.path.join(out_dir, LINEAGE_DIR)
        for name in os.listdir(lin_dir):
            os.remove(os.path.join(lin_dir, name))
        with open(layout_path + ".tmp", "w") as f:
            json.dump(layout, f)
        os.replace(layout_path + ".tmp", layout_path)
    records: list[dict] = []
    for part in range(num_partitions):
        lp = _lineage_path(out_dir, part)
        final_dir = os.path.join(out_dir, f"part={part:05d}")
        if not force and os.path.exists(lp):
            with open(lp) as f:
                rec = json.load(f)
            if (
                rec.get("input_fingerprint") == input_fingerprint
                and rec.get("engine_fingerprint", "") == engine_fingerprint
                and rec.get("num_partitions") == num_partitions
                and rec.get("key") == key
                and os.path.isdir(final_dir)
            ):
                # partition layout must match too: a part file written
                # under a different num_partitions/key holds a different
                # slice of the keyspace; reusing it silently loses rows
                rec["reused"] = True
                records.append(rec)
                continue
        t0 = time.perf_counter()
        if pruned_read:
            part_ds = make_input(part)
        else:
            part_ds = partition_filter(make_input(), key, part, num_partitions)
        result = stage_fn(part_ds)
        tmp_dir = final_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        result.write_parquet(tmp_dir)
        # count committed rows from the written files (cheap metadata scan)
        import pyarrow.dataset as pads

        if not os.path.isdir(tmp_dir):
            # a zero-row partition result writes NO files (and no dir);
            # commit an empty dir so resume still sees the partition done
            os.makedirs(tmp_dir, exist_ok=True)
        rows = pads.dataset(tmp_dir, format="parquet").count_rows()
        # recompute of an existing partition: rename the committed dir
        # ASIDE (atomic) instead of rmtree-ing it before the replace, so a
        # concurrent reader never observes a missing partition — the dir
        # flips old -> new in two renames with no gap, then the old copy is
        # deleted
        old_dir = final_dir + ".old"
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        if os.path.isdir(final_dir):
            os.replace(final_dir, old_dir)
        os.replace(tmp_dir, final_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
        rec = {
            "partition": part,
            "key": key,
            "num_partitions": num_partitions,
            "rows": rows,
            "wall_s": round(time.perf_counter() - t0, 3),
            "input_fingerprint": input_fingerprint,
            "engine_fingerprint": engine_fingerprint,
            "pruned_read": pruned_read,
            "reused": False,
        }
        with open(lp + ".tmp", "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(lp + ".tmp", lp)
        records.append(rec)
    return records


def read_lineage(out_dir: str) -> list[dict]:
    ldir = os.path.join(out_dir, LINEAGE_DIR)
    out = []
    for name in sorted(os.listdir(ldir)) if os.path.isdir(ldir) else []:
        if name.endswith(".json"):
            with open(os.path.join(ldir, name)) as f:
                out.append(json.load(f))
    return out
