"""Command-line entry points — the engine's analog of the reference's
script surface (prepare_entity_dataset.py / prepare_pair_dataset.py /
prepare_doc2vec_input.py + learn_embeddings.py, SURVEY.md §3):

    python -m bio_re_with_entity_embeddings_ray.cli kg --sf-dir DIR --out DIR
    python -m bio_re_with_entity_embeddings_ray.cli curate --sf-dir DIR --out DIR [--neardup]
    python -m bio_re_with_entity_embeddings_ray.cli pipeline --config cfg.json

Each command reads the Parquet tables under --sf-dir, runs one composed
pipeline, writes partitioned Parquet artifacts under --out, and prints a
one-line JSON summary. Ray is initialised only if the caller has not
already done so (the driver / tests own the session)."""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def _ensure_ray():
    """Attach to the ambient cluster under ``ray job submit`` (the job
    runtime exports RAY_ADDRESS); start a local instance otherwise.
    Never re-inits when the caller (driver/tests) owns the session."""
    import os

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )


def _write(ds, path: str) -> int:
    import pyarrow.dataset as pads

    shutil.rmtree(path, ignore_errors=True)
    ds.write_parquet(path)
    return pads.dataset(path, format="parquet").count_rows()


def cmd_kg(args) -> dict:
    from bio_re_with_entity_embeddings_ray.pipelines import kg

    mentions = None
    summary: dict = {}
    if args.checkpoint_dir:
        # resumable mention extraction: the expensive scan is committed
        # per conv_id-hash partition (Parquet + lineage); a rerun skips
        # committed partitions and the aggregates read the committed
        # tables — the reference's crawl-resume story lifted to the
        # engine's partition granularity (state/checkpoint.py)
        import ray.data as rd

        from bio_re_with_entity_embeddings_ray.sources.transcripts import (
            derive_transcripts,
        )
        from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions
        from bio_re_with_entity_embeddings_ray.state import checkpoint

        records = checkpoint.run_checkpointed(
            lambda: derive_transcripts(args.sf_dir),
            lambda ds: scan_mentions(ds, include_tool=True),
            args.checkpoint_dir,
            key="conv_id",
            num_partitions=args.num_buckets,
            input_fingerprint=args.sf_dir,
        )
        import os

        part_dirs = [
            os.path.join(args.checkpoint_dir, d)
            for d in sorted(os.listdir(args.checkpoint_dir))
            if d.startswith("part=")
        ]
        # read_parquet wants files when given a list — enumerate each
        # committed partition's parquet files
        files = [
            os.path.join(pd_, f)
            for pd_ in part_dirs
            for f in sorted(os.listdir(pd_))
            if f.endswith(".parquet")
        ]
        mentions = rd.read_parquet(files)
        summary["reused_partitions"] = sum(1 for r in records if r["reused"])
        summary["computed_partitions"] = sum(1 for r in records if not r["reused"])
    summary.update(
        kg.full_pipeline(
            args.sf_dir,
            args.out,
            num_buckets=args.num_buckets,
            embedding_dim=args.dim,
            mentions=mentions,
        )
    )
    return summary


def cmd_curate(args) -> dict:
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.pipelines import curate

    docs = rd.read_parquet(
        f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    fn = curate.curate_neardup if args.neardup else curate.curate
    curated = fn(docs, num_buckets=args.num_buckets)
    n = _write(curated, f"{args.out}/curated")
    budget = curate.token_budget(
        rd.read_parquet(f"{args.out}/curated")
    ).to_pandas()
    return {
        "curated_rows": n,
        "n_docs": int(budget["n_docs"][0]),
        "total_tokens": int(budget["total_tokens"][0]),
        "mode": "neardup" if args.neardup else "exact",
    }


def cmd_pipeline(args) -> dict:
    from bio_re_with_entity_embeddings_ray.pipelines import compose

    with open(args.config) as f:
        cfg = json.load(f)
    ds = compose.run_config(cfg)
    if args.out:
        return {"rows": _write(ds, args.out)}
    return {"rows": ds.count()}


def cmd_graph(args) -> dict:
    """Graph-analytics pass over the KG: co-occurrence edges -> PageRank
    + per-node triangle counts + a walk corpus, written as Parquet."""
    from bio_re_with_entity_embeddings_ray.sources.transcripts import (
        derive_transcripts,
    )
    from bio_re_with_entity_embeddings_ray.stages import graph
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions

    m = scan_mentions(derive_transcripts(args.sf_dir), include_tool=True)
    edges = graph.cooccurrence_graph(m, num_buckets=args.num_buckets).materialize()
    n_edges = _write(edges, f"{args.out}/edges")
    pr = graph.pagerank(edges, iters=args.iters, num_buckets=args.num_buckets)
    pr.to_parquet(f"{args.out}/pagerank.parquet")
    tri = graph.triangle_counts(edges, num_buckets=args.num_buckets)
    n_tri = _write(tri, f"{args.out}/triangles")
    walks = graph.deterministic_walks(
        edges, length=args.walk_length, num_buckets=args.num_buckets
    )
    n_walks = _write(walks, f"{args.out}/walks")
    return {
        "edges": n_edges,
        "nodes": len(pr),
        "triangle_nodes": n_tri,
        "walks": n_walks,
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bio_re_with_entity_embeddings_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="full KG pipeline -> Parquet artifacts")
    kg.add_argument("--sf-dir", required=True)
    kg.add_argument("--out", required=True)
    kg.add_argument("--num-buckets", type=int, default=16)
    kg.add_argument("--dim", type=int, default=32)
    kg.add_argument(
        "--checkpoint-dir",
        default=None,
        help="commit mention extraction per partition here; reruns resume",
    )
    kg.set_defaults(fn=cmd_kg)

    cur = sub.add_parser("curate", help="corpus curation -> curated Parquet")
    cur.add_argument("--sf-dir", required=True)
    cur.add_argument("--out", required=True)
    cur.add_argument("--num-buckets", type=int, default=16)
    cur.add_argument("--neardup", action="store_true")
    cur.set_defaults(fn=cmd_curate)

    gr = sub.add_parser("graph", help="graph analytics over the KG edges")
    gr.add_argument("--sf-dir", required=True)
    gr.add_argument("--out", required=True)
    gr.add_argument("--num-buckets", type=int, default=16)
    gr.add_argument("--iters", type=int, default=2)
    gr.add_argument("--walk-length", type=int, default=3)
    gr.set_defaults(fn=cmd_graph)

    pipe = sub.add_parser("pipeline", help="run a declarative step-config pipeline")
    pipe.add_argument("--config", required=True)
    pipe.add_argument("--out", default=None)
    pipe.set_defaults(fn=cmd_pipeline)
    return p


def main(argv: list[str] | None = None) -> int:
    from bio_re_with_entity_embeddings_ray import quiet_ray_data

    args = build_parser().parse_args(argv)
    _ensure_ray()
    quiet_ray_data()
    print(json.dumps(args.fn(args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
