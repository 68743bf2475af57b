"""Benchmark harness.

Runs the headline KG-construction pipeline (and three secondary pipelines)
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line. ``--scaling`` re-runs the headline in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus scaling efficiency (the sandbox evidence for the north rule's
N vs 4N cluster criterion).

The corpus is deterministically replicated ``GRAFT_BENCH_REPLICAS`` times
(doc_id offsets) so the bench input is meaningfully larger than the
testdata files while staying derived from them.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sharded(sf_dir: str, replicas: int, emit):
    """Shard the replicated corpus as (replica, chunk) WORK ITEMS over a
    broadcast documents table.

    The testdata documents file is one parquet row group, so a plain read
    yields ~5 blocks and caps the whole fused streaming plan's parallelism
    at 5 (a mid-stream repartition is fused away by the optimizer and does
    NOT help — measured 40s fused vs 2s staged). Broadcasting the small
    table once via ray.put and fanning out one task per (replica, chunk)
    gives clean elastic parallelism. Production inputs are many-file
    partitioned Parquet and never need this.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).replace_schema_metadata(None)
    max_id = pc.max(tbl["doc_id"]).as_py()
    if max_id >= 10_000_000:
        raise ValueError(
            f"replica doc_id stride (10M) would collide: corpus max doc_id {max_id}"
        )
    ref = ray.put(tbl)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    chunks = max(1, (4 * ncpu + replicas - 1) // replicas)
    csize = (tbl.num_rows + chunks - 1) // chunks
    total = replicas * chunks

    def build(batch) -> pa.Table:
        t = ray.get(ref)
        outs = []
        for i in batch["id"]:
            r, c = divmod(int(i), chunks)
            sl = t.slice(c * csize, csize)
            sl = sl.set_column(0, "doc_id", pc.add(sl["doc_id"], r * 10_000_000))
            outs.append(emit(sl))
        return pa.concat_tables(outs)

    return rd.range(total, override_num_blocks=total).map_batches(
        build, batch_format="numpy", batch_size=1
    )


def _corpus_dir(sf_dir: str, replicas: int) -> str:
    """Materialize the replicated corpus ONCE as many-file partitioned
    Parquet under /tmp (cached across bench processes), so the measured
    pipeline reads the production input shape — `read_parquet` over many
    files with native per-file parallelism — rather than the broadcast
    workaround. The build itself uses `_sharded` (the testdata file is a
    single row group; see its docstring)."""
    import os

    name = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/bench_corpus/{name}_r{replicas}"
    marker = f"{out}/_SUCCESS"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        _sharded(sf_dir, replicas, lambda t: t).write_parquet(out)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _corpus(sf_dir: str, replicas: int):
    import ray.data as rd

    if os.environ.get("GRAFT_BENCH_INPUT", "files") == "broadcast":
        return _sharded(sf_dir, replicas, lambda t: t)
    # one read task per corpus file: Ray's default bundling packed the
    # 1280-file corpus into ~200 uneven tasks whose 5x wall skew left
    # straggler waves at 32 cpus (interleaved quiet-probe sweep: default
    # 21.5-28.3 s vs 16.7-18.8 s at file granularity)
    return rd.read_parquet(
        _corpus_dir(sf_dir, replicas),
        columns=["doc_id", "text"],
        override_num_blocks=replicas,
    )


def _transcripts(sf_dir: str, replicas: int):
    from bio_re_with_entity_embeddings_ray.sources.transcripts import derive_batch

    if os.environ.get("GRAFT_BENCH_INPUT", "files") == "broadcast":
        return _sharded(sf_dir, replicas, derive_batch)
    # whole-file batches keep each conversation contiguous in one block
    return _corpus(sf_dir, replicas).map_batches(
        derive_batch, batch_format="pyarrow", batch_size=None
    )


def bench_kg(sf_dir: str, replicas: int, num_buckets: int) -> dict:
    """Headline: transcripts -> mentions -> nodes + triples, single pass.

    The two wide consumers (entity2conv nodes, pair aggregation) run as
    ONE fused per-block pass (kg.nodes_and_triples_bucketed): the scan's
    own tasks project + per-block-DISTINCT the mention keys and pack both
    provenance kinds, so the only materialized boundary is the tagged
    provenance (one packed row per (pair|entity, block) — ~1000x fewer
    rows than the mention stream the round-2 design parked in the object
    store). The count merges + provenance views are cheap projections of
    that boundary and run CONCURRENTLY so their fixed barriers overlap.

    The bench fixture makes EVERY pair/entity a hot key (each co-occurs
    with a large fraction of all conversations), so the headline uses the
    bucketed-provenance scale path (SURVEY.md §7.3): provenance stays one
    disjoint bucket per input block — never funneled through a single
    task — and edge/node support is an exact payload-free integer sum.

    assume_unsplit_blocks: each (replica, chunk) work item emits one
    ~15 MB mention block, far below target_max_block_size (128 MB), so
    Ray never splits a conversation across blocks here; the contract is
    BLOCK MEMBERSHIP, not row order (map stages are one-block-in/
    one-block-out — nothing downstream relies on intra-block row order).
    The boundary-exact default path costs two extra sub-pipelines per
    consumer and stays available through the same function.
    """
    from bio_re_with_entity_embeddings_ray.pipelines.kg import (
        nodes_and_triples_bucketed,
    )
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions

    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa

    def project_keys(t: pa.Table) -> pa.Table:
        # the Arrow fused pack dedups internally (one lexsort covers
        # dedup + both group-bys), so the old per-block DISTINCT stage
        # is redundant — only the column projection remains
        return t.select(["conv_id", "entity_type", "entity_id"])

    t0 = time.perf_counter()
    ts = _transcripts(sf_dir, replicas)
    mentions = scan_mentions(ts, include_tool=True).map_batches(
        project_keys, batch_format="pyarrow", batch_size=None
    )
    edges, nodes, pair_prov, node_prov, tagged = nodes_and_triples_bucketed(
        mentions, "op", "res", "applies_to", num_buckets,
        assume_unsplit_blocks=True,
    )
    with ThreadPoolExecutor(2) as pool:
        f_e, f_n = pool.submit(edges.count), pool.submit(nodes.count)
        n_triples, n_nodes = f_e.result(), f_n.result()
    # tagged is materialized and holds exactly pair_prov + node_prov rows,
    # so the provenance count is a metadata read, not a third execution
    n_prov = tagged.count()
    sec = time.perf_counter() - t0
    return {
        "sec": sec,
        "triples": n_triples,
        "nodes": n_nodes,
        "prov_buckets": n_prov,
    }


def bench_minhash(sf_dir: str, replicas: int, num_buckets: int) -> float:
    from bio_re_with_entity_embeddings_ray.stages.dedup import minhash_lsh_pairs

    # star mode (spanning edges per LSH bucket): the bench corpus is
    # replica-heavy, so all-pairs mode measures O(m^2) pair materialization
    # of exact-dup clusters rather than LSH itself
    t0 = time.perf_counter()
    minhash_lsh_pairs(
        _corpus(sf_dir, replicas), num_buckets=num_buckets, star=True
    ).count()
    return time.perf_counter() - t0


def bench_curate(sf_dir: str, replicas: int, num_buckets: int) -> float:
    """Curation composition: quality filter -> hashed exact dedup
    (digest-only exchange) -> broadcast keep-set filter."""
    from bio_re_with_entity_embeddings_ray.pipelines.curate import curate

    t0 = time.perf_counter()
    curate(_corpus(sf_dir, replicas), num_buckets=num_buckets).count()
    return time.perf_counter() - t0


def bench_neardup(sf_dir: str, replicas: int, num_buckets: int) -> float:
    """End-to-end near-dup curation: quality filter -> MinHash-LSH star
    pairs -> connected components (actor engine) -> keep representative."""
    from bio_re_with_entity_embeddings_ray.pipelines.curate import curate_neardup

    t0 = time.perf_counter()
    curate_neardup(_corpus(sf_dir, replicas), num_buckets=num_buckets).count()
    return time.perf_counter() - t0


def bench_paradedup(sf_dir: str, replicas: int, num_buckets: int) -> float:
    """Paragraph-level exact dedup + doc reassembly over the replicated
    corpus (every replica loses all its paragraphs to the first copy) —
    exercises the pkey winner exchange, keep-list pack and the measured
    rejoin plan at bench scale."""
    from bio_re_with_entity_embeddings_ray.stages.dedup import paragraph_dedup

    t0 = time.perf_counter()
    paragraph_dedup(
        _corpus(sf_dir, replicas), para_tokens=8, num_buckets=num_buckets
    ).count()
    return time.perf_counter() - t0


def bench_pack(sf_dir: str, replicas: int) -> float:
    """Shuffled-then-packed layout manifest over the replicated corpus —
    exercises the distributed prefix scan (range exchange + O(ranges)
    driver scan) at bench scale."""
    from bio_re_with_entity_embeddings_ray.stages.ordered import (
        pack_sequences_shuffled,
    )

    t0 = time.perf_counter()
    pack_sequences_shuffled(_corpus(sf_dir, replicas), budget=2048).count()
    return time.perf_counter() - t0


def _host_probe() -> float:
    """Single-threaded-ish 2k matmul wall time: a shared-host
    memory-bandwidth contention canary recorded alongside every bench
    sample. Quiet band on THIS box: ~1.0-2.5 s (BASELINE.md's measured
    band — openblas here runs the 2k matmul near single-threaded); a
    contended host measures 2x+ that and inflates every pipeline number
    with it. Compare samples only at similar probe readings."""
    import numpy as np

    a = np.random.rand(2000, 2000)
    t0 = time.perf_counter()
    a @ a
    return round(time.perf_counter() - t0, 3)


def bench_graph(sf_dir: str, replicas: int, num_buckets: int) -> float:
    """Graph family end-to-end: mention scan over the replicated corpus
    -> untyped co-occurrence graph (combiner-deduped; every entity pair
    is a hot key here — one partial row per block regardless of replica
    count) -> 2-iteration integer PageRank (one narrow edges pass +
    node-bounded merge per iteration)."""
    from bio_re_with_entity_embeddings_ray.stages import graph
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions

    t0 = time.perf_counter()
    m = scan_mentions(_transcripts(sf_dir, replicas), include_tool=True)
    # conv-contiguous blocks (same layout contract as bench_kg, blocks
    # far below target_max_block_size): pair expansion per block, zero
    # conv shuffle — the general path's full mention exchange measured
    # 130 s at this input; this path removes it
    edges = graph.cooccurrence_graph(
        m, num_buckets=num_buckets, conv_partitioned=True,
        assume_unsplit_blocks=True,
    )
    graph.pagerank(edges, iters=2, num_buckets=num_buckets)
    return time.perf_counter() - t0


def bench_knn(sf_dir: str) -> float:
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.scoring import knn_topk

    t0 = time.perf_counter()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    knn_topk(emb, n_queries=5, k=10).count()
    return time.perf_counter() - t0


def bench_window(sf_dir: str) -> float:
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import tumbling_window

    t0 = time.perf_counter()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    tumbling_window(ev).count()
    return time.perf_counter() - t0


def bench_sft(sf_dir: str, replicas: int) -> float:
    """SFT example construction over the full replicated transcript
    corpus: the bench layout keeps each conversation in one block, so the
    conv_partitioned zero-exchange path applies — context strings are
    built per block and never cross the wire (the generic path's full-
    text conv shuffle is the cost this layout avoids)."""
    from bio_re_with_entity_embeddings_ray.stages.chat import sft_examples

    t0 = time.perf_counter()
    sft_examples(
        _transcripts(sf_dir, replicas), ctx_turns=4, conv_partitioned=True
    ).count()
    return time.perf_counter() - t0


def run_once() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    replicas = int(os.environ.get("GRAFT_BENCH_REPLICAS", "128"))
    # Round-3 lesson: the driver recorded minhash_lsh 17.6s / curate_neardup
    # 22.2s where the same commit measured 7.1s / 10.8s on a quiet box — a
    # transient contention window on this shared host that the single
    # END-of-run probe could not see (it certified the box quiet AFTER the
    # noise had passed). Two defenses: (a) every query is best-of-2 (one
    # contended window cannot poison both runs), (b) the probe runs before,
    # mid-suite and after, and the REPORTED canary is the WORST one seen.
    repeats = 1 if os.environ.get("GRAFT_BENCH_ONLY", "") == "kg" else 2
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from bio_re_with_entity_embeddings_ray import quiet_ray_data

    quiet_ray_data()
    num_buckets = max(16, 2 * num_cpus)

    # warm the page cache AND the worker pool (pandas/pyarrow imports in
    # every worker) so we measure compute+shuffle, not first disk read and
    # per-worker import storms
    import ray.data as rd

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda df: df, batch_format="pandas", batch_size=None
    ).count()
    n_turns = _transcripts(sf_dir, replicas).count()

    probes = [_host_probe()]

    def best(fn, *args):
        out = fn(*args)
        for _ in range(repeats - 1):
            nxt = fn(*args)
            if (nxt["sec"] if isinstance(nxt, dict) else nxt) < (
                out["sec"] if isinstance(out, dict) else out
            ):
                out = nxt
        return out

    kg = best(bench_kg, sf_dir, replicas, num_buckets)
    queries = {"kg_e2e": round(kg["sec"], 3)}
    if os.environ.get("GRAFT_BENCH_ONLY", "") != "kg":
        queries.update(
            {
                "minhash_lsh": round(best(bench_minhash, sf_dir, replicas, num_buckets), 3),
                "curate": round(best(bench_curate, sf_dir, replicas, num_buckets), 3),
                "curate_neardup": round(best(bench_neardup, sf_dir, replicas, num_buckets), 3),
            }
        )
        probes.append(_host_probe())
        queries.update(
            {
                "knn_topk": round(best(bench_knn, sf_dir), 3),
                "tumbling_window": round(best(bench_window, sf_dir), 3),
                "pack_shuffled": round(best(bench_pack, sf_dir, replicas), 3),
                "paragraph_dedup": round(
                    best(bench_paradedup, sf_dir, replicas, num_buckets), 3
                ),
                "pagerank_cooc": round(
                    best(bench_graph, sf_dir, replicas, num_buckets), 3
                ),
                "sft_examples": round(best(bench_sft, sf_dir, replicas), 3),
            }
        )
    probes.append(_host_probe())
    result = {
        # worst contention canary observed across the whole suite (pre,
        # mid, post); quiet box ~1.0-1.2 s, contended 2-5x that
        "host_probe_matmul_sec": max(probes),
        "host_probes": probes,
        "metric": "kg_e2e_sec",
        "value": queries["kg_e2e"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "replicas": replicas,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / kg["sec"], 1),
        "triples": kg["triples"],
        "nodes": kg["nodes"],
    }
    ray.shutdown()
    return result


def _prewarm_corpus(sf_dir: str, replicas: int) -> float:
    """Deterministically pin the page-cache state before a scaling leg:
    read every corpus file through once (sequential, discarded). Round-4
    measurements put the 8-cpu leg's run-to-run spread at 44-52 s with
    the cache state as the dominant variable; a read-through before EVERY
    leg attempt makes both legs measure the same warm-cache workload.
    Returns the wall seconds spent warming (first call after a corpus
    (re)build pays the disk read; later calls are cache-speed)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/bench_corpus/{name}_r{replicas}"
    if not os.path.exists(f"{out}/_SUCCESS"):
        return 0.0  # first subprocess builds it; nothing to warm yet
    t0 = time.perf_counter()
    for fn in sorted(os.listdir(out)):
        if not fn.endswith(".parquet"):
            continue
        with open(os.path.join(out, fn), "rb") as f:
            while f.read(1 << 22):
                pass
    return round(time.perf_counter() - t0, 3)


def run_scaling() -> dict:
    import subprocess

    def run_one(ncpu: int) -> dict:
        # headline only, at a compute-dominated input size (fixed scheduler
        # + shuffle overheads would otherwise swamp an 8s run and make any
        # efficiency number meaningless). 1280 replicas: the round-4 Arrow
        # kernels cut the 32-cpu marginal cost per replica ~2.5x, so the
        # ~2.5 s fixed session cost was eating ~45% of a 320-replica
        # 32-cpu leg (vs ~24% of the 8-cpu leg) and biasing the ratio
        # DOWN — the measured per-replica marginals put the
        # fixed-cost-free kernel ratio at ~0.65
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_ONLY="kg",
            GRAFT_BENCH_REPLICAS=os.environ.get("GRAFT_BENCH_REPLICAS", "1280"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best of 3: a fresh-process Ray session right after the previous
        # one exits occasionally pays multi-second OS/object-store reclaim
        # noise (observed 7s -> 50s outliers, ~±20% run-to-run on this
        # shared box); settle + repeat isolates it
        results = []
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        replicas = int(os.environ.get("GRAFT_BENCH_REPLICAS", "1280"))
        for _ in range(3):
            time.sleep(3)
            _prewarm_corpus(sf_dir, replicas)
            results.append(run_one(ncpu))
        return min(results, key=lambda r: r["value"])

    lo, hi = run(8), run(32)
    tput_lo = lo["turns_per_sec"]
    tput_hi = hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    hw = hw_ceiling()
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        # contention canaries of the two WINNING legs (see run_once):
        # compare before trusting eff — a burst during one leg's window
        # poisons the ratio even under best-of-3
        "probes_8": lo.get("host_probes"),
        "probes_32": hi.get("host_probes"),
        "turns_per_sec_8": tput_lo,
        "turns_per_sec_32": tput_hi,
        "turns": hi["turns"],
        "sf": hi["sf"],
        # the same 8->32 ratio for EMBARRASSINGLY PARALLEL raw Ray tasks
        # (no Ray Data, no shuffle, no barriers) running the identical
        # per-batch kernels: this single-box sandbox shares one memory bus,
        # so memory-bound batch work stops scaling before 32 cores. On a
        # real 256-node cluster each node brings its own memory bandwidth,
        # so the framework ratio (value / hw_ceiling) is the portable
        # number; the raw ratio is reported unmodified above.
        "hw_ceiling_eff": hw,
        "framework_eff": round(min(1.0, eff / hw), 3) if hw else None,
    }


def hw_ceiling() -> float:
    """8->32 scaling of the headline per-batch kernels as plain Ray tasks.

    Pure hardware measurement: zero framework machinery — if this is < 1.0
    the box itself (memory bandwidth) cannot scale the workload linearly,
    independent of any engine design."""
    import ray

    ray.init(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    @ray.remote
    def kernel(reps: int) -> None:
        import pyarrow.parquet as pq

        from bio_re_with_entity_embeddings_ray.pipelines.kg import _combined_arrow
        from bio_re_with_entity_embeddings_ray.sources.transcripts import derive_batch
        from bio_re_with_entity_embeddings_ray.stages.mentions import MentionScanner

        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        scanner = MentionScanner(include_tool=True)
        # the FULL fused per-block kernel chain of the measured headline
        # (derive -> scan -> pack) so the ceiling reflects the pipeline's
        # actual kernel mix — a probe that omits the pack understates how
        # memory-bound the real workload is and overstates the ceiling
        for _ in range(reps):
            m = scanner(derive_batch(tbl))
            _combined_arrow(
                m.select(["conv_id", "entity_type", "entity_id"]), "op", "res"
            )

    ray.get([kernel.remote(1) for _ in range(32)])  # warm imports + cache
    # best-of-3 per leg, interleaved: single measurements of either leg
    # swing ±20% with box noise (observed ceiling spread 0.67-0.92 from
    # one-shot legs); the per-leg BEST is the cleanest hardware number
    tput = {8: 0.0, 32: 0.0}
    for _ in range(3):
        for par in (8, 32):
            t0 = time.perf_counter()
            ray.get([kernel.remote(6) for _ in range(par)])
            tput[par] = max(tput[par], par * 6 / (time.perf_counter() - t0))
    ray.shutdown()
    return round((tput[32] / tput[8]) / (32 / 8), 3)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
