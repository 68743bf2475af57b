"""Actor-partitioned connected components — the scale path for label
propagation over big graphs.

The Dataset implementation (stages/dedup.connected_components) re-ships
the EDGE LIST through a hash exchange on every round; fine for the 2-3
round near-star graphs LSH produces, wasteful for deeper graphs. Here the
edge partitions are loaded ONCE into shard actors (node -> its shard by
``node % num_shards`` — doc ids must be non-negative ints) and stay
resident; each round moves only per-node label minima between peers
(actor-to-actor, no driver relay of graph data), then a driver barrier
applies them. min() is commutative/associative, so the result is
deterministic regardless of message/scheduling order and identical to the
Dataset path (equality-tested on random graphs).

This is the documented raw-actor exception of the engine: a shared
mutable index (per-shard adjacency + label state) that the Dataset API
cannot hold across iterations. Partitioning assumption: node ids hash
uniformly under ``% num_shards``; a pathological id distribution (all ids
sharing the residue) collapses to one shard — salt the ids first if that
can occur.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _shard_class():
    import ray

    @ray.remote
    class CCShard:
        def __init__(self, shard_id: int, num_shards: int):
            self.shard_id = shard_id
            self.num = num_shards
            self.adj: dict[int, list[int]] = {}
            self.label: dict[int, int] = {}
            self.inbox: dict[int, int] = {}
            self.peers = None

        def set_peers(self, peers) -> None:
            self.peers = peers

        def add_edges(self, nodes: np.ndarray, nbrs: np.ndarray) -> None:
            adj = self.adj
            for n, m in zip(nodes.tolist(), nbrs.tolist()):
                adj.setdefault(n, []).append(m)

        def init_labels(self) -> None:
            self.label = {n: min(n, min(ms)) for n, ms in self.adj.items()}
            self.inbox = {}

        def send_round(self):
            """Push each local node's label to its neighbors' shards.
            Returns the peers' receive ObjectRefs WITHOUT blocking on
            them: a blocking get here would deadlock (every shard's
            receive queue sits behind its own in-flight send_round on a
            single-threaded actor). The driver barriers on the returned
            refs before anyone applies."""
            out: list[dict[int, int]] = [dict() for _ in range(self.num)]
            for n, ms in self.adj.items():
                lab = self.label[n]
                for m in ms:
                    d = out[m % self.num]
                    prev = d.get(m)
                    if prev is None or lab < prev:
                        d[m] = lab
            return [
                self.peers[i].receive.remote(updates)
                for i, updates in enumerate(out)
                if updates
            ]

        def receive(self, updates: dict[int, int]) -> bool:
            inbox = self.inbox
            for n, lab in updates.items():
                prev = inbox.get(n)
                if prev is None or lab < prev:
                    inbox[n] = lab
            return True

        def apply_round(self) -> int:
            changed = 0
            label = self.label
            for n, lab in self.inbox.items():
                if lab < label[n]:
                    label[n] = lab
                    changed += 1
            self.inbox = {}
            return changed

        def result(self):
            items = sorted(self.label.items())
            return (
                np.fromiter((n for n, _ in items), dtype=np.int64, count=len(items)),
                np.fromiter((l for _, l in items), dtype=np.int64, count=len(items)),
            )

    return CCShard


def connected_components_actors(pairs, num_shards: int = 8, max_iters: int = 64):
    """(doc_a, doc_b) pair Dataset -> (doc_id, cluster_id) DataFrame with
    cluster_id = min reachable id; same contract as
    dedup.connected_components, edges held resident in shard actors."""
    import ray

    CCShard = _shard_class()
    shards = [CCShard.remote(i, num_shards) for i in range(num_shards)]
    try:
        return _run(pairs, shards, num_shards, max_iters)
    finally:
        # actors must not outlive the call, success or failure
        for s in shards:
            ray.kill(s)


def _run(pairs, shards, num_shards: int, max_iters: int) -> pd.DataFrame:
    import ray

    ray.get([s.set_peers.remote(shards) for s in shards])

    # distributed load: each map task routes its batch's half-edges to the
    # owning shards (no driver relay of edge data)
    def load(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy().astype(np.int64)
        b = batch["doc_b"].to_numpy().astype(np.int64)
        nodes = np.concatenate([a, b])
        nbrs = np.concatenate([b, a])
        owner = nodes % num_shards
        refs = []
        for sh in range(num_shards):
            m = owner == sh
            if m.any():
                refs.append(shards[sh].add_edges.remote(nodes[m], nbrs[m]))
        ray.get(refs)
        return pd.DataFrame({"n": [len(batch)]})

    pairs.map_batches(load, batch_format="pandas", batch_size=None).count()
    ray.get([s.init_labels.remote() for s in shards])

    for _ in range(max_iters):
        ack_lists = ray.get([s.send_round.remote() for s in shards])
        # barrier: every receive has EXECUTED before any apply is issued
        ray.get([ref for lst in ack_lists for ref in lst])
        changed = sum(ray.get([s.apply_round.remote() for s in shards]))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_actors: no convergence in {max_iters} rounds"
        )

    parts = ray.get([s.result.remote() for s in shards])
    nodes = np.concatenate([p[0] for p in parts]) if parts else np.array([], dtype=np.int64)
    labels = np.concatenate([p[1] for p in parts]) if parts else np.array([], dtype=np.int64)
    out = pd.DataFrame({"doc_id": nodes, "cluster_id": labels}).sort_values(
        "doc_id", kind="mergesort"
    ).reset_index(drop=True)
    return out
