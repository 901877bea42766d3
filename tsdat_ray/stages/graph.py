"""Distributed graph primitives for corpus curation.

``connected_components`` turns a near-duplicate PAIR list (MinHash / SimHash
/ n-gram Jaccard output) into cluster labels so a dedup pass can keep one
canonical doc per cluster — the step between candidate generation and the
actual drop decision (cf. Kiveris et al. 2014, "Connected Components in
MapReduce and Beyond").

Shape: two-level contraction instead of a per-round shuffle loop.  Each
label-propagation round in Ray Data costs a full groupby shuffle plus
executor startup (~5 s of fixed overhead at any scale), so an O(log n)-round
loop is dominated by overhead.  Near-dup graphs contract almost entirely in
one local pass: an edge lives wholly inside its hash partition, so local
union-find resolves it immediately, and only nodes that appear in MULTIPLE
partitions leave residual "representative" edges — a graph bounded by the
multi-partition node count, in practice orders of magnitude smaller than the
pair list.  That residual graph is solved in ONE reduce task and broadcast
(it is a table of cluster representatives, never corpus payload).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def cc_numpy(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-memory connected components over edge arrays (int64 node ids).
    Returns ``(nodes, label)`` where ``label`` is the MINIMUM node id in the
    node's component — a deterministic canonical representative.

    Vectorized min-label propagation with pointer doubling: each outer pass
    pulls neighbour labels through every edge (O(E)), then contracts label
    chains to their root (O(V) per doubling step); the outer loop runs
    O(log diameter) times.  No Python per-edge loop."""
    nodes, idx = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = idx[: len(a)], idx[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab
        lab = lab.copy()
        np.minimum.at(lab, u, lab[v])
        np.minimum.at(lab, v, lab[u])
        while True:  # pointer doubling to the chain root
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, old):
            break
    # nodes are sorted, so min index == min node id
    return nodes, nodes[lab]


def _gather_small(ds, k_col: str, v_col: str) -> dict:
    """Collect a SMALL (node → label) Dataset into a plain dict, skipping
    the zero-column blocks Ray's groupby emits for empty groups."""
    import ray

    out: dict = {}
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or k_col not in t.column_names:
            continue
        out.update(zip(t[k_col].to_numpy(zero_copy_only=False).tolist(),
                       t[v_col].to_numpy(zero_copy_only=False).tolist()))
    return out


def connected_components(pairs, a_col: str = "id_a", b_col: str = "id_b",
                         salt_mod: int = 64, final_max_edges: int = 2_000_000,
                         _depth: int = 0):
    """Connected components over an undirected pair list: returns a Dataset
    ``(node, component)`` where ``component`` is the minimum node id in the
    component (keep it, drop the rest, for cluster dedup).

    1. shuffle edges by ``min(a, b) % salt_mod`` and union-find each group
       locally (an edge never straddles groups, so every edge contracts
       here) → ``(node, rep)`` rows, one per (group, node);
    2. shuffle those rows by node: per node take the minimum rep as its
       pending label and emit residual edges ``(min_rep, other_rep)`` for
       nodes seen in several groups;
    3. solve the residual representative graph in one reduce task (it is
       bounded by the multi-group node count; if it is still larger than
       ``final_max_edges``, recurse one more contraction level) and
       broadcast the small rep→root table into a final map_batches.

    Two groupby shuffles + one small broadcast, independent of component
    diameter.  Deterministic: every reduction is an integer min."""
    import ray
    import ray.data as rd

    def to_edges(b: pa.Table) -> pa.Table:
        a = b[a_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        bb = b[b_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"_a": pa.array(a), "_b": pa.array(bb),
                         "_salt": pa.array(np.minimum(a, bb) % np.int64(salt_mod))})

    def local_cc(g: pa.Table) -> pa.Table:
        a = g["_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = g["_b"].combine_chunks().to_numpy(zero_copy_only=False)
        nodes, lab = cc_numpy(a, b)
        return pa.table({"node": pa.array(nodes), "rep": pa.array(lab),
                         "_nsalt": pa.array(nodes % np.int64(salt_mod))})

    def merge_reps(g: pa.Table) -> pa.Table:
        """Per node: pending label = min rep; extra reps become residual
        rep-graph edges (flagged _edge=1)."""
        node = g["node"].combine_chunks().to_numpy(zero_copy_only=False)
        rep = g["rep"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((rep, node))
        node, rep = node[order], rep[order]
        st = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        runlen = np.diff(np.r_[st, len(node)])
        minrep = np.repeat(rep[st], runlen)
        extra = rep != minrep  # duplicates of (node, minrep) are impossible:
        # one (group, node) row per group, sorted, first is the min
        out_node = np.concatenate([node[st], minrep[extra]])
        out_rep = np.concatenate([rep[st], rep[extra]])
        edge_flag = np.concatenate([np.zeros(len(st), np.int64),
                                    np.ones(int(extra.sum()), np.int64)])
        return pa.table({"node": pa.array(out_node), "rep": pa.array(out_rep),
                         "_edge": pa.array(edge_flag)})

    merged = (pairs.map_batches(to_edges, batch_format="pyarrow")
              .groupby("_salt").map_groups(local_cc, batch_format="pyarrow")
              .groupby("_nsalt").map_groups(merge_reps, batch_format="pyarrow")
              .materialize())

    residual = merged.filter(expr="_edge == 1")
    n_resid = residual.count()
    if n_resid == 0:
        root_ref = ray.put({})
    elif n_resid > final_max_edges and _depth < 3:
        # pathological fan-out: contract the rep graph one more level
        sub = connected_components(residual, a_col="node", b_col="rep",
                                   salt_mod=salt_mod,
                                   final_max_edges=final_max_edges,
                                   _depth=_depth + 1)
        root_ref = ray.put(_gather_small(sub, "node", "component"))
    else:
        # one reduce task over the bounded representative graph
        def solve(g: pa.Table) -> pa.Table:
            a = g["node"].combine_chunks().to_numpy(zero_copy_only=False)
            b = g["rep"].combine_chunks().to_numpy(zero_copy_only=False)
            nodes, lab = cc_numpy(a, b)
            return pa.table({"r": pa.array(nodes), "root": pa.array(lab)})

        def const(b: pa.Table) -> pa.Table:
            return b.append_column("_one", pa.array(np.zeros(len(b), np.int8)))

        small = (residual.map_batches(const, batch_format="pyarrow")
                 .groupby("_one").map_groups(solve, batch_format="pyarrow"))
        root_ref = ray.put(_gather_small(small, "r", "root"))

    def finish(b: pa.Table) -> pa.Table:
        roots = ray.get(root_ref)
        node = b["node"].combine_chunks().to_numpy(zero_copy_only=False)
        rep = b["rep"].combine_chunks().to_numpy(zero_copy_only=False)
        if roots:
            uniq, inv = np.unique(rep, return_inverse=True)
            mapped = np.fromiter((roots.get(x, x) for x in uniq.tolist()),
                                 dtype=np.int64, count=len(uniq))
            rep = mapped[inv]
        return pa.table({"node": pa.array(node), "component": pa.array(rep)})

    return (merged.filter(expr="_edge == 0")
            .map_batches(finish, batch_format="pyarrow"))


def pagerank(pairs, a_col: str = "id_a", b_col: str = "id_b",
             damping: float = 0.85, iters: int = 20):
    """PageRank over an undirected pair list (iterative distributed
    dataflow, like :func:`~tsdat_ray.stages.similarity.kmeans_fit`): each
    iteration broadcasts the current rank vector, every edge batch emits
    contribution partials r[u]/deg[u] per direction (pre-aggregated per
    batch), and one small groupby folds them into the next vector.

    The rank/degree tables are bounded by |V| (nodes appearing in pairs —
    for the near-dup graph, FAR fewer than docs); at billions of nodes,
    replace the broadcast with a rank-table hash_join per iteration — the
    edge Dataset itself never moves either way.  Deterministic: fixed
    iteration count, int-keyed numpy folds, sorted key order.  Returns
    (node, rank) with Σrank = 1 over the pair-graph's nodes."""
    import ray

    edges = pairs.select_columns([a_col, b_col]).materialize()

    # degree per node (undirected: both endpoints), driver-side tiny fold
    def deg_partial(b: pa.Table) -> pa.Table:
        x = np.r_[b[a_col].combine_chunks().to_numpy(zero_copy_only=False),
                  b[b_col].combine_chunks().to_numpy(zero_copy_only=False)]
        u, c = np.unique(x, return_counts=True)
        return pa.table({"node": pa.array(u), "_c": pa.array(c.astype(np.int64))})

    deg: dict = {}
    for b in edges.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for n_, c_ in zip(b["node"].to_pylist(), b["_c"].to_pylist()):
            deg[n_] = deg.get(n_, 0) + c_
    nodes = np.array(sorted(deg), dtype=np.int64)
    degs = np.array([deg[n_] for n_ in nodes], dtype=np.float64)
    N = len(nodes)
    if N == 0:
        return pairs.select_columns([a_col]).limit(0).map_batches(
            lambda b: pa.table({"node": pa.array([], pa.int64()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    ranks = np.full(N, 1.0 / N)

    for _ in range(iters):
        rref = ray.put((nodes, ranks / degs))

        def contrib(b: pa.Table) -> pa.Table:
            nd, share = ray.get(rref)
            a = b[a_col].combine_chunks().to_numpy(zero_copy_only=False)
            bb = b[b_col].combine_chunks().to_numpy(zero_copy_only=False)
            # undirected: a receives from b and vice versa
            dst = np.r_[a, bb]
            src = np.r_[bb, a]
            w = share[np.searchsorted(nd, src)]
            order = np.argsort(dst, kind="stable")
            ds_, ws = dst[order], w[order]
            st = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
            return pa.table({"node": pa.array(ds_[st]),
                             "_w": pa.array(np.add.reduceat(ws, st))})

        acc = np.zeros(N)
        for b in edges.map_batches(contrib, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            idx = np.searchsorted(nodes, b["node"].combine_chunks()
                                  .to_numpy(zero_copy_only=False))
            np.add.at(acc, idx, b["_w"].combine_chunks().to_numpy(zero_copy_only=False))
        ranks = (1.0 - damping) / N + damping * acc

    import ray.data as rd

    return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                   "rank": pa.array(ranks)}))
