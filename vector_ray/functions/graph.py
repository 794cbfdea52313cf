"""Distributed link-graph centrality (PageRank power iteration).

Web-corpus curation uses link-graph centrality as a quality prior —
OpenWebText's karma threshold and Common-Crawl harmonic-centrality
filtering are the same idea: a page linked from many well-linked pages
is worth more training tokens. This module computes PageRank over an
edge Dataset with the classic MapReduce formulation (Page et al. 1999;
Malewicz et al. 2010 describe the Pregel alternative that avoids
re-shipping edges — noted below):

    rank'(v) = (1 - d) / N
             + d * ( sum_{(u,v) in E} rank(u) / outdeg(u)
                     + dangling_mass / N )

Plan shape per iteration (the corpus = the edge list, the model = the
rank vector — the same treeAggregate split as ``cluster.kmeans_fit``):

* edges stream through ``map_batches``; each block emits per-dst
  PARTIAL contribution sums (O(distinct dst per block) rows, never
  O(edges));
* one tiny ``groupby(node).sum`` merges partials — the only exchange,
  bounded by O(N) rows;
* the rank vector (O(N) rows) is broadcast via ``ray.put`` when it
  fits a worker heap (``mode="broadcast"``), or co-partitioned with
  the edge list via ``stages.shuffle.bucketed_join`` when it doesn't
  (``mode="bucketed"``); ``mode="auto"`` counts N and picks.

At 100 TB the edge list re-streams from storage every iteration (no
``materialize()`` of the big side — column-pruned re-reads are the
MapReduce PageRank cost; a Pregel-style resident-partition engine is
the only way around it, and Ray Data's streaming executor is not
that). The bucketed path's per-iteration cost is two hash shuffles of
O(edges) + O(N) rows — the honest large-N plan, byte-identical output
to broadcast mode (tested).

Determinism contract (what the SQL oracle reproduces):

* N = |distinct(src) ∪ distinct(dst)|; outdeg counts parallel edges;
  null src/dst edges are dropped up front;
* rank_0 = 1/N for every node; fixed ``iters`` power iterations, no
  convergence test;
* dangling mass = total rank held by nodes with outdeg 0,
  redistributed uniformly each iteration;
* output rank rounded half-away-from-zero ROUND(ROUND(r, 9), round_to)
  so distributed-vs-SQL summation-order ulps cannot flip the compare.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from vector_ray.schema import round_sql_np


def _collect(ds) -> pa.Table:
    tables = ray.get(ds.materialize().to_arrow_refs())
    nonempty = [t for t in tables if t.num_rows > 0] or tables[:1]
    return (
        pa.concat_tables(nonempty, promote_options="default")
        if nonempty
        else pa.table({})
    )


def _drop_null_edges(t: pa.Table, src: str, dst: str) -> pa.Table:
    mask = pc.and_(pc.is_valid(t[src]), pc.is_valid(t[dst]))
    return t.filter(mask) if not pc.all(mask).as_py() else t


def _degree_partial(
    t: pa.Table, src: str, dst: str, weight: str | None = None
) -> pa.Table:
    """Per-block (node, outdeg) partial covering BOTH endpoints: srcs
    contribute their edge count (or weight sum), dsts contribute 0 so
    sink-only nodes still appear in the node set after the global sum."""
    t = _drop_null_edges(t, src, dst)
    n = t.num_rows
    if weight is None:
        w = np.ones(n, np.int64)
        zeros = np.zeros(n, np.int64)
    else:
        w = _np_col(t, weight, np.float64)
        if len(w) and w.min() < 0:
            raise ValueError("pagerank: edge weights must be non-negative")
        zeros = np.zeros(n, np.float64)
    both = pa.table(
        {
            "node": pa.concat_arrays(
                [
                    pc.cast(t[src], pa.int64()).combine_chunks(),
                    pc.cast(t[dst], pa.int64()).combine_chunks(),
                ]
            ),
            "outdeg": pa.array(np.concatenate([w, zeros])),
        }
    )
    part = both.group_by("node").aggregate([("outdeg", "sum")])
    return part.rename_columns(["node", "outdeg"])


def _np_col(t: pa.Table, name: str, dtype=np.int64) -> np.ndarray:
    col = t[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col, dtype=dtype)


def pagerank(
    ds_edges,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    damping: float = 0.85,
    mode: str = "auto",
    broadcast_limit: int = 4_000_000,
    num_buckets: int = 32,
    round_to: int = 6,
    weight: str | None = None,
    seeds: list | None = None,
):
    """PageRank over an edge Dataset with integer node ids.

    Returns a ``pyarrow.Table`` (node:int64, rank:float64) in broadcast
    mode, a ``ray.data.Dataset`` with the same columns in bucketed
    mode. ``mode="auto"`` counts the node set (already needed for the
    out-degree pass) and broadcasts when N <= broadcast_limit.

    ``weight`` names a non-negative float edge-weight column: each
    edge then carries rank(u) * w(e) / out_strength(u), where
    out_strength sums u's edge weights (an all-zero-weight node is
    dangling). ``weight=None`` is the classic unweighted recurrence.

    ``seeds`` switches to PERSONALIZED PageRank (the "related to these
    nodes" recommendation shape): the teleport vector becomes uniform
    over the seed nodes instead of over all nodes — rank_0 = s and
    rank' = (1−d)·s + d·(contrib + dangling·s), with s = 1/|seeds ∩
    nodes| on present seeds. Works in BOTH modes: the seed list itself
    is a small user input (closure-captured, O(|seeds|)), so in
    bucketed mode the per-node seed value is recomputed per batch from
    the node column — cheaper than carrying it as a joined column, and
    the O(N) seed VECTOR never exists anywhere. Byte-identical output
    across modes (same arithmetic, same final double-round).
    """
    if mode not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"pagerank: unknown mode {mode!r}")

    # ---- one exchange up front: (node, outdeg) for every node -------
    deg_ds = (
        ds_edges.map_batches(
            lambda t, s=src, d=dst, w=weight: _degree_partial(t, s, d, w),
            batch_format="pyarrow",
        )
        .groupby("node")
        .sum("outdeg")
        .map_batches(
            lambda t: t.rename_columns(["node", "outdeg"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_nodes = deg_ds.count()
    if n_nodes == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    if mode == "auto":
        mode = "broadcast" if n_nodes <= broadcast_limit else "bucketed"

    if mode == "broadcast":
        return _pagerank_broadcast(
            ds_edges, deg_ds, src, dst, iters, damping, round_to, weight,
            seeds=seeds,
        )
    return _pagerank_bucketed(
        ds_edges, deg_ds, src, dst, iters, damping, num_buckets, round_to,
        weight, seeds=seeds,
    )


# ---------------------------------------------------------------------------
# broadcast mode: the rank vector lives on the driver, ray.put per
# iteration (kmeans_fit's centroid pattern) — right whenever N rows of
# (int64, float64) fit one heap
# ---------------------------------------------------------------------------


def _pagerank_broadcast(
    ds_edges, deg_ds, src, dst, iters, damping, round_to, weight=None,
    seeds=None,
) -> pa.Table:
    """Round-5 plan (the HITS treatment): the projected edge table is
    materialized once and per-group index bundles precomputed (source
    positions into the rank vector, per-group unique dsts + inverse
    map, edge weights) — each iteration is then one round of raw
    gather+bincount tasks plus a driver merge, instead of a full
    Dataset job re-executing the lazy edge projection (4 Dataset jobs
    for iters=4; 5.3 s at sf0.1 on a 1,600-node graph before, well
    under a second after). Same arithmetic contract; summation-order
    ulps are absorbed by the shared final double-round exactly as the
    old groupby merge order was."""
    deg_t = _collect(deg_ds).sort_by("node")
    nodes = _np_col(deg_t, "node")
    outdeg = _np_col(deg_t, "outdeg", np.float64)
    n = float(len(nodes))
    one_minus = 1.0 - damping
    if seeds is not None:
        mask = np.isin(nodes, np.asarray(list(seeds), dtype=nodes.dtype))
        m = float(mask.sum())
        if m == 0:
            raise ValueError("pagerank: no seed node present in the graph")
        sv = mask.astype(np.float64) / m
        rank = sv.copy()
    else:
        sv = None
        rank = np.full(len(nodes), 1.0 / n, np.float64)
    base = one_minus / n
    has_out = outdeg > 0
    nodes_ref = ray.put(nodes)

    keep_cols = [src, dst] + ([weight] if weight is not None else [])
    proj = ds_edges.map_batches(
        lambda t, s=src, d=dst, kc=tuple(keep_cols): _drop_null_edges(
            t, s, d
        ).select(list(kc)),
        batch_format="pyarrow",
    ).materialize()

    @ray.remote(num_cpus=1)
    def make_bundle(nid, *tbls):
        sa = np.concatenate([_np_col(t, src) for t in tbls])
        da = np.concatenate([_np_col(t, dst) for t in tbls])
        ew = (
            np.concatenate([_np_col(t, weight, np.float64) for t in tbls])
            if weight is not None
            else None
        )
        src_pos = np.searchsorted(nid, sa)
        ud, inv = np.unique(da, return_inverse=True)
        return (src_pos, np.searchsorted(nid, ud), inv, ew)

    @ray.remote(num_cpus=1)
    def contrib_part(bundle, wv):
        src_pos, out_pos, inv, ew = bundle
        ws = wv[src_pos]
        if ew is not None:
            ws = ws * ew
        return out_pos, np.bincount(inv, weights=ws, minlength=len(out_pos))

    eblocks = proj.to_arrow_refs()
    num_groups = max(
        1, min(max(len(eblocks), 1), int(ray.cluster_resources().get("CPU", 8)))
    )
    bundles = [
        make_bundle.remote(nodes_ref, *eblocks[g::num_groups])
        for g in range(num_groups)
    ] if eblocks else []

    for _ in range(iters):
        w = np.where(has_out, rank / np.where(has_out, outdeg, 1.0), 0.0)
        dangling = float(rank[~has_out].sum())
        w_ref = ray.put(w)
        cvec = np.zeros(len(nodes), np.float64)
        for pos, sums in ray.get(
            [contrib_part.remote(b, w_ref) for b in bundles]
        ):
            np.add.at(cvec, pos, sums)
        if sv is not None:
            rank = one_minus * sv + damping * (cvec + dangling * sv)
        else:
            rank = base + damping * (cvec + dangling / n)

    return pa.table(
        {
            "node": pa.array(nodes),
            "rank": pa.array(round_sql_np(round_sql_np(rank, 9), round_to)),
        }
    )


def hits(
    ds_edges,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    round_to: int = 6,
) -> pa.Table:
    """Kleinberg HITS hubs/authorities over an edge Dataset (broadcast
    model — the score vectors are O(N) driver state like
    ``_pagerank_broadcast``; a large-N run would use the same bucketed
    plan as ``pagerank``).

    Round-5 plan: the projected edge table is materialized ONCE and
    per-block index bundles (score positions for both directions) are
    precomputed — each of the 2·iters passes is then a round of raw
    tasks doing one gather + bincount, instead of a full Dataset
    pipeline re-executing the upstream edge projection (the previous
    shape ran 8 Dataset jobs for iters=4 and measured 9.7 s at sf0.1
    on a 1,600-node graph; this one measures well under a second).

    Determinism contract (what the SQL oracle reproduces): h_0 = 1 for
    every node; per iteration a' = L2-normalized in-sum of h, then
    h' = L2-normalized out-sum of a' — each vector rounded to 9
    decimals after its normalize so summation-order ulps cannot
    compound; final scores ROUND(ROUND(x, 9), round_to). Parallel
    edges count; null edges drop; an all-dangling side yields zeros
    (normalize guards the zero norm)."""
    proj = ds_edges.map_batches(
        lambda t, s=src, d=dst: _drop_null_edges(t, s, d).select([s, d]),
        batch_format="pyarrow",
    ).materialize()
    deg_ds = (
        proj.map_batches(
            lambda t, s=src, d=dst: _degree_partial(t, s, d),
            batch_format="pyarrow",
        )
        .groupby("node")
        .sum("outdeg")
    )
    deg_t = _collect(deg_ds).sort_by("node")
    nodes = _np_col(deg_t, "node")
    n = len(nodes)
    if n == 0:
        empty = pa.array([], pa.float64())
        return pa.table(
            {"node": pa.array([], pa.int64()), "hub": empty, "authority": empty}
        )
    nodes_ref = ray.put(nodes)

    @ray.remote(num_cpus=1)
    def make_bundle(nid, *tbls):
        # iteration-invariant per-block-group structure for BOTH pass
        # directions: input-endpoint positions into the score vector,
        # unique output endpoints (as score positions) + inverse map
        s_arr = np.concatenate([_np_col(t, src) for t in tbls])
        d_arr = np.concatenate([_np_col(t, dst) for t in tbls])

        def enc(in_col, out_col):
            in_idx = np.searchsorted(nid, in_col)
            ud, inv = np.unique(out_col, return_inverse=True)
            return (in_idx, np.searchsorted(nid, ud), inv)

        return (enc(s_arr, d_arr), enc(d_arr, s_arr))

    @ray.remote(num_cpus=1)
    def pass_part(bundle, direction, vec):
        in_idx, out_pos, inv = bundle[direction]
        sums = np.bincount(
            inv, weights=vec[in_idx], minlength=len(out_pos)
        )
        return out_pos, sums

    eblocks = proj.to_arrow_refs()
    num_groups = max(
        1, min(len(eblocks), int(ray.cluster_resources().get("CPU", 8)))
    )
    bundles = [
        make_bundle.remote(nodes_ref, *eblocks[g::num_groups])
        for g in range(num_groups)
    ]

    def _pass(vec: np.ndarray, direction: int) -> np.ndarray:
        v_ref = ray.put(vec)
        out = np.zeros(n, np.float64)
        for pos, sums in ray.get(
            [pass_part.remote(b, direction, v_ref) for b in bundles]
        ):
            np.add.at(out, pos, sums)
        return out

    def _l2(v: np.ndarray) -> np.ndarray:
        norm = float(np.sqrt(np.sum(v * v)))
        return round_sql_np(v / norm, 9) if norm > 0 else v

    hub = np.ones(n, np.float64)
    auth = np.zeros(n, np.float64)
    for _ in range(iters):
        auth = _l2(_pass(hub, 0))   # src -> dst (in-sum of hubs)
        hub = _l2(_pass(auth, 1))   # dst -> src (out-sum of auths)

    return pa.table(
        {
            "node": pa.array(nodes),
            "hub": pa.array(round_sql_np(round_sql_np(hub, 9), round_to)),
            "authority": pa.array(
                round_sql_np(round_sql_np(auth, 9), round_to)
            ),
        }
    )


# ---------------------------------------------------------------------------
# bucketed mode: the rank vector never leaves the cluster — each
# iteration co-partitions (edges ⋈ weights on src) and (degree ⋈
# contributions on node) with the shared bucketed_join machinery
# ---------------------------------------------------------------------------


def _pagerank_bucketed(
    ds_edges, deg_ds, src, dst, iters, damping, num_buckets, round_to,
    weight=None, seeds=None,
):
    """Raw-task bucket-exchange plan (round-5 rework). The rank vector
    never exists whole anywhere AND the edges are partitioned by
    src-bucket exactly once — per iteration only the deduped
    (dst, contrib) partials move.

    The previous plan re-shuffled the full edge list through two
    ``bucketed_join``s + a groupby + a repartition EVERY iteration
    (~6 chained Dataset all-to-all ops × iters, re-executing the lazy
    edge projection each time). Measured at sf0.1 (200k edges, 1,600
    nodes) that cost 24 s of pure per-op scheduling against 5.5 s for
    broadcast mode on the same input; at sf1 (25M edges) it moved the
    edge list 4× for nothing. This plan:

      setup  — one split task partitions the (node, outdeg) table into
               per-bucket node-sorted rank state (node % B); G split
               tasks partition the edge blocks by src % B; B assemble
               tasks then precompute the ITERATION-INVARIANT lookups
               (src→rank-index positions, per-dst-bucket unique/inverse
               group structure) so the loop does arithmetic only.
      iter   — B contrib tasks (static edge bundle + own rank bucket →
               per-dst-bucket partial sums, pre-split, plus the
               bucket's dangling-rank scalar) then B update tasks
               (merge partials into the bucket's rank vector). 2·B
               tasks per iteration, zero Dataset machinery.
      finish — B small tables → Dataset.

    The edge bundle is pinned in the object store for the run
    (spill-backed — the span_dedupe exchange contract). Output is
    byte-identical to broadcast mode after the shared double-round
    (pinned by tests/test_graph.py and the ppr_events_bucketed
    oracle); contribution sums associate in a different order, which
    the 1e-9-then-round_to double-round absorbs exactly like the
    previous plan's groupby order did."""
    import ray.data as rd

    B = int(num_buckets)
    if B < 1:
        raise ValueError("pagerank: num_buckets must be >= 1")
    n = float(deg_ds.count())
    base = (1.0 - damping) / n
    one_minus = 1.0 - damping

    if seeds is not None:
        seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))

        def _seed_count(t: pa.Table) -> pa.Table:
            c = int(np.isin(_np_col(t, "node"), seed_arr).sum())
            return pa.table({"m": pa.array([c], pa.int64())})

        m = (
            deg_ds.map_batches(_seed_count, batch_format="pyarrow").sum("m")
            or 0
        )
        if m == 0:
            raise ValueError("pagerank: no seed node present in the graph")
        m = float(m)

        def sv_of(node_arr: np.ndarray) -> np.ndarray:
            return np.isin(node_arr, seed_arr).astype(np.float64) / m

    else:
        sv_of = None

    def _unwrap(refs):
        return [refs] if B == 1 else list(refs)

    @ray.remote(num_cpus=1, num_returns=B)
    def split_deg(*tbls):
        tbls = [t for t in tbls if "node" in t.column_names]
        if not tbls:
            e = np.empty(0, np.int64)
            out = tuple(
                (e, e.astype(np.float64), e.astype(np.float64))
                for _ in range(B)
            )
            return out if B > 1 else out[0]
        node = np.concatenate(
            [_np_col(t, "node") for t in tbls]
        )
        outdeg = np.concatenate(
            [_np_col(t, "outdeg", np.float64) for t in tbls]
        )
        b = node % B
        order = np.argsort(b, kind="stable")
        cuts = np.searchsorted(b[order], np.arange(B + 1))
        out = []
        for k in range(B):
            nb = node[order][cuts[k]:cuts[k + 1]]
            ob = outdeg[order][cuts[k]:cuts[k + 1]]
            o2 = np.argsort(nb, kind="stable")
            nb, ob = nb[o2], ob[o2]
            if sv_of is not None:
                r0 = sv_of(nb)
            else:
                r0 = np.full(len(nb), 1.0 / n, np.float64)
            out.append((nb, ob, r0))
        return tuple(out) if B > 1 else out[0]

    has_w = weight is not None

    @ray.remote(num_cpus=1, num_returns=B)
    def split_edges(*tbls):
        srcs = np.concatenate([_np_col(t, src) for t in tbls])
        dsts = np.concatenate([_np_col(t, dst) for t in tbls])
        ews = (
            np.concatenate([_np_col(t, weight, np.float64) for t in tbls])
            if has_w
            else None
        )
        b = srcs % B
        order = np.argsort(b, kind="stable")
        cuts = np.searchsorted(b[order], np.arange(B + 1))
        out = []
        for k in range(B):
            sl = slice(cuts[k], cuts[k + 1])
            out.append(
                (
                    srcs[order][sl],
                    dsts[order][sl],
                    ews[order][sl] if has_w else None,
                )
            )
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1)
    def assemble(state, *parts):
        # iteration-invariant structure: src positions into this
        # bucket's sorted node array, edges grouped by dst bucket, and
        # each segment's unique-dst/inverse mapping (only the bincount
        # weights change between iterations)
        nodes_b = state[0]
        srcs = np.concatenate([p[0] for p in parts])
        dsts = np.concatenate([p[1] for p in parts])
        ews = np.concatenate([p[2] for p in parts]) if has_w else None
        src_idx = np.searchsorted(nodes_b, srcs)
        db = dsts % B
        order = np.argsort(db, kind="stable")
        cuts = np.searchsorted(db[order], np.arange(B + 1))
        src_idx = src_idx[order]
        dsts = dsts[order]
        if has_w:
            ews = ews[order]
        uds, invs = [], []
        for k in range(B):
            seg = dsts[cuts[k]:cuts[k + 1]]
            ud, inv = np.unique(seg, return_inverse=True)
            uds.append(ud)
            invs.append(inv)
        return (src_idx, cuts, tuple(uds), tuple(invs), ews)

    @ray.remote(num_cpus=1, num_returns=B + 1)
    def contrib(bundle, state):
        nodes_b, outdeg_b, rank_b = state
        has = outdeg_b > 0
        w = np.where(has, rank_b / np.where(has, outdeg_b, 1.0), 0.0)
        dang = float(rank_b[~has].sum())
        src_idx, cuts, uds, invs, ews = bundle
        ws = w[src_idx]
        if ews is not None:
            ws = ws * ews
        outs = []
        for k in range(B):
            seg_w = ws[cuts[k]:cuts[k + 1]]
            if len(seg_w):
                sums = np.bincount(
                    invs[k], weights=seg_w, minlength=len(uds[k])
                )
            else:
                sums = np.zeros(len(uds[k]), np.float64)
            outs.append((uds[k], sums))
        outs.append(dang)
        return tuple(outs)

    @ray.remote(num_cpus=1)
    def update(state, dang_total, *partials):
        nodes_b, outdeg_b, _ = state
        c = np.zeros(len(nodes_b), np.float64)
        for ud, s in partials:
            if len(ud):
                c[np.searchsorted(nodes_b, ud)] += s
        if sv_of is not None:
            sv = sv_of(nodes_b)
            r = one_minus * sv + damping * (c + dang_total * sv)
        else:
            r = base + damping * (c + dang_total / n)
        return (nodes_b, outdeg_b, r)

    @ray.remote(num_cpus=1)
    def finish(state):
        nodes_b, _, rank_b = state
        return pa.table(
            {
                "node": pa.array(nodes_b, pa.int64()),
                "rank": pa.array(
                    round_sql_np(round_sql_np(rank_b, 9), round_to)
                ),
            }
        )

    keep_cols = [src, dst] + ([weight] if has_w else [])

    def project(t: pa.Table, kc=tuple(keep_cols)) -> pa.Table:
        return _drop_null_edges(t, src, dst).select(list(kc))

    deg_blocks = deg_ds.to_arrow_refs()
    ranks = _unwrap(split_deg.remote(*deg_blocks))
    eblocks = (
        ds_edges.map_batches(project, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    num_groups = max(
        1,
        min(len(eblocks), int(ray.cluster_resources().get("CPU", 8))),
    )
    parts = [
        _unwrap(split_edges.remote(*eblocks[g::num_groups]))
        for g in range(num_groups)
    ]
    bundles = [
        assemble.remote(ranks[b], *[p[b] for p in parts]) for b in range(B)
    ]
    for _ in range(iters):
        # outs[s] is a list of B partial refs + the dangling scalar ref
        # (num_returns = B+1 >= 2, so always a list, B == 1 included)
        outs = [contrib.remote(bundles[b], ranks[b]) for b in range(B)]
        dang_total = float(sum(ray.get([o[B] for o in outs])))
        ranks = [
            update.remote(ranks[b], dang_total, *[outs[s][b] for s in range(B)])
            for b in range(B)
        ]
    return rd.from_arrow_refs([finish.remote(r) for r in ranks])

def label_propagation(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    num_buckets: int = 8,
):
    """Deterministic semi-synchronous label propagation (the classic
    community-detection heuristic of Raghavan et al. 2007): every node
    starts labeled with its own id; each round every node adopts the
    label held by the MOST in-neighbors, ties to the SMALLEST label; a
    node with no labeled in-neighbors that round (possible on directed
    / non-symmetric edge lists) keeps its previous label.
    All nodes update simultaneously from the previous round's labels
    and the round count is FIXED, so the result is deterministic and
    exactly reproducible by an unrolled SQL oracle — no convergence
    dependence (plain LPA oscillates on bipartite graphs; a fixed
    horizon sidesteps that by construction).

    Raw-task bucket-exchange plan (round-5 — the pagerank rework
    applied here; the previous per-round bucketed_join + union +
    hash-bucket map_groups chain re-shuffled the edge list every
    round and measured 15.3 s at sf0.1 on an 855-node graph, all
    Dataset per-op overhead): the node universe is partitioned by
    node % B once (label + has-label state per bucket, dst-only nodes
    start unlabeled), edges are partitioned by src-bucket once with
    src→state positions and dst-bucket segmentation precomputed; each
    round runs B count tasks (labels of this bucket's srcs spread
    over their edges → per-(dst, label) integer counts, pre-split by
    dst bucket) and B update tasks (merge counts, winner = max count
    then min label, keep-previous fallback at count 0). Integer
    arithmetic end-to-end, so the output is EXACTLY the previous
    plan's (same winner rule, same count totals).

    Returns Dataset[(node:int64, community:int64)], community = the
    winning label after ``rounds`` rounds."""
    import ray.data as rd

    B = int(num_buckets)
    if B < 1:
        raise ValueError("label_propagation: num_buckets must be >= 1")

    edges = edges_ds.map_batches(
        lambda t, s=src, d=dst: _drop_null_edges(t, s, d).select([s, d]),
        batch_format="pyarrow",
    ).materialize()
    # NOTE: Ray drops zero-row blocks, so an empty Dataset loses its
    # schema downstream (to_pandas -> 0 columns); callers that need a
    # typed frame must handle the empty case themselves
    if edges.count() == 0:
        return rd.from_arrow(
            pa.schema(
                [("node", pa.int64()), ("community", pa.int64())]
            ).empty_table()
        )

    def _unwrap(refs):
        return [refs] if B == 1 else list(refs)

    @ray.remote(num_cpus=1, num_returns=B)
    def split_edges(*tbls):
        tbls = [t for t in tbls if src in t.column_names]
        if not tbls:
            e = np.empty(0, np.int64)
            out = tuple((e, e) for _ in range(B))
            return out if B > 1 else out[0]
        srcs = np.concatenate([_np_col(t, src) for t in tbls])
        dsts = np.concatenate([_np_col(t, dst) for t in tbls])
        b = srcs % B
        order = np.argsort(b, kind="stable")
        cuts = np.searchsorted(b[order], np.arange(B + 1))
        out = []
        for k in range(B):
            sl = slice(cuts[k], cuts[k + 1])
            out.append((srcs[order][sl], dsts[order][sl]))
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1, num_returns=B)
    def split_nodes(*tbls):
        # per NODE-bucket (node % B): the unique srcs and dsts landing
        # there — unlike split_edges (keyed by SRC bucket), this covers
        # dsts of edges whose src lives in ANY bucket
        tbls = [t for t in tbls if src in t.column_names]
        if not tbls:
            e = np.empty(0, np.int64)
            out = tuple((e, e) for _ in range(B))
            return out if B > 1 else out[0]
        srcs = np.concatenate([_np_col(t, src) for t in tbls])
        dsts = np.concatenate([_np_col(t, dst) for t in tbls])
        out = []
        for k in range(B):
            out.append(
                (
                    np.unique(srcs[srcs % B == k]),
                    np.unique(dsts[dsts % B == k]),
                )
            )
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1)
    def init_state(*parts):
        # node universe for this bucket; srcs start labeled with their
        # own id, dst-only nodes start UNLABELED (they adopt in round
        # 1 — the previous plan's labels table grew the same way)
        s_here = np.unique(np.concatenate([p[0] for p in parts]))
        d_here = np.unique(np.concatenate([p[1] for p in parts]))
        nodes = np.union1d(s_here, d_here)
        has = np.isin(nodes, s_here)
        return (nodes, nodes.copy(), has)

    @ray.remote(num_cpus=1)
    def assemble(state, *parts):
        # iteration-invariant: this src-bucket's edges grouped by dst
        # bucket, srcs as positions into the bucket's node array
        nodes_b = state[0]
        srcs = np.concatenate([p[0] for p in parts])
        dsts = np.concatenate([p[1] for p in parts])
        src_idx = np.searchsorted(nodes_b, srcs)
        db = dsts % B
        order = np.argsort(db, kind="stable")
        cuts = np.searchsorted(db[order], np.arange(B + 1))
        return (src_idx[order], dsts[order], cuts)

    @ray.remote(num_cpus=1, num_returns=B)
    def count_labels(bundle, state):
        # per-(dst, label) integer counts for every edge whose src
        # lives in this bucket, pre-split by dst bucket
        src_idx, dsts, cuts = bundle
        labs = state[1][src_idx]  # every src is labeled from round 0
        outs = []
        for k in range(B):
            sl = slice(cuts[k], cuts[k + 1])
            d, l = dsts[sl], labs[sl]
            if len(d):
                order = np.lexsort((l, d))
                d, l = d[order], l[order]
                new = np.ones(len(d), dtype=bool)
                new[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
                seg = np.cumsum(new) - 1
                cnt = np.bincount(seg).astype(np.int64)
                first = np.flatnonzero(new)
                outs.append((d[first], l[first], cnt))
            else:
                e = np.empty(0, np.int64)
                outs.append((e, e, e))
        return tuple(outs) if B > 1 else outs[0]

    @ray.remote(num_cpus=1)
    def update(state, *partials):
        nodes_b, label_b, has_b = state
        node = np.concatenate([p[0] for p in partials])
        lab = np.concatenate([p[1] for p in partials])
        cnt = np.concatenate([p[2] for p in partials])
        if len(node):
            # combine across src buckets, then per-node winner:
            # max count, tie to the SMALLEST label (same lexsort rule
            # as the previous plan's pick())
            order = np.lexsort((lab, node))
            node, lab, cnt = node[order], lab[order], cnt[order]
            new = np.ones(len(node), dtype=bool)
            new[1:] = (node[1:] != node[:-1]) | (lab[1:] != lab[:-1])
            seg = np.cumsum(new) - 1
            tot = np.bincount(seg, weights=cnt.astype(np.float64)).astype(
                np.int64
            )
            first = np.flatnonzero(new)
            snode, slab = node[first], lab[first]
            w = np.lexsort((slab, -tot, snode))
            lead = np.ones(len(w), dtype=bool)
            lead[1:] = snode[w][1:] != snode[w][:-1]
            win = w[lead]
            pos = np.searchsorted(nodes_b, snode[win])
            label_b = label_b.copy()
            has_b = has_b.copy()
            label_b[pos] = slab[win]
            has_b[pos] = True
        return (nodes_b, label_b, has_b)

    @ray.remote(num_cpus=1)
    def finish(state):
        nodes_b, label_b, has_b = state
        return pa.table(
            {
                "node": pa.array(nodes_b[has_b], pa.int64()),
                "community": pa.array(label_b[has_b], pa.int64()),
            }
        )

    eblocks = edges.to_arrow_refs()
    num_groups = max(
        1,
        min(len(eblocks), int(ray.cluster_resources().get("CPU", 8))),
    )
    parts = [
        _unwrap(split_edges.remote(*eblocks[g::num_groups]))
        for g in range(num_groups)
    ]
    node_parts = [
        _unwrap(split_nodes.remote(*eblocks[g::num_groups]))
        for g in range(num_groups)
    ]
    states = [
        init_state.remote(*[p[b] for p in node_parts]) for b in range(B)
    ]
    bundles = [
        assemble.remote(states[b], *[p[b] for p in parts]) for b in range(B)
    ]
    for _ in range(rounds):
        outs = [
            _unwrap(count_labels.remote(bundles[b], states[b]))
            for b in range(B)
        ]
        states = [
            update.remote(states[b], *[outs[s][b] for s in range(B)])
            for b in range(B)
        ]
    return rd.from_arrow_refs([finish.remote(st) for st in states])


def bfs_distance(
    edges_ds,
    seeds_ds,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
    num_buckets: int = 8,
):
    """Multi-source BFS hop distance: ``dist(node)`` = minimum number
    of directed edges from any seed node, relaxed for a FIXED number
    of rounds (unit-weight Bellman-Ford) — reachability / blast-radius
    analysis (which users sit within k hops of a flagged account, how
    far did an incident propagate). Nodes not reached within
    ``rounds`` hops are absent from the output. The fixed horizon
    makes the result exactly reproducible by an unrolled SQL oracle,
    like label_propagation / the CC oracle chain.

    Raw-task bucket-exchange plan (round-5, the pagerank/LPA rework):
    the node universe (srcs ∪ dsts ∪ seeds) is partitioned by node % B
    once, with per-bucket distance state (unreached = sentinel); the
    edges are partitioned by src-bucket once with src→state positions
    and dst-bucket segmentation precomputed. Each round runs B relax
    tasks (reached srcs spread dist+1 over their edges → per-dst min
    candidates, pre-split by dst bucket) and B update tasks
    (dist = min(dist, candidates)). Integer min end-to-end — EXACTLY
    the previous bucketed_join-per-round plan's output (which measured
    13.7 s at sf0.1 on an 855-node graph, all per-op overhead).

    ``seeds_ds``: Dataset with one int-castable column ``node``.
    Returns Dataset[(node:int64, dist:int64)]."""
    import ray.data as rd

    B = int(num_buckets)
    if B < 1:
        raise ValueError("bfs_distance: num_buckets must be >= 1")
    INF = np.int64(np.iinfo(np.int64).max // 2)

    edges = edges_ds.map_batches(
        lambda t, s=src, d=dst: _drop_null_edges(t, s, d).select([s, d]),
        batch_format="pyarrow",
    ).materialize()

    def seed_part(t: pa.Table) -> pa.Table:
        u = np.unique(_np_col(t, "node"))
        return pa.table({"node": pa.array(u)})

    seeds = (
        seeds_ds.map_batches(seed_part, batch_format="pyarrow")
        .groupby("node")
        .count()
        .materialize()
    )
    if seeds.count() == 0:
        return rd.from_arrow(
            pa.schema([("node", pa.int64()), ("dist", pa.int64())]).empty_table()
        )

    def _unwrap(refs):
        return [refs] if B == 1 else list(refs)

    @ray.remote(num_cpus=1, num_returns=B)
    def split_edges(*tbls):
        tbls = [t for t in tbls if src in t.column_names]
        if not tbls:
            e = np.empty(0, np.int64)
            out = tuple((e, e) for _ in range(B))
            return out if B > 1 else out[0]
        srcs = np.concatenate([_np_col(t, src) for t in tbls])
        dsts = np.concatenate([_np_col(t, dst) for t in tbls])
        b = srcs % B
        order = np.argsort(b, kind="stable")
        cuts = np.searchsorted(b[order], np.arange(B + 1))
        out = []
        for k in range(B):
            sl = slice(cuts[k], cuts[k + 1])
            out.append((srcs[order][sl], dsts[order][sl]))
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1, num_returns=B)
    def split_nodes(*tbls):
        tbls = [t for t in tbls if src in t.column_names]
        if not tbls:
            e = np.empty(0, np.int64)
            out = tuple(e for _ in range(B))
            return out if B > 1 else out[0]
        srcs = np.concatenate([_np_col(t, src) for t in tbls])
        dsts = np.concatenate([_np_col(t, dst) for t in tbls])
        out = []
        for k in range(B):
            out.append(
                np.unique(
                    np.concatenate(
                        [srcs[srcs % B == k], dsts[dsts % B == k]]
                    )
                )
            )
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1, num_returns=B)
    def split_seeds(*tbls):
        # a groupby can emit empty blocks with an EMPTY schema — skip
        # them (same guard as the ngram packed-exchange splitters)
        tbls = [t for t in tbls if "node" in t.column_names]
        if not tbls:
            out = tuple(np.empty(0, np.int64) for _ in range(B))
            return out if B > 1 else out[0]
        sd = np.concatenate([_np_col(t, "node") for t in tbls])
        out = []
        for k in range(B):
            out.append(np.unique(sd[sd % B == k]))
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1)
    def init_state(n_seed_parts, *parts):
        # flat *args so Ray dereferences every part (refs nested inside
        # tuples/lists arrive unresolved)
        seed_parts = parts[:n_seed_parts]
        node_parts = parts[n_seed_parts:] or (np.empty(0, np.int64),)
        sd = np.unique(np.concatenate(list(seed_parts)))
        nodes = np.union1d(
            np.unique(np.concatenate(list(node_parts))), sd
        )
        dist = np.full(len(nodes), INF, np.int64)
        dist[np.searchsorted(nodes, sd)] = 0
        return (nodes, dist)

    @ray.remote(num_cpus=1)
    def assemble(state, *parts):
        nodes_b = state[0]
        srcs = np.concatenate([p[0] for p in parts])
        dsts = np.concatenate([p[1] for p in parts])
        src_idx = np.searchsorted(nodes_b, srcs)
        db = dsts % B
        order = np.argsort(db, kind="stable")
        cuts = np.searchsorted(db[order], np.arange(B + 1))
        return (src_idx[order], dsts[order], cuts)

    @ray.remote(num_cpus=1, num_returns=B)
    def relax(bundle, state):
        # per-dst-bucket min candidate distance from this src bucket's
        # reached nodes
        src_idx, dsts, cuts = bundle
        cand_all = state[1][src_idx] + 1  # INF+1 stays >> any real dist
        outs = []
        for k in range(B):
            sl = slice(cuts[k], cuts[k + 1])
            d, c = dsts[sl], cand_all[sl]
            if len(d):
                order = np.lexsort((c, d))
                d, c = d[order], c[order]
                first = np.ones(len(d), dtype=bool)
                first[1:] = d[1:] != d[:-1]
                outs.append((d[first], c[first]))
            else:
                e = np.empty(0, np.int64)
                outs.append((e, e))
        return tuple(outs) if B > 1 else outs[0]

    @ray.remote(num_cpus=1)
    def update(state, *partials):
        nodes_b, dist_b = state
        node = np.concatenate([p[0] for p in partials])
        cand = np.concatenate([p[1] for p in partials])
        if len(node):
            dist_b = dist_b.copy()
            pos = np.searchsorted(nodes_b, node)
            np.minimum.at(dist_b, pos, cand)
        return (nodes_b, dist_b)

    @ray.remote(num_cpus=1)
    def finish(state):
        nodes_b, dist_b = state
        reached = dist_b < INF
        return pa.table(
            {
                "node": pa.array(nodes_b[reached], pa.int64()),
                "dist": pa.array(dist_b[reached], pa.int64()),
            }
        )

    eblocks = edges.to_arrow_refs()
    sblocks = seeds.to_arrow_refs()
    num_groups = max(
        1,
        min(max(len(eblocks), 1), int(ray.cluster_resources().get("CPU", 8))),
    )
    parts = (
        [
            _unwrap(split_edges.remote(*eblocks[g::num_groups]))
            for g in range(num_groups)
        ]
        if eblocks
        else []
    )
    node_parts = (
        [
            _unwrap(split_nodes.remote(*eblocks[g::num_groups]))
            for g in range(num_groups)
        ]
        if eblocks
        else []
    )
    seed_parts = [_unwrap(split_seeds.remote(*sblocks))]
    empty = np.empty(0, np.int64)
    states = [
        init_state.remote(
            len(seed_parts),
            *[p[b] for p in seed_parts],
            *[p[b] for p in node_parts],
        )
        for b in range(B)
    ]
    bundles = [
        assemble.remote(states[b], *([p[b] for p in parts] or [(empty, empty)]))
        for b in range(B)
    ]
    for _ in range(rounds):
        outs = [
            _unwrap(relax.remote(bundles[b], states[b])) for b in range(B)
        ]
        states = [
            update.remote(states[b], *[outs[s][b] for s in range(B)])
            for b in range(B)
        ]
    return rd.from_arrow_refs([finish.remote(st) for st in states])


def _canonical_edges(edges_ds, src: str, dst: str):
    """Canonicalize an undirected edge list: drop nulls and self-loops,
    orient each edge (u < v), exact-dedupe with one hash shuffle.
    Shared by triangle_count and modularity — one definition of "the
    edge set"."""

    def canon(t: pa.Table) -> pa.Table:
        t = _drop_null_edges(t, src, dst)
        a = pc.cast(t[src], pa.int64())
        b = pc.cast(t[dst], pa.int64())
        keep = pc.not_equal(a, b)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table(
            {"u": pc.min_element_wise(a, b), "v": pc.max_element_wise(a, b)}
        )

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1).select(["u", "v"])

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .map_groups(first, batch_format="pyarrow")
        .materialize()
    )


def triangle_count(edges_ds, src: str = "src", dst: str = "dst"):
    """Global triangle count over an undirected edge list — the graph-
    cohesion metric behind clustering coefficients and community
    quality. Input edges may carry either or both directions and
    duplicates; they are canonicalized (u < v) and deduped first.

    Node-iterator plan, fully distributed (no driver set, no broadcast):
    1. canonicalize + exact-dedupe edges (one hash shuffle);
    2. group edges by their MIN endpoint and emit each neighbor pair
       (v, w), v < w, as a wedge — every triangle is generated exactly
       once, at its minimum vertex;
    3. bucketed hash-join wedges against the edge set on the packed
       (v, w) key; the match count IS the triangle count.

    Skew note: wedge fan-out is O(degree²) at the min endpoint — a hub
    node inflates stage 2. Orienting by min-vertex already sends each
    triangle to its smallest id (the standard mitigation is degree
    ordering; plug a degree-rank remap upstream if hubs dominate).

    Returns Dataset with one row: {"triangles": int64}."""
    import ray.data as rd

    from vector_ray.stages.shuffle import bucketed_join

    edges = _canonical_edges(edges_ds, src, dst)

    def pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # the (v, w) join key packs two ids into one int64 — ids must
        # fit 32 unsigned bits or fields would bleed into each other
        bad = (a < 0) | (b < 0) | (a >= 2**32) | (b >= 2**32)
        if bad.any():
            raise ValueError(
                "triangle_count: node ids must be in [0, 2^32) for the "
                "packed join key — remap ids (e.g. dense rank) first"
            )
        return (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)

    def wedges(g: pa.Table) -> pa.Table:
        nb = np.sort(np.asarray(g["v"], dtype=np.int64))
        k = len(nb)
        if k < 2:
            return pa.table({"vw": pa.array([], pa.int64())})
        # all pairs (v, w), v < w, from the sorted neighbor list
        ii, jj = np.triu_indices(k, 1)
        return pa.table({"vw": pa.array(pack(nb[ii], nb[jj]))})

    wedge_ds = edges.groupby("u").map_groups(wedges, batch_format="pyarrow")

    def key_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vw": pa.array(
                    pack(
                        np.asarray(t["u"], dtype=np.int64),
                        np.asarray(t["v"], dtype=np.int64),
                    )
                ),
                "__e": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    closing = bucketed_join(
        wedge_ds,
        edges.map_batches(key_edges, batch_format="pyarrow"),
        key="vw",
        num_buckets=16,
        how="inner",
    )
    n = closing.count()
    return rd.from_arrow(
        pa.table({"triangles": pa.array([n], pa.int64())})
    )


def modularity(edges_ds, labels_ds, src: str = "src", dst: str = "dst"):
    """Newman modularity Q of a node partition over an undirected graph:
    Q = Σ_c [ e_c/m − (d_c/(2m))² ] with e_c = intra-community edge
    count, d_c = summed degree of the community, m = distinct undirected
    edges — the standard score for judging a community assignment
    (``label_propagation``'s output plugs straight in).

    Plan: canonicalize+dedupe edges (one shuffle), two bucketed joins
    stick each endpoint's community onto the edge list, then per-block
    partials feed two tiny per-community aggregates (intra-edges and
    degree). The Q sum itself runs over ONE row per community on the
    driver with per-term round-9 pinning, so the result is partition-
    invariant and SQL-reproducible.

    ``labels_ds``: Dataset[(node, community)]. Nodes missing a label
    count as their own singleton community (matches LPA, which labels
    every node). Returns a one-row Dataset {"modularity": float64}."""
    import ray.data as rd

    from vector_ray.stages.shuffle import bucketed_join

    edges = _canonical_edges(edges_ds, src, dst)
    m = edges.count()
    if m == 0:
        return rd.from_arrow(
            pa.table({"modularity": pa.array([0.0], pa.float64())})
        )

    lab = labels_ds.map_batches(
        lambda t: pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "community": pc.cast(t["community"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def key_u(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "v"])

    def key_v(t: pa.Table) -> pa.Table:
        return t.rename_columns(["u", "node"])

    with_cu = bucketed_join(
        edges.map_batches(key_u, batch_format="pyarrow"),
        lab.map_batches(
            lambda t: t.rename_columns(["node", "__cu"]),
            batch_format="pyarrow",
        ),
        key="node",
        num_buckets=16,
        how="left",
    ).map_batches(
        lambda t: t.rename_columns(
            ["u" if c == "node" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    both = bucketed_join(
        with_cu.map_batches(
            lambda t: t.rename_columns(
                ["node" if c == "v" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        ),
        lab.map_batches(
            lambda t: t.rename_columns(["node", "__cv"]),
            batch_format="pyarrow",
        ),
        key="node",
        num_buckets=16,
        how="left",
    )

    def partials(t: pa.Table) -> pa.Table:
        # unlabeled nodes = singleton communities: substitute -node-1
        # (never collides with a real label and never matches another
        # node's substitute... except the same node on both ends, which
        # canon() already excluded)
        u = _np_col(t, "u")
        v = _np_col(t, "node")
        # float64 via cast: nulls (unlabeled nodes) become NaN even when
        # a block happens to have none
        cu = np.asarray(pc.cast(t["__cu"].combine_chunks(), pa.float64()))
        cv = np.asarray(pc.cast(t["__cv"].combine_chunks(), pa.float64()))
        cu = np.where(np.isnan(cu), -u.astype(np.float64) - 1, cu).astype(np.int64)
        cv = np.where(np.isnan(cv), -v.astype(np.float64) - 1, cv).astype(np.int64)
        # degree partial: each endpoint adds 1 to its community
        dc = np.concatenate([cu, cv])
        ud, dcount = np.unique(dc, return_counts=True)
        # intra partial: edge counts where both ends share a community
        same = cu == cv
        ui, icount = np.unique(cu[same], return_counts=True)
        return pa.table(
            {
                "community": pa.array(np.concatenate([ud, ui])),
                "deg": pa.array(
                    np.concatenate([dcount, np.zeros(len(ui), np.int64)])
                ),
                "intra": pa.array(
                    np.concatenate([np.zeros(len(ud), np.int64), icount])
                ),
            }
        )

    per_c = (
        both.map_batches(partials, batch_format="pyarrow")
        .groupby("community")
        .sum(["deg", "intra"])
        .map_batches(
            lambda t: t.rename_columns(["community", "deg", "intra"]),
            batch_format="pyarrow",
        )
    )

    def q_part(t: pa.Table) -> pa.Table:
        deg = _np_col(t, "deg", np.float64)
        intra = _np_col(t, "intra", np.float64)
        mm = float(m)
        terms = round_sql_np(
            intra / mm - (deg / (2.0 * mm)) ** 2, 9
        )
        return pa.table({"q": pa.array([float(terms.sum())], pa.float64())})

    total = (
        per_c.map_batches(q_part, batch_format="pyarrow").sum("q") or 0.0
    )
    return rd.from_arrow(
        pa.table(
            {
                "modularity": pa.array(
                    [float(round_sql_np(round_sql_np(total, 9), 6))],
                    pa.float64(),
                )
            }
        )
    )


def kcore(
    edges_ds,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
    num_buckets: int = 8,
):
    """k-core decomposition by iterative peeling for a FIXED number of
    rounds: repeatedly delete nodes of simple-graph degree < k and
    every edge touching them — the dense-backbone extractor behind
    spam-ring mining and graph sparsification (a node survives the
    true k-core iff it survives peeling to a fixpoint; the fixed
    horizon makes the result exactly reproducible by an unrolled SQL
    oracle, like label_propagation / bfs_distance).

    Input may carry duplicates, self-loops, and either or both edge
    directions; it is canonicalized via ``_canonical_edges`` (u < v,
    exact-dedupe, one hash shuffle) and then symmetrized, so degree =
    number of DISTINCT neighbors on both sides.

    Raw-task plan (round-5, the pagerank/LPA/BFS rework): peeling is
    pure alive-flag algebra — alive'(v) = alive(v) AND (# alive
    neighbors >= k) — so after the symmetric edge set is partitioned
    by src-bucket ONCE (with neighbor positions into every bucket's
    node array precomputed), each round is just B tasks that read the
    B small alive vectors and update their own; NO per-round edge
    shuffle, no Dataset ops in the loop (the previous
    two-semi-joins-plus-degree-groupby round measured 10.5 s at sf0.1
    on a 1,530-node graph, all per-op overhead). Integer threshold
    logic end-to-end — exactly the previous plan's output: alive_0 =
    every node; E_r = edges with both endpoints alive_r; alive_{r+1}
    = deg over E_r >= k; result = degrees over E_rounds (nodes with
    >= 1 surviving edge).

    Scale note: per round each of the B tasks reads every bucket's
    alive vector — B × N bool bytes of object-store traffic per round
    (5 MB × 8 at 5M nodes; at ~10⁹ nodes switch the flags to
    ``np.packbits`` bitmaps for an 8× cut before raising B).

    Returns Dataset[(node:int64, deg:int64)]: the degree of every
    surviving node in the ``rounds``-times-peeled subgraph (empty when
    the whole graph peels away)."""
    import ray.data as rd

    B = int(num_buckets)
    if B < 1:
        raise ValueError("kcore: num_buckets must be >= 1")

    und = _canonical_edges(edges_ds, src, dst)

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [c for col in (t["u"], t["v"]) for c in pc.cast(col, pa.int64()).chunks]
                    or [pa.array([], pa.int64())]
                ),
                "dst": pa.concat_arrays(
                    [c for col in (t["v"], t["u"]) for c in pc.cast(col, pa.int64()).chunks]
                    or [pa.array([], pa.int64())]
                ),
            }
        )

    edges = und.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.schema([("node", pa.int64()), ("deg", pa.int64())]).empty_table()
        )

    def _unwrap(refs):
        return [refs] if B == 1 else list(refs)

    @ray.remote(num_cpus=1, num_returns=B)
    def split_edges(*tbls):
        tbls = [t for t in tbls if "src" in t.column_names]
        if not tbls:
            e = np.empty(0, np.int64)
            out = tuple((e, e) for _ in range(B))
            return out if B > 1 else out[0]
        srcs = np.concatenate([_np_col(t, "src") for t in tbls])
        dsts = np.concatenate([_np_col(t, "dst") for t in tbls])
        b = srcs % B
        order = np.argsort(b, kind="stable")
        cuts = np.searchsorted(b[order], np.arange(B + 1))
        out = []
        for q in range(B):
            sl = slice(cuts[q], cuts[q + 1])
            out.append((srcs[order][sl], dsts[order][sl]))
        return tuple(out) if B > 1 else out[0]

    @ray.remote(num_cpus=1)
    def bucket_nodes(*parts):
        # symmetric edges: every node with an edge appears as src
        arrs = [p[0] for p in parts if len(p[0])]
        return (
            np.unique(np.concatenate(arrs))
            if arrs
            else np.empty(0, np.int64)
        )

    @ray.remote(num_cpus=1)
    def assemble(bucket_id, *nodes_and_parts):
        # args: B per-bucket node arrays, then this bucket's edge parts
        all_nodes = nodes_and_parts[:B]
        parts = nodes_and_parts[B:]
        nodes_b = all_nodes[bucket_id]
        srcs = np.concatenate([p[0] for p in parts])
        dsts = np.concatenate([p[1] for p in parts])
        src_idx = np.searchsorted(nodes_b, srcs)
        db = dsts % B
        order = np.argsort(db, kind="stable")
        cuts = np.searchsorted(db[order], np.arange(B + 1))
        src_idx = src_idx[order]
        dsts = dsts[order]
        # neighbor positions into EVERY bucket's node array — the
        # iteration-invariant part of the alive lookup
        dpos = tuple(
            np.searchsorted(all_nodes[q], dsts[cuts[q]:cuts[q + 1]])
            for q in range(B)
        )
        return (src_idx, cuts, dpos)

    @ray.remote(num_cpus=1)
    def step(bundle, nodes_b, alive_b, kk, *alive_all):
        # alive'(v) = alive(v) AND (# alive neighbors >= k)
        src_idx, cuts, dpos = bundle
        nbr_alive = np.concatenate(
            [
                alive_all[q][dpos[q]]
                if len(dpos[q])
                else np.empty(0, bool)
                for q in range(B)
            ]
        )
        deg = np.bincount(
            src_idx,
            weights=nbr_alive.astype(np.float64),
            minlength=len(nodes_b),
        ).astype(np.int64)
        return alive_b & (deg >= kk)

    @ray.remote(num_cpus=1)
    def finish(bundle, nodes_b, alive_b, *alive_all):
        src_idx, cuts, dpos = bundle
        nbr_alive = np.concatenate(
            [
                alive_all[q][dpos[q]]
                if len(dpos[q])
                else np.empty(0, bool)
                for q in range(B)
            ]
        )
        deg = np.bincount(
            src_idx,
            weights=nbr_alive.astype(np.float64),
            minlength=len(nodes_b),
        ).astype(np.int64)
        deg = np.where(alive_b, deg, 0)
        keep = deg >= 1
        return pa.table(
            {
                "node": pa.array(nodes_b[keep], pa.int64()),
                "deg": pa.array(deg[keep], pa.int64()),
            }
        )

    eblocks = edges.to_arrow_refs()
    num_groups = max(
        1, min(len(eblocks), int(ray.cluster_resources().get("CPU", 8)))
    )
    parts = [
        _unwrap(split_edges.remote(*eblocks[g::num_groups]))
        for g in range(num_groups)
    ]
    nodes_refs = [
        bucket_nodes.remote(*[p[b] for p in parts]) for b in range(B)
    ]
    bundles = [
        assemble.remote(b, *nodes_refs, *[p[b] for p in parts])
        for b in range(B)
    ]
    alive = [
        _ones_like_nodes.remote(nodes_refs[b]) for b in range(B)
    ]
    for _ in range(rounds):
        alive = [
            step.remote(bundles[b], nodes_refs[b], alive[b], int(k), *alive)
            for b in range(B)
        ]
    return rd.from_arrow_refs(
        [
            finish.remote(bundles[b], nodes_refs[b], alive[b], *alive)
            for b in range(B)
        ]
    )


@ray.remote(num_cpus=1)
def _ones_like_nodes(nodes):
    return np.ones(len(nodes), dtype=bool)


def adamic_adar(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    round_to: int = 6,
    max_degree: int | None = None,
    num_buckets: int = 16,
):
    """Adamic-Adar link prediction over an undirected edge list: for
    every non-adjacent node pair (a, b) sharing at least ``min_common``
    neighbors, score(a, b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z)) — the
    classic "which links are missing" ranking (recommendation,
    record-linkage candidate boost): a rare shared neighbor says more
    than a popular one.

    Fully distributed node-iterator plan (same family as
    ``triangle_count``):
    1. canonicalize + exact-dedupe edges (one hash shuffle);
    2. symmetric adjacency, grouped by the CENTER node z: every
       neighbor pair (a < b) becomes a wedge carrying z's weight
       1/ln(deg(z)) — deg(z) is simply the group size (edges are
       already distinct), so no degree join is needed;
    3. one groupby on the packed (a, b) key sums wedge weights and
       counts common neighbors;
    4. existing edges are removed with a bucketed ANTI join against
       the canonical edge set (link PREDICTION scores absent links).

    Skew note: wedge fan-out is O(degree²) at the center — a hub
    inflates stage 2 while contributing ~nothing per wedge
    (1/ln(deg) → 0). ``max_degree`` drops centers above the cap and
    LOGS how many were dropped (no silent truncation); leave None for
    exact parity with the SQL oracle.

    Returns Dataset[(node_a:int64, node_b:int64, n_common:int64,
    score:float64)]."""
    import ray.data as rd

    from vector_ray.schema import round_sql_np
    from vector_ray.stages.shuffle import bucketed_join

    edges = _canonical_edges(edges_ds, src, dst)

    def adj(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"], dtype=np.int64)
        v = np.asarray(t["v"], dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v])),
                "nbr": pa.array(np.concatenate([v, u])),
            }
        )

    def pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        bad = (a < 0) | (b < 0) | (a >= 2**32) | (b >= 2**32)
        if bad.any():
            raise ValueError(
                "adamic_adar: node ids must be in [0, 2^32) for the "
                "packed pair key — remap ids (e.g. dense rank) first"
            )
        return (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)

    dropped = []

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ab": pa.array([], pa.int64()), "w": pa.array([], pa.float64())}
        )
        nb = np.sort(np.asarray(g["nbr"], dtype=np.int64))
        d = len(nb)
        if d < 2:
            return empty
        if max_degree is not None and d > max_degree:
            # logged drop, never silent: the caller sees how many hub
            # centers were skipped in the Ray logs
            print(
                f"adamic_adar: dropping center {g['node'][0].as_py()} "
                f"(degree {d} > max_degree {max_degree})"
            )
            return empty
        w = 1.0 / np.log(float(d))
        ii, jj = np.triu_indices(d, 1)
        return pa.table(
            {
                "ab": pa.array(pack(nb[ii], nb[jj])),
                "w": pa.array(np.full(len(ii), w, np.float64)),
            }
        )

    wedge_ds = (
        edges.map_batches(adj, batch_format="pyarrow")
        .groupby("node")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def combine(t: pa.Table) -> pa.Table:
        # per-block combiner: one row per distinct pair crosses the
        # final groupby
        ab = np.asarray(t["ab"], dtype=np.int64)
        w = np.asarray(t["w"], dtype=np.float64)
        uniq, inv = np.unique(ab, return_inverse=True)
        return pa.table(
            {
                "ab": pa.array(uniq),
                "score": pa.array(np.bincount(inv, weights=w)),
                "n_common": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    scored = (
        wedge_ds.map_batches(combine, batch_format="pyarrow")
        .groupby("ab")
        .sum(["score", "n_common"])
        .map_batches(
            lambda t: t.rename_columns(["ab", "score", "n_common"]),
            batch_format="pyarrow",
        )
    )
    if min_common > 1:
        scored = scored.filter(expr=f"n_common >= {min_common}")

    def key_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ab": pa.array(
                    pack(
                        np.asarray(t["u"], dtype=np.int64),
                        np.asarray(t["v"], dtype=np.int64),
                    )
                )
            }
        )

    non_edges = bucketed_join(
        scored,
        edges.map_batches(key_edges, batch_format="pyarrow"),
        key="ab",
        num_buckets=num_buckets,
        how="anti",
    )

    def unpack(t: pa.Table) -> pa.Table:
        ab = np.asarray(t["ab"], dtype=np.int64)
        sc = round_sql_np(
            np.asarray(t["score"], dtype=np.float64), round_to
        )
        return pa.table(
            {
                "node_a": pa.array(ab >> np.int64(32)),
                "node_b": pa.array(ab & np.int64(0xFFFFFFFF)),
                "n_common": t["n_common"],
                "score": pa.array(sc, pa.float64()),
            }
        )

    return non_edges.map_batches(unpack, batch_format="pyarrow")


def jaccard_linkpred(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    round_to: int = 6,
    num_buckets: int = 16,
):
    """Jaccard-coefficient link prediction over an undirected edge
    list: for every non-adjacent pair (a, b) with at least
    ``min_common`` shared neighbors, score(a, b) =
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — the neighborhood-overlap
    recommender (record-linkage blocking, friend suggestion). The
    complement of Adamic-Adar (``adamic_adar`` above): AA weights rare
    shared neighbors, Jaccard normalizes by how social both endpoints
    are, so hubs stop dominating.

    Distributed plan (all stages stream, nothing touches the driver):
    1. canonicalize + dedupe edges (one hash shuffle,
       ``_canonical_edges``);
    2. wedge counting at the center node (same node-iterator family as
       ``triangle_count``): groupby(center) emits each neighbor pair
       (a < b) once; a packed-64-bit-pair groupby counts common
       neighbors n_common;
    3. degrees come from a per-block combiner + one small groupby over
       the symmetric adjacency (node, deg) — no driver collection;
    4. two ``bucketed_join`` hash joins attach deg_a / deg_b to the
       surviving pairs (pairs are the small side after the
       ``min_common`` filter);
    5. existing edges are anti-joined away; jaccard =
       n_common / (deg_a + deg_b - n_common).

    Skew note: like all node-iterator wedge plans, a degree-d hub
    center emits O(d²) wedges; Jaccard scores of hub-adjacent pairs
    are tiny by construction, so cap-and-log via ``adamic_adar``'s
    ``max_degree`` pattern if a corpus has extreme hubs (left exact
    here for oracle parity).

    Returns Dataset[(node_a:int64, node_b:int64, n_common:int64,
    deg_a:int64, deg_b:int64, jaccard:float64)]."""
    from vector_ray.schema import round_sql_np
    from vector_ray.stages.shuffle import bucketed_join

    edges = _canonical_edges(edges_ds, src, dst)

    def adj(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"], dtype=np.int64)
        v = np.asarray(t["v"], dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v])),
                "nbr": pa.array(np.concatenate([v, u])),
            }
        )

    adj_ds = edges.map_batches(adj, batch_format="pyarrow")

    def pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        bad = (a < 0) | (b < 0) | (a >= 2**32) | (b >= 2**32)
        if bad.any():
            raise ValueError(
                "jaccard_linkpred: node ids must be in [0, 2^32) for "
                "the packed pair key — dense-rank remap ids first"
            )
        return (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)

    def wedges(g: pa.Table) -> pa.Table:
        nb = np.sort(np.asarray(g["nbr"], dtype=np.int64))
        if len(nb) < 2:
            return pa.table({"ab": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(nb), 1)
        return pa.table({"ab": pa.array(pack(nb[ii], nb[jj]))})

    def combine(t: pa.Table) -> pa.Table:
        ab = np.asarray(t["ab"], dtype=np.int64)
        uniq, cnt = np.unique(ab, return_counts=True)
        return pa.table(
            {"ab": pa.array(uniq), "n_common": pa.array(cnt.astype(np.int64))}
        )

    scored = (
        adj_ds.groupby("node")
        .map_groups(wedges, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow")
        .groupby("ab")
        .sum("n_common")
        .map_batches(
            lambda t: t.rename_columns(["ab", "n_common"]),
            batch_format="pyarrow",
        )
    )
    if min_common > 1:
        scored = scored.filter(expr=f"n_common >= {min_common}")

    # degenerate graph (no wedges at all): the grouped dataset is
    # schemaless and bucketed_join needs one — return a typed empty
    # result (schema() here is free: the join would force it anyway)
    if scored.schema() is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "node_a": pa.array([], pa.int64()),
                    "node_b": pa.array([], pa.int64()),
                    "n_common": pa.array([], pa.int64()),
                    "deg_a": pa.array([], pa.int64()),
                    "deg_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    def key_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ab": pa.array(
                    pack(
                        np.asarray(t["u"], dtype=np.int64),
                        np.asarray(t["v"], dtype=np.int64),
                    )
                )
            }
        )

    pairs = bucketed_join(
        scored,
        edges.map_batches(key_edges, batch_format="pyarrow"),
        key="ab",
        num_buckets=num_buckets,
        how="anti",
    )

    def unpack(t: pa.Table) -> pa.Table:
        ab = np.asarray(t["ab"], dtype=np.int64)
        return pa.table(
            {
                "node_a": pa.array(ab >> np.int64(32)),
                "node_b": pa.array(ab & np.int64(0xFFFFFFFF)),
                "n_common": t["n_common"],
            }
        )

    pairs = pairs.map_batches(unpack, batch_format="pyarrow")

    def deg_part(t: pa.Table) -> pa.Table:
        nodes = np.asarray(t["node"], dtype=np.int64)
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(uniq), "deg": pa.array(cnt.astype(np.int64))}
        )

    deg = (
        adj_ds.map_batches(deg_part, batch_format="pyarrow")
        .groupby("node")
        .sum("deg")
        .map_batches(
            lambda t: t.rename_columns(["node", "deg"]),
            batch_format="pyarrow",
        )
    )
    deg_a = deg.map_batches(
        lambda t: t.rename_columns(["node_a", "deg_a"]), batch_format="pyarrow"
    )
    deg_b = deg.map_batches(
        lambda t: t.rename_columns(["node_b", "deg_b"]), batch_format="pyarrow"
    )
    pairs = bucketed_join(pairs, deg_a, key="node_a", num_buckets=num_buckets)
    pairs = bucketed_join(pairs, deg_b, key="node_b", num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        nc = np.asarray(t["n_common"], dtype=np.float64)
        da = np.asarray(t["deg_a"], dtype=np.float64)
        db = np.asarray(t["deg_b"], dtype=np.float64)
        j = round_sql_np(nc / (da + db - nc), round_to)
        return pa.table(
            {
                "node_a": t["node_a"],
                "node_b": t["node_b"],
                "n_common": t["n_common"],
                "deg_a": t["deg_a"],
                "deg_b": t["deg_b"],
                "jaccard": pa.array(j, pa.float64()),
            }
        )

    return pairs.map_batches(score, batch_format="pyarrow")
