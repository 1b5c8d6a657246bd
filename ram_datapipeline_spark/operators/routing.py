"""Partitioned (CRP-style) routing: many-to-many shortest paths on road
networks too large for an all-pairs closure (SURVEY U1/U4 at country scale).

The reference contracts a full OSM extract offline (``osrm-extract`` +
``osrm-contract``, scripts/osm2osrm.sh:32-33) and answers ``osrm.table``
many-to-many calls over the contracted hierarchy (app/calculate-eta/
tasks.js:260). The hub closure in operators/graph.py is the exact in-engine
analog for SMALL graphs, but it is all-pairs: V×V closure rows — fine for
hub cores (≤512 verts, its documented gate), infeasible on a country
extract (10⁶⁺ nodes). This module is the scale path (VERDICT r3 next-round
#5): the customizable-route-planning (CRP / partition-based CH) shape,
re-expressed as Spark stages:

1. **Cell partition.** Every node gets a cell id (grid tiling or any
   deterministic function). Edges split into in-cell and inter-cell.
2. **Per-cell exact closure** — the data-parallel heavy step. Each cell's
   subgraph is independent: ``groupBy(cell).applyInPandas`` runs a dense
   min-plus squaring per cell (⌈log2(cell_nodes)⌉ rounds, numpy int64).
   Output stays DISTRIBUTED: Σ n_c² rows ≈ V·n_c, linear-ish in V.
3. **Boundary overlay** — the contracted core. Boundary nodes (endpoints
   of inter-cell edges) + overlay edges (inter-cell edges ∪ in-cell
   boundary→boundary closure rows). Size O(V / √n_c · n_c-perimeter) —
   the CRP overlay, collected + broadcast exactly like the reference
   holds its contracted ``.osrm`` core in memory. NOT V×V and NOT a
   function of |origins|·|destinations|.
4. **Multi-source relaxation on the overlay**: a fixed number of
   Bellman-Ford rounds over the overlay edge list, vectorized in ONE
   numpy kernel over the dense (n_sources × n_boundary) state (int64;
   ``np.minimum.at`` is an unordered elementwise min, so the result is
   a pure function of the round count — replayable row-for-row by a SQL
   engine running the same rounds). A convergence probe round asserts
   the fixed round count reached the fixed point, so the bounded-round
   replay IS the exact distance.
5. **Entry/exit legs** are distributed joins against the per-cell closure
   rows; the same-cell direct term is a third join. Final distances are
   min over the three-leg decomposition — EXACT, by the standard CRP
   argument: any shortest path decomposes at its cell-boundary crossings
   into maximal within-cell segments, each of which is a within-cell
   shortest path between boundary nodes (or source/target), all of which
   the overlay ∪ in-cell closures contain.

Weights are **integers** (seconds): every min-plus sum is integer-exact,
so cross-engine replay has no floating-point caveats at all.

Scale notes (100 TB / planet-sized extract): steps 1, 2, 5 shuffle on
cell / node ids only — no all-pairs anything, no driver-side V-sized
state. Step 3-4's overlay for a planet extract at 10⁴-node cells is
~10⁵-10⁶ rows — the same memory class the reference's contracted planet
``.osrm`` occupies (tens of GB for planet; per-country far less), held
once per executor via broadcast, not per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ram_datapipeline_spark.session import local_rows_df

# Unreachable sentinel for int64 min-plus: large enough to never be a real
# distance, small enough that sentinel + sentinel cannot overflow int64.
INF_I64 = 1 << 40


def _kernel_partitions(df: DataFrame) -> int:
    """Explicit partition count for the per-cell numpy kernels (guide
    §2.5: partition by WORK, not bytes). The in-cell edge rows feeding a
    closure kernel are tiny in BYTES (a planet cell is ≤ MAX_CELL_NODES
    nodes), so AQE coalesces the grouped-map exchange to ~1 partition —
    measured as a single 2.4 s task carrying ALL 256 cells' closures at
    sf0.1 (r14 joblog) — while the per-cell WORK is n³. An explicit
    repartition pins the exchange width, which AQE honors because it is
    a user repartition.

    Width: defaultParallelism/4 — every grouped-map task pays a fixed
    Python-worker + Arrow round-trip cost (~0.3-0.9 s measured), so
    packing ≥4 cells per task amortizes it while keeping the kernel
    parallel; the r14 sweep on the planet fixture measured widths
    {1: 17.0-18.7 s, 4: 15.7-17.1, 8: 14.7-14.9, 32: 18.1-18.8}.
    Scale-adaptive (derived from the session's parallelism, so a real
    cluster gets cores/4 kernel tasks, each still bounded by
    MAX_CELL_NODES² state per group) and overridable for deployments
    whose per-cell work is heavy enough to want full width:
    $SPARK_GRAFT_KERNEL_PARTS."""
    import os

    probe = os.environ.get("SPARK_GRAFT_KERNEL_PARTS")
    if probe:
        return max(1, int(probe))
    return max(1, df.sparkSession.sparkContext.defaultParallelism // 4)

# Per-cell closure runs a dense n³ numpy squaring; this caps the memory a
# single cell may demand (n³ · 8 bytes — 256³ = 128 MiB of temp, bounded
# even with a full executor's worth of concurrent cell tasks). Partition
# the network into smaller cells rather than raising it.
MAX_CELL_NODES = 256

# Collected overlay rows are the broadcast "contracted core"; beyond this
# the partition is too coarse (use smaller cells → smaller per-cell
# perimeter → fewer overlay rows) or a second overlay level is needed
# (``two_level_many_to_many``).
MAX_OVERLAY_ROWS = 5_000_000

# The seed legs and the relaxed (n_sources × n_boundary) overlay-distance
# state both pass through the driver (the osrm.table working set). They
# are tiny under min-fusion — group sources sharing an output key into ONE
# multi-node source (every downstream step is min-plus, so per-group
# minima commute; see q_eta_routed_osm_large) — but per-origin sources on
# a big extract would silently build GBs of driver state. Gate both, with
# the fusion hint in the message (VERDICT r4 "what's wrong" #3).
MAX_SEED_ROWS = 2_000_000
MAX_OVERLAY_STATE = 100_000_000  # n_sources × n_boundary int64 cells (800 MB)


def in_cell_closures(
    edges: DataFrame,
    cells: DataFrame,
    n_squarings: int,
) -> DataFrame:
    """Exact per-cell all-pairs closure: (cell, src, dst, w) for every
    ordered node pair of each cell connected WITHIN the cell (diagonal
    included, w=0).

    ``edges``: directed (src, dst, w:int). ``cells``: (node_id, cell).
    Only edges with both endpoints in the same cell participate. Each
    cell is closed independently by ``n_squarings`` dense min-plus
    squarings (exact for in-cell paths of ≤ 2**n_squarings edges — use
    ⌈log2(max cell node count − 1)⌉). One shuffle on cell; per-cell work
    is a numpy kernel — the embarrassingly parallel step that carries
    the data-scale cost.
    """
    sc = cells.select(F.col("node_id").alias("src"), F.col("cell"))
    dc = cells.select(
        F.col("node_id").alias("dst"), F.col("cell").alias("_dcell")
    )
    ice = (
        edges.join(sc, "src")
        .join(dc, "dst")
        .where(F.col("cell") == F.col("_dcell"))
        .select("cell", "src", "dst", "w")
    )

    def close(pdf):
        import numpy as np
        import pandas as pd

        nodes = sorted(set(pdf["src"]) | set(pdf["dst"]))
        n = len(nodes)
        if n > MAX_CELL_NODES:
            raise ValueError(
                f"in_cell_closures: cell {int(pdf['cell'].iloc[0])} has "
                f"{n} nodes > MAX_CELL_NODES={MAX_CELL_NODES}; use a "
                "finer partition"
            )
        ix = {v: i for i, v in enumerate(nodes)}
        d = np.full((n, n), INF_I64, dtype=np.int64)
        np.fill_diagonal(d, 0)
        si = pdf["src"].map(ix).to_numpy()
        di = pdf["dst"].map(ix).to_numpy()
        np.minimum.at(d, (si, di), pdf["w"].to_numpy(dtype=np.int64))
        for _ in range(n_squarings):
            nxt = (d[:, :, None] + d[None, :, :]).min(axis=1)
            if np.array_equal(nxt, d):
                d = nxt
                break
            d = nxt
        else:
            # ran all rounds without reaching a fixed point: probe once
            # more — an under-specified n_squarings must fail loudly
            # instead of returning bounded-hop overestimates (the same
            # guard the overlay relaxation carries)
            probe = (d[:, :, None] + d[None, :, :]).min(axis=1)
            if not np.array_equal(probe, d):
                raise ValueError(
                    f"in_cell_closures: cell {int(pdf['cell'].iloc[0])} "
                    f"not closed after {n_squarings} squarings — use "
                    "ceil(log2(max cell node count - 1))"
                )
        s_idx, d_idx = np.nonzero(d < INF_I64)
        arr = np.asarray(nodes, dtype=np.int64)
        return pd.DataFrame(
            {
                "cell": np.full(len(s_idx), int(pdf["cell"].iloc[0]),
                                dtype=np.int64),
                "src": arr[s_idx],
                "dst": arr[d_idx],
                "w": d[s_idx, d_idx],
            }
        )

    # pin the grouped-map exchange width (see _kernel_partitions): the
    # exchange moves the same in-cell edge rows either way, but the n³
    # closure kernels then run groupBy-width-parallel instead of inside
    # one AQE-coalesced task
    return (
        ice.repartition(_kernel_partitions(ice), "cell")
        .groupBy("cell")
        .applyInPandas(close, schema="cell long, src long, dst long, w long")
    )


def inter_cell_edges(edges: DataFrame, cells: DataFrame) -> DataFrame:
    """Edges whose endpoints lie in different cells: (src, dst, w,
    src_cell, dst_cell)."""
    sc = cells.select(F.col("node_id").alias("src"),
                      F.col("cell").alias("src_cell"))
    dc = cells.select(F.col("node_id").alias("dst"),
                      F.col("cell").alias("dst_cell"))
    return (
        edges.join(sc, "src")
        .join(dc, "dst")
        .where(F.col("src_cell") != F.col("dst_cell"))
        .select("src", "dst", "w", "src_cell", "dst_cell")
    )


def overlay_rows(
    incell: DataFrame,
    inter: DataFrame,
    max_overlay_rows: int = MAX_OVERLAY_ROWS,
) -> list[tuple[int, int, int]]:
    """Collect the CRP overlay edge list: inter-cell edges ∪ in-cell
    boundary→boundary closure rows (src ≠ dst). Boundary nodes are the
    endpoints of inter-cell edges. The collect is the contracted-core
    broadcast (see module docstring) — gated by MAX_OVERLAY_ROWS."""
    b = (
        inter.select(F.col("src").alias("node_id"))
        .union(inter.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    bb = (
        incell.join(b.withColumnRenamed("node_id", "src"), "src")
        .join(b.withColumnRenamed("node_id", "dst"), "dst")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "w")
    )
    ovl = inter.select("src", "dst", "w").union(bb)
    # gate + collect in ONE evaluation: pull at most MAX+1 rows — a
    # separate count() would run the whole overlay subplan twice
    rows = ovl.limit(max_overlay_rows + 1).collect()
    if len(rows) > max_overlay_rows:
        raise ValueError(
            f"overlay_rows: > {max_overlay_rows} (max_overlay_rows) "
            "overlay rows; partition with smaller cells or add an "
            "overlay level"
        )
    return [(r["src"], r["dst"], r["w"]) for r in rows]


def multi_source_overlay_dist(
    ovl: list[tuple[int, int, int]],
    seed_rows: list[tuple[int, int, int]],
    n_rounds: int,
    check_converged: bool = True,
) -> list[tuple[int, int, int]]:
    """Fixed-round multi-source Bellman-Ford over the overlay edge list.

    ``ovl``: [(src, dst, w)] overlay edges. ``seed_rows``: [(source_key,
    node, w0)] initial distances (a source's in-cell legs to its cell's
    boundary). Returns [(source_key, node, dist)] for every reached
    overlay node after EXACTLY ``n_rounds`` relaxation rounds — the value
    a SQL engine replaying the same rounds produces row-for-row. With
    ``check_converged`` a probe round asserts the fixed point was reached
    (making the bounded-round result the exact distance); the probe never
    changes the output.

    Vectorized: state is a dense (n_sources × n_overlay_nodes) int64
    matrix; each round relaxes every edge via ``np.minimum.at`` (unordered
    elementwise min → round-count-deterministic). Cost per round:
    n_sources · |ovl| int adds — millions per round even for country-scale
    overlays, far below the per-cell closure cost.
    """
    import numpy as np

    if not ovl or not seed_rows:
        # no overlay (single-cell components) or no sources touching it:
        # nothing to relax; same-cell direct terms carry the result
        return [(k, v, w0) for k, v, w0 in seed_rows]

    nodes = sorted(
        {s for s, _, _ in ovl} | {d for _, d, _ in ovl} | {n for _, n, _ in seed_rows}
    )
    ix = {v: i for i, v in enumerate(nodes)}
    keys = sorted({k for k, _, _ in seed_rows})
    kix = {k: i for i, k in enumerate(keys)}
    # state indexed (node, source): ufunc scatter-min on the FIRST axis
    st = np.full((len(nodes), len(keys)), INF_I64, dtype=np.int64)
    for k, v, w0 in seed_rows:
        ki, vi = kix[k], ix[v]
        if w0 < st[vi, ki]:
            st[vi, ki] = w0
    es = np.asarray([ix[s] for s, _, _ in ovl], dtype=np.int64)
    ed = np.asarray([ix[d] for _, d, _ in ovl], dtype=np.int64)
    ew = np.asarray([w for _, _, w in ovl], dtype=np.int64)
    # pre-sort edges by destination: each round's per-destination min is
    # then one vectorized np.minimum.reduceat instead of a scatter-min
    # (ufunc.at is ~30× slower at this edge count)
    order = np.argsort(ed, kind="stable")
    es, ed, ew = es[order], ed[order], ew[order]
    grp_dst, grp_start = np.unique(ed, return_index=True)

    def relax(state):
        cand = state[es] + ew[:, None]
        nxt = state.copy()
        nxt[grp_dst] = np.minimum(
            nxt[grp_dst], np.minimum.reduceat(cand, grp_start, axis=0)
        )
        return nxt

    converged = False
    for _ in range(n_rounds):
        nxt = relax(st)
        if np.array_equal(nxt, st):
            # fixed point: every remaining round is the identity, so
            # stopping here produces exactly the round-n_rounds state the
            # SQL replay computes — and the convergence probe is free
            converged = True
            st = nxt
            break
        st = nxt
    if check_converged and not converged:
        probe = relax(st)
        if not np.array_equal(probe, st):
            raise RuntimeError(
                f"multi_source_overlay_dist: not converged after "
                f"{n_rounds} rounds — raise n_rounds (overlay hop "
                "diameter exceeds the bound)"
            )
    vi_idx, ki_idx = np.nonzero(st < INF_I64)
    karr = np.asarray(keys, dtype=np.int64)
    varr = np.asarray(nodes, dtype=np.int64)
    return list(
        zip(
            karr[ki_idx].tolist(),
            varr[vi_idx].tolist(),
            st[vi_idx, ki_idx].tolist(),
        )
    )


class CRPIndex:
    """The compiled routing artifact — the in-engine analog of the
    ``.osrm`` file ``osrm-contract`` produces (osm2osrm.sh:32-33):
    checkpointed extracted graph, distributed per-cell closures, and the
    collected overlay (contracted core). Build ONCE with
    ``build_crp_index``, answer many ``crp_many_to_many`` calls — graph
    compilation (the dominant cost: source scan + cell closures) is paid
    per network, not per query, exactly the reference's operating model
    (contract offline, ``osrm.table`` many times)."""

    def __init__(self, edges, cells, incell, ovl, bset, bdf):
        self.edges = edges
        self.cells = cells
        self.incell = incell
        self.ovl = ovl
        self.bset = bset
        self.bdf = bdf


def build_crp_index(
    edges: DataFrame,
    cells: DataFrame,
    n_cell_squarings: int,
    max_overlay_rows: int = MAX_OVERLAY_ROWS,
    _checkpointed: bool = False,
) -> CRPIndex:
    """Compile the single-level CRP artifact (see ``CRPIndex``)."""
    spark = edges.sparkSession
    # Materialize the extracted graph once: edges/cells feed four subplans
    # (in-cell closure, inter-cell split, seed legs, exit legs), and
    # lineage-heavy inputs (an XML scan + explode + window, as from
    # sources.osm) make Catalyst re-analysis of each branch quadratic —
    # observed as an optimizer stall on the 10⁴-node fixture. This is the
    # osrm-extract artifact boundary: compile once, route many.
    # (``_checkpointed``: route_many_to_many already materialized them
    # for its overlay estimate — skip the redundant copy.)
    if not _checkpointed:
        edges = edges.localCheckpoint(eager=False)
        cells = cells.localCheckpoint(eager=False)
    # incell is consumed by four branches (overlay, seeds, exits, direct);
    # checkpointing (not just persist) truncates its grouped-map lineage so
    # the final union's analysis stays linear. Lazy: the overlay pull's
    # shuffle map side computes every incell partition, filling the cache
    # without a dedicated materialization job (r13).
    incell = in_cell_closures(edges, cells, n_cell_squarings).localCheckpoint(
        eager=False
    )
    inter = inter_cell_edges(edges, cells)
    ovl = overlay_rows(incell, inter, max_overlay_rows)
    bset = sorted({s for s, _, _ in ovl} | {d for _, d, _ in ovl})
    # Arrow local-rows path: a plain createDataFrame(list) is a
    # Python-RDD-backed relation; every checkpoint/write job executing one
    # spins up Python workers (~0.1 s/task × 32 local partitions — the r13
    # operation-log finding). All driver-local routing tables ship as
    # Arrow batches materialized JVM-side instead (guide §4).
    bdf = local_rows_df(spark, [(v,) for v in bset], "node_id long")
    return CRPIndex(edges, cells, incell, ovl, bset, bdf)


def partitioned_many_to_many(
    edges: DataFrame,
    cells: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    n_cell_squarings: int,
    n_overlay_rounds: int,
    max_overlay_rows: int = MAX_OVERLAY_ROWS,
    _checkpointed: bool = False,
) -> DataFrame:
    """Exact many-to-many shortest-path distances (the ``osrm.table``
    semantic, tasks.js:260) over a cell-partitioned network.

    ``edges``: directed (src, dst, w:int ≥ 0). ``cells``: (node_id, cell).
    ``sources``: (src_id, node_id); ``targets``: (tgt_id, node_id) — both
    assumed AT network nodes (snapping is a separate operator,
    operators/eta.nearest_snap_distance_grid). Returns (src_id, tgt_id,
    dist:int) for every reachable pair.

    dist = min( in-cell direct [same cell only],
                min over boundary b_t of target's cell:
                    overlayDist(src → b_t) + inCell(b_t → target) )
    where overlayDist itself starts from the source's in-cell legs — the
    exact CRP three-leg decomposition (module docstring). All joins are
    distributed; only the overlay (contracted core) and the seed legs
    (n_sources × per-cell boundary) pass through the driver.

    One-shot convenience over ``build_crp_index`` + ``crp_many_to_many``
    — callers routing several source/target sets over one network should
    build the index once instead.
    """
    idx = build_crp_index(
        edges, cells, n_cell_squarings, max_overlay_rows=max_overlay_rows,
        _checkpointed=_checkpointed,
    )
    return crp_many_to_many(idx, sources, targets, n_overlay_rounds)


def crp_many_to_many(
    idx: CRPIndex,
    sources: DataFrame,
    targets: DataFrame,
    n_overlay_rounds: int,
) -> DataFrame:
    """Answer one many-to-many query from a compiled ``CRPIndex`` (see
    ``partitioned_many_to_many`` for the semantics and exactness
    argument)."""
    cells, incell, ovl, bset, bdf = (
        idx.cells, idx.incell, idx.ovl, idx.bset, idx.bdf
    )
    spark = cells.sparkSession

    # seed legs: source → boundary nodes of its own cell (in-cell exact);
    # n_sources × per-cell boundary rows — metadata-sized collect.
    s_cell = sources.join(cells, "node_id").select(
        "src_id", F.col("node_id").alias("s_node"), "cell"
    )
    seeds_in = (
        s_cell.join(
            incell,
            (s_cell["cell"] == incell["cell"])
            & (s_cell["s_node"] == incell["src"]),
        )
        .join(bdf, incell["dst"] == bdf["node_id"])
        .select("src_id", incell["dst"].alias("b"), "w")
    )
    # a source sitting ON a boundary node of a cell with no in-cell edges
    # has no closure rows (not even its diagonal — the closure is built
    # from in-cell edges); seed it with the implicit zero leg to itself
    seeds_self = s_cell.join(
        bdf, s_cell["s_node"] == bdf["node_id"]
    ).select("src_id", F.col("s_node").alias("b"), F.lit(0).alias("w"))
    seeds = (
        seeds_in.union(seeds_self)
        # a src_id may own SEVERAL nodes (osrm-style multiple access
        # points; also how callers min-fuse groups of sources — every
        # downstream step is min-plus, so per-group minima commute):
        # seed with the best leg per (source, boundary)
        .groupBy("src_id", "b")
        .agg(F.min("w").alias("w"))
    )
    # gate + collect in ONE evaluation (bounded pull, as overlay_rows)
    seed_pull = seeds.limit(MAX_SEED_ROWS + 1).collect()
    if len(seed_pull) > MAX_SEED_ROWS:
        raise ValueError(
            f"partitioned_many_to_many: > MAX_SEED_ROWS={MAX_SEED_ROWS} "
            "seed legs; min-fuse sources that share an output key into "
            "one multi-node source (per-group minima commute through "
            "every min-plus stage), or chunk the source set across calls"
        )
    seed_rows = [(r["src_id"], r["b"], r["w"]) for r in seed_pull]
    n_sources = len({k for k, _, _ in seed_rows})
    if n_sources * max(len(bset), 1) > MAX_OVERLAY_STATE:
        raise ValueError(
            f"partitioned_many_to_many: overlay state {n_sources} sources "
            f"× {len(bset)} boundary nodes > MAX_OVERLAY_STATE="
            f"{MAX_OVERLAY_STATE}; min-fuse sources sharing an output key "
            "or chunk the source set across calls"
        )
    od = multi_source_overlay_dist(ovl, seed_rows, n_overlay_rounds)

    # exit legs: min over the target cell's boundary of (overlay dist +
    # in-cell leg), folded INSIDE a per-cell numpy kernel. The join+agg
    # formulation materializes |targets| × per-cell-boundary × |sources|
    # candidate rows (≈420M at sf0.1 — measured 10× the whole query);
    # here the overlay distance matrix (n_sources × n_boundary — the
    # osrm.table working set, the same broadcast class as the overlay
    # itself) ships once, each cell co-groups its targets with its
    # boundary→node closure rows, and the fold is one (S × B_c × n_t)
    # min-plus per cell in numpy. Output is the true many-to-many
    # matrix: S rows per reachable target.
    import numpy as np

    skeys = sorted({k for k, _, _ in od})
    kix = {k: i for i, k in enumerate(skeys)}
    bix = {v: i for i, v in enumerate(bset)}
    od_mat = np.full((len(skeys), len(bset)), INF_I64, dtype=np.int64)
    for k, v, w0 in od:
        od_mat[kix[k], bix[v]] = w0
    od_bc = spark.sparkContext.broadcast((skeys, bix, od_mat))

    t_cell = targets.join(cells, "node_id").select(
        "tgt_id", F.col("node_id").alias("t_node"), "cell"
    )
    exit_legs = incell.join(
        bdf.withColumnRenamed("node_id", "src"), "src"
    ).select("cell", F.col("src").alias("b"), "dst", "w")

    def fold(tgts, legs):
        import pandas as pd

        if len(tgts) == 0:
            return pd.DataFrame(
                {
                    "src_id": np.empty(0, dtype=np.int64),
                    "tgt_id": np.empty(0, dtype=np.int64),
                    "d": np.empty(0, dtype=np.int64),
                }
            )
        keys, bixx, mat = od_bc.value
        # target nodes may be absent from the closure rows (a boundary
        # node in a cell with no in-cell edges has none, not even its
        # diagonal) — include them, with the implicit zero self-leg for
        # boundary nodes, so such targets resolve instead of crashing
        # the index map or silently dropping
        b_loc = sorted(
            set(legs["b"]) | (set(tgts["t_node"]) & set(bixx))
        )
        if not b_loc:
            # no boundary touches this cell: no via-boundary paths here
            # (same-cell pairs are the direct term's job)
            return pd.DataFrame(
                {
                    "src_id": np.empty(0, dtype=np.int64),
                    "tgt_id": np.empty(0, dtype=np.int64),
                    "d": np.empty(0, dtype=np.int64),
                }
            )
        b_l = {v: i for i, v in enumerate(b_loc)}
        nodes = sorted(set(legs["dst"]) | set(tgts["t_node"]))
        n_l = {v: i for i, v in enumerate(nodes)}
        L = np.full((len(b_loc), len(nodes)), INF_I64, dtype=np.int64)
        if len(legs):
            np.minimum.at(
                L,
                (
                    legs["b"].map(b_l).to_numpy(),
                    legs["dst"].map(n_l).to_numpy(),
                ),
                legs["w"].to_numpy(dtype=np.int64),
            )
        for v in b_loc:
            if v in n_l:
                L[b_l[v], n_l[v]] = min(L[b_l[v], n_l[v]], 0)
        D = mat[:, [bixx[v] for v in b_loc]]  # (S, B_c)
        best = (D[:, :, None] + L[None, :, :]).min(axis=1)  # (S, n_nodes)
        t_idx = tgts["t_node"].map(n_l).to_numpy()
        best = best[:, t_idx]  # (S, n_t)
        si, ti = np.nonzero(best < INF_I64)
        return pd.DataFrame(
            {
                "src_id": np.asarray(keys, dtype=np.int64)[si],
                "tgt_id": tgts["tgt_id"].to_numpy()[ti],
                "d": best[si, ti],
            }
        )

    # pin both cogroup exchanges (see _kernel_partitions): the fold's
    # per-cell (S × B_c × n_t) min-plus is work AQE cannot see in the
    # tiny exchanged bytes
    n_fold = _kernel_partitions(t_cell)
    via_b = (
        t_cell.repartition(n_fold, "cell").groupby("cell")
        .cogroup(exit_legs.repartition(n_fold, "cell").groupby("cell"))
        .applyInPandas(fold, schema="src_id long, tgt_id long, d long")
    )
    # same-cell direct term (paths that never leave the shared cell).
    direct = (
        s_cell.join(t_cell, "cell")
        .join(
            incell,
            (s_cell["cell"] == incell["cell"])
            & (s_cell["s_node"] == incell["src"])
            & (t_cell["t_node"] == incell["dst"]),
        )
        .select("src_id", "tgt_id", F.col("w").alias("d"))
    )
    # explicit zero self-term: d(v, v) = 0 always holds under
    # non-negative weights, but a shared node with NO in-cell edges has
    # no closure rows (not even its diagonal), so source/target pairs
    # snapped to such a node would otherwise be absent from the matrix
    self_zero = _self_zero_pairs(sources, targets)
    return (
        via_b.union(direct)
        .union(self_zero)
        .groupBy("src_id", "tgt_id")
        .agg(F.min("d").alias("dist"))
    )


def _self_zero_pairs(sources: DataFrame, targets: DataFrame) -> DataFrame:
    """(src_id, tgt_id, 0) for every source/target pair sharing a node —
    the identity rows every ``osrm.table`` matrix carries on its
    diagonal, emitted explicitly so they survive even for nodes the
    closures never saw (isolated nodes have no closure rows at all)."""
    return (
        sources.select("src_id", "node_id")
        .join(targets.select("tgt_id", "node_id"), "node_id")
        .select("src_id", "tgt_id", F.lit(0).cast("long").alias("d"))
    )


def two_level_many_to_many(
    edges: DataFrame,
    cells: DataFrame,
    supercells: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    n_cell_squarings: int,
    n_super_squarings: int,
    n_overlay_rounds: int,
    max_overlay_rows: int = MAX_OVERLAY_ROWS,
    _checkpointed: bool = False,
) -> DataFrame:
    """Exact many-to-many distances through a TWO-level CRP hierarchy
    (VERDICT r4 next-round #4): for extracts whose single-level overlay
    (Σ per-cell boundary cliques) exceeds the collect budget, recurse the
    cell/overlay construction once so the collected core stays bounded.

    ``supercells``: (cell, supercell) — cells grouped into supercells
    (the reference's planet-scale analog: osrm's multi-level partition,
    osm2osrm.sh:32-33 contracts what this holds as the level-2 core).

    Construction — every level reuses the level-1 machinery:

    1. per-cell exact closures (``in_cell_closures``) — distributed;
    2. the LEVEL-1 overlay graph (inter-cell edges ∪ in-cell
       boundary→boundary rows) stays DISTRIBUTED — never collected
       (this is exactly what ``partitioned_many_to_many`` collects);
    3. per-SUPERCELL closure of the level-1 overlay restricted to the
       supercell — literally ``in_cell_closures`` again, with the
       boundary graph as the edge list and supercell as the cell id
       (each supercell's boundary subgraph is dense-closed
       independently in one applyInPandas kernel);
    4. the collected LEVEL-2 overlay: inter-SUPERCELL edges ∪
       per-supercell boundary₂→boundary₂ closure rows, where boundary₂
       = endpoints of inter-supercell edges. On road-shaped networks
       (sparse arterial crossings) this is an order of magnitude
       smaller than the level-1 overlay — gated by ``max_overlay_rows``;
    5. seeds climb the hierarchy (source → cell boundary → supercell
       boundary₂), the fixed-round relaxation runs on the level-2
       overlay (``multi_source_overlay_dist`` unchanged, convergence
       probe and all), and exits descend it — all hierarchy hops are
       distributed joins + min-aggregates. The exit joins materialize
       O(n_sources · Σ_c B_c·n_c) candidate rows — linear in network
       size per source, so MIN-FUSE sources sharing an output key (the
       MAX_SEED_ROWS / MAX_OVERLAY_STATE gates enforce the bound; the
       single-level path's cogrouped fold kernel is the alternative
       when the level-1 boundary fits a broadcast).

    Exactness: a shortest path decomposes at its supercell-boundary
    crossings into maximal within-supercell segments; each segment
    decomposes at cell boundaries into within-cell segments — precisely
    the paths the per-cell closures ∪ per-supercell closures ∪
    inter-edges represent (the CRP argument applied twice). All-integer
    weights, so the cross-engine replay is exact."""
    spark = edges.sparkSession
    # all checkpoints in this builder are LAZY (r13): lineage truncation
    # and single-copy caching are identical, but materialization folds
    # into the next full job (closure kernels, the gated pulls, the final
    # write) instead of one scheduled barrier per table — see
    # route_many_to_many's dispatcher note.
    if not _checkpointed:
        edges = edges.localCheckpoint(eager=False)
        cells = cells.localCheckpoint(eager=False)
    incell = in_cell_closures(edges, cells, n_cell_squarings).localCheckpoint(
        eager=False
    )
    # inter and the boundary set are each referenced by several of the
    # build's driver actions (overlay graph, seeds, estimator); without
    # checkpoints every action re-executes their join/distinct subplans,
    # re-firing the broadcast-build jobs each time (r14 joblog: ~119
    # broadcast-exchange jobs/query, most re-executions of shared
    # spines). Lazy: materialization folds into the first consuming job.
    inter = inter_cell_edges(edges, cells).localCheckpoint(eager=False)

    # level-1 overlay graph, DISTRIBUTED: (src, dst, w)
    b1 = (
        inter.select(F.col("src").alias("node_id"))
        .union(inter.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bb1 = (
        incell.join(b1.withColumnRenamed("node_id", "src"), "src")
        .join(b1.withColumnRenamed("node_id", "dst"), "dst")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "w")
    )
    node_sc = cells.join(supercells, "cell").select("node_id", "supercell").localCheckpoint(eager=False)
    # split level-1 overlay edges at the supercell border; in-cell rows
    # are always within one supercell, so only ``inter`` needs the test
    inter_sc = (
        inter.join(
            node_sc.withColumnsRenamed(
                {"node_id": "src", "supercell": "s_sc"}
            ),
            "src",
        )
        .join(
            node_sc.withColumnsRenamed(
                {"node_id": "dst", "supercell": "d_sc"}
            ),
            "dst",
        )
    )
    within_sc = inter_sc.where(F.col("s_sc") == F.col("d_sc")).select(
        "src", "dst", "w"
    ).union(bb1)
    cross_sc = inter_sc.where(F.col("s_sc") != F.col("d_sc")).select(
        "src", "dst", "w"
    ).localCheckpoint(eager=False)

    # per-supercell closure of the boundary graph = in_cell_closures with
    # (boundary node → supercell) as the cell map. Checkpointed: feeds
    # level-2 overlay, seeds, same-supercell term, and exits.
    b1_sc = b1.join(node_sc, "node_id")
    scl = in_cell_closures(
        within_sc,
        b1_sc.select("node_id", F.col("supercell").alias("cell")),
        n_super_squarings,
    ).localCheckpoint(eager=False)

    # collected level-2 overlay (the bounded core)
    b2 = (
        cross_sc.select(F.col("src").alias("node_id"))
        .union(cross_sc.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bb2 = (
        scl.join(b2.withColumnRenamed("node_id", "src"), "src")
        .join(b2.withColumnRenamed("node_id", "dst"), "dst")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "w")
    )
    ovl2 = cross_sc.select("src", "dst", "w").union(bb2)
    # gate + collect in ONE evaluation (bounded pull, as overlay_rows)
    ovl_pull = ovl2.limit(max_overlay_rows + 1).collect()
    if len(ovl_pull) > max_overlay_rows:
        raise ValueError(
            f"two_level_many_to_many: > {max_overlay_rows} "
            "(max_overlay_rows) level-2 overlay rows; use smaller "
            "supercells or add another level"
        )
    ovl = [(r["src"], r["dst"], r["w"]) for r in ovl_pull]

    # seeds, level 1: source → boundary of its own cell (in-cell legs +
    # the implicit zero self-leg for sources sitting ON a boundary node)
    s_cell = sources.join(cells, "node_id").select(
        "src_id", F.col("node_id").alias("s_node"), "cell"
    )
    seeds_in = (
        s_cell.join(
            incell,
            (s_cell["cell"] == incell["cell"])
            & (s_cell["s_node"] == incell["src"]),
        )
        .join(b1.withColumnRenamed("node_id", "_b"),
              incell["dst"] == F.col("_b"))
        .select("src_id", F.col("_b").alias("b"), "w")
    )
    seeds_self = s_cell.join(
        b1.withColumnRenamed("node_id", "_b"), s_cell["s_node"] == F.col("_b")
    ).select("src_id", F.col("_b").alias("b"), F.lit(0).alias("w"))
    seeds1 = (
        seeds_in.union(seeds_self)
        .groupBy("src_id", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )

    # seeds, level 2: climb b → b₂ through the supercell closure; union
    # the direct rows where b IS a b₂ (covers supercells whose boundary
    # graph has no edges, hence no closure rows)
    seeds2_via = (
        seeds1.join(scl, seeds1["b"] == scl["src"])
        .join(b2.withColumnRenamed("node_id", "_b2"),
              scl["dst"] == F.col("_b2"))
        .select("src_id", F.col("_b2").alias("b"),
                (seeds1["w"] + scl["w"]).alias("w"))
    )
    seeds2_direct = seeds1.join(
        b2.withColumnRenamed("node_id", "_b2"), seeds1["b"] == F.col("_b2")
    ).select("src_id", "b", "w")
    seeds2 = (
        seeds2_via.union(seeds2_direct)
        .groupBy("src_id", "b")
        .agg(F.min("w").alias("w"))
    )
    seed_pull = seeds2.limit(MAX_SEED_ROWS + 1).collect()
    if len(seed_pull) > MAX_SEED_ROWS:
        raise ValueError(
            f"two_level_many_to_many: > MAX_SEED_ROWS={MAX_SEED_ROWS} "
            "seed legs; min-fuse sources sharing an output key "
            "(per-group minima commute through every min-plus stage)"
        )
    seed_rows = [(r["src_id"], r["b"], r["w"]) for r in seed_pull]
    # same driver-state gate as the single-level path (VERDICT r4 #3):
    # the relaxation holds a dense (n_sources × n_overlay_nodes) matrix
    n_sources = len({k for k, _, _ in seed_rows})
    n_ovl_nodes = len(
        {a for a, _, _ in ovl} | {b for _, b, _ in ovl}
        | {v for _, v, _ in seed_rows}
    )
    if n_sources * max(n_ovl_nodes, 1) > MAX_OVERLAY_STATE:
        raise ValueError(
            f"two_level_many_to_many: overlay state {n_sources} sources "
            f"× {n_ovl_nodes} overlay nodes > MAX_OVERLAY_STATE="
            f"{MAX_OVERLAY_STATE}; min-fuse sources sharing an output "
            "key or chunk the source set across calls"
        )
    od = multi_source_overlay_dist(ovl, seed_rows, n_overlay_rounds)
    od_df = local_rows_df(spark, od or [], "src_id long, b2 long, d long")

    # distances to EVERY level-1 boundary node: descend b₂ → b through
    # the supercell closure, min-merged with the within-supercell climb
    # (paths that never cross a supercell border) and the raw seeds
    dist_b = (
        od_df.join(scl, od_df["b2"] == scl["src"])
        .select("src_id", scl["dst"].alias("b"),
                (od_df["d"] + scl["w"]).alias("w"))
        .union(od_df.select("src_id", F.col("b2").alias("b"), F.col("d")))
        .union(
            seeds1.join(scl, seeds1["b"] == scl["src"]).select(
                "src_id", scl["dst"].alias("b"),
                (seeds1["w"] + scl["w"]).alias("w"))
        )
        .union(seeds1.select("src_id", "b", "w"))
        .groupBy("src_id", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )

    # exits: boundary → target through the target cell's closure, plus
    # targets sitting directly ON a boundary node
    t_cell = targets.join(cells, "node_id").select(
        "tgt_id", F.col("node_id").alias("t_node"), "cell"
    )
    via_b = (
        dist_b.join(incell, dist_b["b"] == incell["src"])
        .join(
            t_cell,
            (incell["cell"] == t_cell["cell"])
            & (incell["dst"] == t_cell["t_node"]),
        )
        .select("src_id", "tgt_id",
                (dist_b["w"] + incell["w"]).alias("d"))
    )
    on_b = dist_b.join(t_cell, dist_b["b"] == t_cell["t_node"]).select(
        "src_id", "tgt_id", F.col("w").alias("d")
    )
    # same-cell direct term (paths that never leave the shared cell)
    direct = (
        s_cell.join(t_cell, "cell")
        .join(
            incell,
            (s_cell["cell"] == incell["cell"])
            & (s_cell["s_node"] == incell["src"])
            & (t_cell["t_node"] == incell["dst"]),
        )
        .select("src_id", "tgt_id", F.col("w").alias("d"))
    )
    # explicit zero self-term (see _self_zero_pairs: isolated shared
    # nodes have no closure rows, so their diagonal must be emitted)
    return (
        via_b.union(on_b)
        .union(direct)
        .union(_self_zero_pairs(sources, targets))
        .groupBy("src_id", "tgt_id")
        .agg(F.min("d").alias("dist"))
    )


def multi_level_many_to_many(
    edges: DataFrame,
    cells: DataFrame,
    level_maps: list[DataFrame],
    sources: DataFrame,
    targets: DataFrame,
    n_cell_squarings: int,
    level_squarings: list[int],
    n_overlay_rounds: int,
    max_overlay_rows: int = MAX_OVERLAY_ROWS,
    _checkpointed: bool = False,
) -> DataFrame:
    """Exact many-to-many distances through an N-level CRP hierarchy —
    the generalization that closes the planet-scale ceiling
    ``two_level_many_to_many`` documents ("use smaller supercells or
    add another level", VERDICT r5 #7): when even the level-2 overlay
    exceeds the collect budget, recurse the overlay construction once
    more per extra map, so the collected core stays bounded at ANY
    extract size — the in-engine analog of osrm's multi-level planet
    partition (scripts/osm2osrm.sh:32-33).

    ``level_maps``: one (child, parent) DataFrame per extra level —
    ``[cell→supercell]`` reproduces the two-level hierarchy,
    ``[cell→supercell, supercell→region]`` adds a third, and so on.

    Construction — every level is the SAME recursion step:

    - level-1: per-cell exact closures (distributed) + the level-1
      overlay graph (inter-cell edges ∪ in-cell boundary cliques),
      never collected;
    - level k→k+1: split the level-k overlay graph at the level-(k+1)
      partition border; close the WITHIN part per partition (literally
      ``in_cell_closures`` on the overlay graph — one applyInPandas
      kernel per partition); the next overlay graph is the CROSS edges
      ∪ the per-partition boundary-to-boundary closure rows over the
      next boundary set (endpoints of cross edges — a subset of the
      current one);
    - only the FINAL overlay graph is collected (gated), relaxed by
      the fixed-round kernel, and the distances descend the hierarchy
      level by level as distributed joins + min-aggregates, exactly
      mirroring the climb.

    Exactness: the CRP decomposition argument applied once per level —
    a shortest path decomposes at level-N borders into within-partition
    segments, each of which decomposes at level-(N−1) borders, … down
    to within-cell segments; every segment class is represented by the
    corresponding closure set. All-integer weights; both the two-level
    path and the single-level SQL oracle replay it exactly."""
    spark = edges.sparkSession
    if not level_maps:
        raise ValueError(
            "multi_level_many_to_many: empty level_maps — use "
            "partitioned_many_to_many for the single-level path"
        )
    if len(level_squarings) != len(level_maps):
        raise ValueError(
            "multi_level_many_to_many: need one squaring count per "
            f"level map (got {len(level_squarings)} for "
            f"{len(level_maps)} maps)"
        )
    # all checkpoints lazy (r13) — see two_level_many_to_many's note
    if not _checkpointed:
        edges = edges.localCheckpoint(eager=False)
        cells = cells.localCheckpoint(eager=False)
    incell = in_cell_closures(edges, cells, n_cell_squarings).localCheckpoint(
        eager=False
    )
    # shared-spine checkpoints (see two_level_many_to_many's note): inter,
    # each boundary set and each level's overlay graph are referenced by
    # several driver actions/branches; lazy checkpoints stop every action
    # from re-executing the joins (and re-firing their broadcast jobs).
    inter = inter_cell_edges(edges, cells).localCheckpoint(eager=False)

    # node → partition id at every level (level 0 = cell)
    node_part = [cells.select("node_id", F.col("cell").alias("part"))]
    for mp in level_maps:
        cols = mp.columns
        m = mp.select(
            F.col(cols[0]).alias("part"), F.col(cols[1]).alias("_parent")
        )
        node_part.append(
            node_part[-1]
            .join(m, "part")
            .select("node_id", F.col("_parent").alias("part"))
            # each level's gp splitter references this twice (src/dst)
            .localCheckpoint(eager=False)
        )

    def _endpoints(g: DataFrame) -> DataFrame:
        return (
            g.select(F.col("src").alias("node_id"))
            .union(g.select(F.col("dst").alias("node_id")))
            .distinct()
        )

    def _bb(closure: DataFrame, bset_df: DataFrame) -> DataFrame:
        return (
            closure.join(bset_df.withColumnRenamed("node_id", "src"), "src")
            .join(bset_df.withColumnRenamed("node_id", "dst"), "dst")
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst", "w")
        )

    # level-1 boundary + overlay graph (distributed)
    b_levels = [_endpoints(inter).localCheckpoint(eager=False)]
    ovl_graph = inter.select("src", "dst", "w").union(
        _bb(incell, b_levels[0])
    )
    scls: list[DataFrame] = []
    for k, _mp in enumerate(level_maps):
        part = node_part[k + 1]
        gp = (
            ovl_graph.join(
                part.withColumnsRenamed(
                    {"node_id": "src", "part": "s_p"}
                ),
                "src",
            )
            .join(
                part.withColumnsRenamed(
                    {"node_id": "dst", "part": "d_p"}
                ),
                "dst",
            )
        )
        within = gp.where(F.col("s_p") == F.col("d_p")).select(
            "src", "dst", "w"
        )
        cross = gp.where(F.col("s_p") != F.col("d_p")).select(
            "src", "dst", "w"
        ).localCheckpoint(eager=False)
        bp = b_levels[k].join(part, "node_id").select(
            "node_id", F.col("part").alias("cell")
        )
        scl = in_cell_closures(
            within, bp, level_squarings[k]
        ).localCheckpoint(eager=False)
        scls.append(scl)
        b_next = _endpoints(cross).localCheckpoint(eager=False)
        ovl_graph = cross.union(_bb(scl, b_next)).localCheckpoint(eager=False)
        b_levels.append(b_next)

    # collected final overlay (the bounded core) — gate + collect in
    # ONE evaluation (bounded pull, as overlay_rows)
    ovl_pull = ovl_graph.limit(max_overlay_rows + 1).collect()
    if len(ovl_pull) > max_overlay_rows:
        raise ValueError(
            f"multi_level_many_to_many: > {max_overlay_rows} "
            f"(max_overlay_rows) level-{len(level_maps) + 1} overlay "
            "rows; use smaller top-level partitions or add another "
            "level map"
        )
    ovl = [(r["src"], r["dst"], r["w"]) for r in ovl_pull]

    # seeds climb the hierarchy: source → cell boundary, then through
    # each per-partition closure to the next boundary set
    s_cell = sources.join(cells, "node_id").select(
        "src_id", F.col("node_id").alias("s_node"), "cell"
    )
    b1 = b_levels[0]
    seeds_in = (
        s_cell.join(
            incell,
            (s_cell["cell"] == incell["cell"])
            & (s_cell["s_node"] == incell["src"]),
        )
        .join(b1.withColumnRenamed("node_id", "_b"),
              incell["dst"] == F.col("_b"))
        .select("src_id", F.col("_b").alias("b"), "w")
    )
    seeds_self = s_cell.join(
        b1.withColumnRenamed("node_id", "_b"), s_cell["s_node"] == F.col("_b")
    ).select("src_id", F.col("_b").alias("b"), F.lit(0).alias("w"))
    seeds_k = [
        seeds_in.union(seeds_self)
        .groupBy("src_id", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    ]
    for k, scl in enumerate(scls):
        prev = seeds_k[-1]
        bn = b_levels[k + 1]
        via = (
            prev.join(scl, prev["b"] == scl["src"])
            .join(bn.withColumnRenamed("node_id", "_bn"),
                  scl["dst"] == F.col("_bn"))
            .select("src_id", F.col("_bn").alias("b"),
                    (prev["w"] + scl["w"]).alias("w"))
        )
        direct = prev.join(
            bn.withColumnRenamed("node_id", "_bn"), prev["b"] == F.col("_bn")
        ).select("src_id", "b", "w")
        seeds_k.append(
            via.union(direct)
            .groupBy("src_id", "b")
            .agg(F.min("w").alias("w"))
            .localCheckpoint(eager=False)
        )
    seed_pull = seeds_k[-1].limit(MAX_SEED_ROWS + 1).collect()
    if len(seed_pull) > MAX_SEED_ROWS:
        raise ValueError(
            f"multi_level_many_to_many: > MAX_SEED_ROWS={MAX_SEED_ROWS} "
            "seed legs; min-fuse sources sharing an output key "
            "(per-group minima commute through every min-plus stage)"
        )
    seed_rows = [(r["src_id"], r["b"], r["w"]) for r in seed_pull]
    n_sources = len({k for k, _, _ in seed_rows})
    n_ovl_nodes = len(
        {a for a, _, _ in ovl} | {b for _, b, _ in ovl}
        | {v for _, v, _ in seed_rows}
    )
    if n_sources * max(n_ovl_nodes, 1) > MAX_OVERLAY_STATE:
        raise ValueError(
            f"multi_level_many_to_many: overlay state {n_sources} "
            f"sources × {n_ovl_nodes} overlay nodes > MAX_OVERLAY_STATE="
            f"{MAX_OVERLAY_STATE}; min-fuse sources sharing an output "
            "key or chunk the source set across calls"
        )
    od = multi_source_overlay_dist(ovl, seed_rows, n_overlay_rounds)
    dist = local_rows_df(spark, od or [], "src_id long, b long, w long")

    # distances descend the hierarchy, min-merged with the climb rows
    # at every level (paths that never cross that level's border)
    for k in range(len(scls) - 1, -1, -1):
        scl = scls[k]
        seeds = seeds_k[k]
        via_down = (
            dist.join(scl, dist["b"] == scl["src"])
            .select("src_id", scl["dst"].alias("b"),
                    (dist["w"] + scl["w"]).alias("w"))
        )
        via_seed = (
            seeds.join(scl, seeds["b"] == scl["src"])
            .select("src_id", scl["dst"].alias("b"),
                    (seeds["w"] + scl["w"]).alias("w"))
        )
        dist = (
            via_down.union(dist.select("src_id", "b", "w"))
            .union(via_seed)
            .union(seeds.select("src_id", "b", "w"))
            .groupBy("src_id", "b")
            .agg(F.min("w").alias("w"))
            .localCheckpoint(eager=False)
        )

    # exits: boundary → target through the target cell's closure, plus
    # targets sitting directly ON a level-1 boundary node
    t_cell = targets.join(cells, "node_id").select(
        "tgt_id", F.col("node_id").alias("t_node"), "cell"
    )
    via_b = (
        dist.join(incell, dist["b"] == incell["src"])
        .join(
            t_cell,
            (incell["cell"] == t_cell["cell"])
            & (incell["dst"] == t_cell["t_node"]),
        )
        .select("src_id", "tgt_id", (dist["w"] + incell["w"]).alias("d"))
    )
    on_b = dist.join(t_cell, dist["b"] == t_cell["t_node"]).select(
        "src_id", "tgt_id", F.col("w").alias("d")
    )
    direct = (
        s_cell.join(t_cell, "cell")
        .join(
            incell,
            (s_cell["cell"] == incell["cell"])
            & (s_cell["s_node"] == incell["src"])
            & (t_cell["t_node"] == incell["dst"]),
        )
        .select("src_id", "tgt_id", F.col("w").alias("d"))
    )
    return (
        via_b.union(on_b)
        .union(direct)
        .union(_self_zero_pairs(sources, targets))
        .groupBy("src_id", "tgt_id")
        .agg(F.min("d").alias("dist"))
    )


# Above this vertex count the all-pairs closure backend (V×V rows) is an
# accident waiting to happen; the dispatcher refuses it and requires a
# cell partition (the CRP backends).
MAX_CLOSURE_VERTS = 512


def closure_rows_gated(
    edges: DataFrame,
    n_squarings: int | None = None,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> list:
    """Collected all-pairs closure rows [(src, dst, w)] for SMALL graphs,
    refusing V×V above ``MAX_CLOSURE_VERTS`` — the size policy of
    ``route_many_to_many``, exposed for kernel consumers that hold the
    closure driver-side anyway (``make_hub_routing_kernel``). ONE collect
    of the edge list, then the driver-side numpy squaring
    (``graph.min_plus_closure_rows`` — bit-identical to the distributed
    rounds). ``n_squarings`` defaults to ceil(log2(V−1)), always
    sufficient."""
    from ram_datapipeline_spark.operators.graph import min_plus_closure_rows

    # the refusal must not itself materialize a big graph driver-side:
    # pull a BOUNDED number of edge rows (a ≤MAX_CLOSURE_VERTS-vertex
    # graph has ≤ MAX² directed edges, so exceeding the cap proves the
    # graph too big without ever collecting it all) — one job, ~MB-sized
    max_edges = MAX_CLOSURE_VERTS * MAX_CLOSURE_VERTS
    pulled = edges.select(src, dst, w).limit(max_edges + 1).collect()
    if len(pulled) > max_edges:
        raise ValueError(
            f"closure_rows_gated: > {max_edges} edge rows — more than "
            f"any {MAX_CLOSURE_VERTS}-vertex simple digraph can hold; "
            "the all-pairs closure backend is refused at this size. "
            "Pre-aggregate parallel edges (groupBy(src, dst).min(w)) if "
            "the graph is genuinely small, or pass a `cells` partition "
            "to route_many_to_many (CRP backend)"
        )
    edge_rows = [(r[src], r[dst], r[w]) for r in pulled]
    n_verts = len(
        {s for s, _, _ in edge_rows} | {d for _, d, _ in edge_rows}
    )
    if n_verts > MAX_CLOSURE_VERTS:
        raise ValueError(
            f"closure_rows_gated: {n_verts} vertices > MAX_CLOSURE_VERTS="
            f"{MAX_CLOSURE_VERTS} — the all-pairs closure backend is "
            "refused at this size; pass a `cells` partition to "
            "route_many_to_many (CRP backend)"
        )
    if n_squarings is None:
        n_squarings = max(1, max(n_verts - 2, 1).bit_length())
    return min_plus_closure_rows(edge_rows, n_squarings)


def derive_parent_map(
    ids: DataFrame, child_col: str, parent_col: str, fan: int = 16
) -> DataFrame:
    """Default hierarchy map for callers with no topology knowledge
    (VERDICT r6 #5 — the reference's planet recipe, osm2osrm.sh:32-33,
    is zero-config: its user never supplies a partition): dense-rank
    the distinct child ids and group ``fan`` consecutive ranks per
    parent. For grid-numbered ids (row-major ``cell = gy·W + gx``, the
    common extractor layout) consecutive ids are spatially adjacent, so
    rank groups keep locality; for arbitrary ids it is still a
    deterministic balanced partition — and CRP results are
    partition-INDEPENDENT (the map only moves cost), so correctness
    never rests on the derivation. One global rank over the id table,
    which is cell-count-sized (≪ nodes) by construction."""
    from pyspark.sql import Window

    if fan < 2:
        raise ValueError("derive_parent_map: fan must be ≥ 2")
    return (
        ids.select(F.col(child_col)).distinct()
        .select(
            child_col,
            F.expr(
                f"CAST(dense_rank() OVER (ORDER BY {child_col}) - 1 "
                f"AS BIGINT) div {fan}"
            ).alias(parent_col),
        )
    )


def derive_parent_map_topo(
    ids: DataFrame,
    adj: DataFrame,
    child_col: str,
    parent_col: str,
    fan: int = 16,
    id_list: list[int] | None = None,
) -> DataFrame:
    """Adjacency-aware zero-config parent map (r8 — the rank-only
    ``derive_parent_map`` groups row-major grid cells into full-width
    STRIPS whose boundary/interior ratio made the derived hierarchy's
    overlay closures ~5× the explicit square maps'): deterministic
    heavy-edge matching over the WEIGHTED child-level adjacency graph
    — ``log2(fan)`` rounds of maximal matching that always merge the
    pair of clusters joined by the most cross edges (ties → smallest
    ids), capped at ``fan`` members. Cross edges ARE the boundary
    nodes the overlay estimate counts, so merging the heaviest
    connections first minimizes exactly the quantity that decides
    hierarchy depth — the multilevel-coarsening step of a real graph
    partitioner (METIS, OSRM's partition phase), with zero caller
    configuration. Region-growing alternatives measured far worse
    here: rank grouping makes full-width strips, BFS balls cut
    diagonally across road bundles (est 44k / 12.5k vs 350 for HEM on
    the 16,384-node planet fixture).

    Driver-side by design: the input is the CELL graph, which is ≪
    nodes by the partition contract (a planet extract is ~1e5-1e6
    cells — metadata-sized, exactly what the reference's own
    partitioning step holds centrally). Falls back to
    ``derive_parent_map`` for anything larger via the caller."""
    if fan < 2:
        raise ValueError("derive_parent_map_topo: fan must be ≥ 2")
    # Arrow transfer (toPandas), not row collect — the cell graph is
    # metadata-sized but can still be millions of rows at planet scale.
    # ``id_list`` lets the auto-hierarchy loop pass the ids it already
    # pulled for the size gate (r14: one bounded pull decides AND feeds
    # the derivation — previously a count() job per level preceded this
    # function's own toPandas of the same distinct ids).
    if id_list is None:
        id_list = sorted(
            int(v)
            for v in ids.select(child_col).distinct().toPandas().iloc[:, 0]
        )
    import pandas as pd

    adj_pdf = adj.toPandas()
    has_w = adj_pdf.shape[1] > 2
    adj_rows = [
        (
            int(t[0]),
            int(t[1]),
            int(t[2]) if has_w and not pd.isna(t[2]) else 1,
        )
        for t in adj_pdf.itertuples(index=False)
    ]
    assignment = _hem_assignment(id_list, adj_rows, fan)
    spark = ids.sparkSession
    return local_rows_df(
        spark, sorted(assignment.items()), f"{child_col} long, {parent_col} long"
    )


def _hem_assignment(
    id_list: list[int], adj_rows: list[tuple[int, int, int]], fan: int
) -> dict[int, int]:
    """Driver-side heavy-edge-matching core of ``derive_parent_map_topo``
    (shared with the auto-hierarchy loop, which already holds the id list
    and weighted adjacency as plain rows): child id → dense parent id."""
    import math

    known = set(id_list)
    w: dict = {}
    for a, b, cw in adj_rows:
        if a == b or a not in known or b not in known:
            continue
        k = (a, b) if a < b else (b, a)
        w[k] = w.get(k, 0) + cw

    root = {i: i for i in id_list}

    def find(x):
        while root[x] != x:
            root[x] = root[root[x]]
            x = root[x]
        return x

    size = {i: 1 for i in id_list}
    for _ in range(max(1, int(math.log2(fan)))):
        if not w:
            break
        merged: set = set()
        for (a, b), _cw in sorted(w.items(), key=lambda kv: (-kv[1], kv[0])):
            if a in merged or b in merged or size[a] + size[b] > fan:
                continue
            merged.add(a)
            merged.add(b)
            root[b] = a
            size[a] += size[b]
        # contract: re-key edge weights onto the surviving roots
        nw: dict = {}
        for (a, b), cw in w.items():
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            k = (ra, rb) if ra < rb else (rb, ra)
            nw[k] = nw.get(k, 0) + cw
        w = nw
    roots = sorted({find(i) for i in id_list})
    parent_rank = {r: p for p, r in enumerate(roots)}
    return {i: parent_rank[find(i)] for i in id_list}


# Above this many partition ids the driver-side BFS derivation hands
# over to the rank-only grouping (collect stays metadata-bounded).
MAX_TOPO_DERIVE_IDS = 2_000_000


def _auto_hierarchy_route(
    edges: DataFrame,
    cells: DataFrame,
    inter: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    *,
    est1: int,
    auto_fan: int,
    n_cell_squarings: int,
    n_super_squarings: int,
    n_region_squarings: int,
    n_overlay_rounds: int,
    max_overlay_rows: int,
) -> DataFrame:
    """Zero-config escalation loop for ``route_many_to_many`` (VERDICT
    r6 #5): derive rank-coarsened parent maps (``derive_parent_map``)
    level by level — fan ``auto_fan`` for the first, 4 after (the
    explicit planet map's 2×2 shape) — re-estimating each level's
    overlay (Σ per-partition boundary cliques + cross edges, computed
    from the inter-cell edges and the accumulated node→partition map;
    no closure work spent deciding) until the estimate fits the
    collect budget. The estimate upper-bounds the actual overlay row
    count, so the final gated collect cannot trip; termination is
    guaranteed because group counts shrink geometrically until a
    single partition, whose cross-edge set (hence estimate) is zero.
    Squaring counts for derived levels beyond the third grow by one
    per level — an under-specified count fails LOUDLY in the closure
    kernel's fixed-point probe, never silently under-converges."""
    spark = edges.sparkSession
    # ONE fused metadata pull starts the loop (r14, guide §1 job count):
    # the bounded distinct cell-id list and the level-0 cell adjacency
    # arrive as one tagged union — previously a count() + two toPandas
    # per level. ``inter`` already carries src_cell/dst_cell, so the
    # level-0 adjacency needs no node-level join at all.
    first = (
        inter.groupBy(
            F.col("src_cell").alias("a"), F.col("dst_cell").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .select(F.lit("adj").alias("tag"), "a", "b", "w")
        .unionByName(
            cells.select(F.col("cell").alias("a"))
            .distinct()
            .limit(MAX_TOPO_DERIVE_IDS + 1)
            .select(
                F.lit("id").alias("tag"),
                "a",
                F.lit(None).cast("long").alias("b"),
                F.lit(None).cast("long").alias("w"),
            )
        )
        .toPandas()
    )
    cur_ids = sorted(int(v) for v in first.loc[first["tag"] == "id", "a"])
    if len(cur_ids) > MAX_TOPO_DERIVE_IDS:
        # metadata gate tripped: hand the whole escalation to the
        # distributed rank-grouping loop (collect stays bounded)
        return _auto_hierarchy_route_distributed(
            edges, cells, inter, sources, targets,
            est1=est1, auto_fan=auto_fan,
            n_cell_squarings=n_cell_squarings,
            n_super_squarings=n_super_squarings,
            n_region_squarings=n_region_squarings,
            n_overlay_rounds=n_overlay_rounds,
            max_overlay_rows=max_overlay_rows,
        )
    adj_rows = [
        (int(a), int(b), int(w))
        for a, b, w in first.loc[first["tag"] == "adj",
                                 ["a", "b", "w"]].itertuples(
            index=False, name=None
        )
    ]
    # driver-composed escalation (r14): the parent maps are ALREADY
    # driver-derived (heavy-edge matching on the metadata-sized cell
    # graph), so the composed cell→part map is driver state too; each
    # level then costs exactly ONE distributed action — the fused
    # (estimate ∪ next-level adjacency) aggregate over ``inter``'s
    # cell-annotated rows — instead of a node-level node_part join
    # chain with per-level checkpoints, a count, and two toPandas.
    maps_dicts: list[dict[int, int]] = []
    cell2part = {c: c for c in cur_ids}
    est_k = est1
    fan = auto_fan
    while est_k > max_overlay_rows:
        # adjacency-aware compact clustering (r8): rank-only grouping
        # turns row-major grids into full-width strips whose boundary
        # cliques made derived-hierarchy closures ~5× the explicit maps'
        assignment = _hem_assignment(cur_ids, adj_rows, fan)
        maps_dicts.append(assignment)
        cell2part = {c: assignment[p] for c, p in cell2part.items()}
        pc = local_rows_df(
            spark, sorted(cell2part.items()), "cell long, part long"
        )
        cross = (
            inter.join(
                F.broadcast(
                    pc.withColumnsRenamed(
                        {"cell": "src_cell", "part": "s_p"}
                    )
                ),
                "src_cell",
            )
            .join(
                F.broadcast(
                    pc.withColumnsRenamed(
                        {"cell": "dst_cell", "part": "d_p"}
                    )
                ),
                "dst_cell",
            )
            .where(F.col("s_p") != F.col("d_p"))
        )
        bc = (
            cross.select(F.col("src").alias("node_id"),
                         F.col("s_p").alias("part"))
            .union(cross.select(F.col("dst").alias("node_id"),
                                F.col("d_p").alias("part")))
            .distinct()
            .groupBy("part")
            .agg(F.count("*").alias("nb"))
        )
        pull = (
            bc.agg(
                F.coalesce(
                    F.sum(F.col("nb") * (F.col("nb") - 1)), F.lit(0)
                ).alias("a")
            )
            .crossJoin(cross.agg(F.count(F.lit(1)).alias("b")))
            .select(F.lit("est").alias("tag"), "a", "b",
                    F.lit(None).cast("long").alias("w"))
            .unionByName(
                cross.groupBy(
                    F.col("s_p").alias("a"), F.col("d_p").alias("b")
                )
                .agg(F.count(F.lit(1)).alias("w"))
                .select(F.lit("adj").alias("tag"), "a", "b", "w")
            )
            .toPandas()
        )
        est_row = pull.loc[pull["tag"] == "est"].iloc[0]
        est_k = int(est_row["a"]) + int(est_row["b"])
        adj_rows = [
            (int(a), int(b), int(w))
            for a, b, w in pull.loc[pull["tag"] == "adj",
                                    ["a", "b", "w"]].itertuples(
                index=False, name=None
            )
        ]
        cur_ids = sorted(set(assignment.values()))
        fan = 4
    maps: list[DataFrame] = [
        local_rows_df(spark, sorted(d.items()), "child long, parent long")
        for d in maps_dicts
    ]
    if len(maps) == 1:
        return two_level_many_to_many(
            edges, cells,
            maps[0].select(
                F.col("child").alias("cell"),
                F.col("parent").alias("supercell"),
            ),
            sources, targets,
            n_cell_squarings=n_cell_squarings,
            n_super_squarings=n_super_squarings,
            n_overlay_rounds=n_overlay_rounds,
            max_overlay_rows=max_overlay_rows,
            _checkpointed=True,
        )
    level_squarings = [n_super_squarings, n_region_squarings] + [
        n_region_squarings + 1 + i for i in range(len(maps) - 2)
    ]
    return multi_level_many_to_many(
        edges, cells, maps, sources, targets,
        n_cell_squarings=n_cell_squarings,
        level_squarings=level_squarings[: len(maps)],
        n_overlay_rounds=n_overlay_rounds,
        max_overlay_rows=max_overlay_rows,
        _checkpointed=True,
    )


def _auto_hierarchy_route_distributed(
    edges: DataFrame,
    cells: DataFrame,
    inter: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    *,
    est1: int,
    auto_fan: int,
    n_cell_squarings: int,
    n_super_squarings: int,
    n_region_squarings: int,
    n_overlay_rounds: int,
    max_overlay_rows: int,
) -> DataFrame:
    """The pre-r14 fully distributed escalation loop, kept as the
    fallback for extracts whose distinct cell-id count exceeds
    ``MAX_TOPO_DERIVE_IDS`` (the driver must not hold the cell graph):
    per level, a node-level node_part join chain derives the rank-only
    parent map and re-estimates the overlay."""
    spark = edges.sparkSession
    maps: list[DataFrame] = []
    node_part = cells.select("node_id", F.col("cell").alias("part"))
    cur_ids = cells.select(F.col("cell").alias("child")).distinct()
    est_k = est1
    fan = auto_fan
    while est_k > max_overlay_rows:
        m = derive_parent_map(cur_ids, "child", "parent", fan).localCheckpoint(
            eager=False
        )
        maps.append(m)
        node_part = (
            node_part.join(m.withColumnRenamed("child", "part"), "part")
            .select("node_id", F.col("parent").alias("part"))
            .localCheckpoint(eager=False)
        )
        cross = (
            inter.select("src", "dst")
            .join(
                node_part.withColumnsRenamed(
                    {"node_id": "src", "part": "s_p"}
                ),
                "src",
            )
            .join(
                node_part.withColumnsRenamed(
                    {"node_id": "dst", "part": "d_p"}
                ),
                "dst",
            )
            .where(F.col("s_p") != F.col("d_p"))
        )
        bc = (
            cross.select(F.col("src").alias("node_id"))
            .union(cross.select(F.col("dst").alias("node_id")))
            .distinct()
            .join(node_part, "node_id")
            .groupBy("part")
            .agg(F.count("*").alias("nb"))
        )
        row = (
            bc.agg(
                F.coalesce(
                    F.sum(F.col("nb") * (F.col("nb") - 1)), F.lit(0)
                ).alias("clique")
            )
            .crossJoin(cross.agg(F.count(F.lit(1)).alias("n_cross")))
            .collect()[0]
        )
        est_k = int(row["clique"]) + int(row["n_cross"])
        cur_ids = m.select(F.col("parent").alias("child")).distinct()
        fan = 4
    if len(maps) == 1:
        return two_level_many_to_many(
            edges, cells,
            maps[0].select(
                F.col("child").alias("cell"),
                F.col("parent").alias("supercell"),
            ),
            sources, targets,
            n_cell_squarings=n_cell_squarings,
            n_super_squarings=n_super_squarings,
            n_overlay_rounds=n_overlay_rounds,
            max_overlay_rows=max_overlay_rows,
            _checkpointed=True,
        )
    level_squarings = [n_super_squarings, n_region_squarings] + [
        n_region_squarings + 1 + i for i in range(len(maps) - 2)
    ]
    return multi_level_many_to_many(
        edges, cells, maps, sources, targets,
        n_cell_squarings=n_cell_squarings,
        level_squarings=level_squarings[: len(maps)],
        n_overlay_rounds=n_overlay_rounds,
        max_overlay_rows=max_overlay_rows,
        _checkpointed=True,
    )


def route_many_to_many(
    edges: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    *,
    cells: DataFrame | None = None,
    supercells: DataFrame | None = None,
    regions: DataFrame | None = None,
    n_squarings: int | None = None,
    n_cell_squarings: int = 6,
    n_super_squarings: int = 7,
    n_region_squarings: int = 8,
    n_overlay_rounds: int = 64,
    max_overlay_rows: int = MAX_OVERLAY_ROWS,
    auto_hierarchy: bool = True,
    auto_fan: int = 16,
) -> DataFrame:
    """ONE entry point for many-to-many shortest paths (VERDICT r4
    next-round #5): picks the backend so no caller can run the V×V
    closure on a big graph by accident.

    - no ``cells``: the exact all-pairs min-plus closure backend
      (``closure_rows_gated`` — REFUSES graphs above
      ``MAX_CLOSURE_VERTS``), joined to sources/targets.
    - ``cells`` given (the partition IS the scale contract): the
      partitioned CRP backends. Single-level while the estimated level-1
      overlay (Σ per-cell boundary cliques + inter-cell edges) fits
      ``max_overlay_rows``; beyond that the two-level hierarchy; and
      when even the estimated LEVEL-2 overlay (Σ per-supercell
      boundary₂ cliques + inter-supercell edges) exceeds the budget,
      the THREE-level hierarchy (``multi_level_many_to_many``, the
      planet path).

    Hierarchy maps are OPTIONAL (VERDICT r6 #5): with
    ``auto_hierarchy`` on (default), a missing ``supercells`` map is
    derived from the cell ids themselves (``derive_parent_map`` —
    ``auto_fan`` consecutive rank-ordered cells per supercell) and a
    missing ``regions`` map from the derived supercell ids (4 per
    region), so ANY oversized extract routes with zero caller topology
    knowledge — the reference's planet recipe never asks its user for
    a partition either (osm2osrm.sh:32-33). Explicit maps always win
    when passed (and with explicit ``supercells`` but no ``regions``
    the level-2 estimate is skipped, preserving the pre-r7 two-level
    path byte-for-byte); ``auto_hierarchy=False`` restores the loud
    refusal. Results are identical either way — the partition moves
    cost, not answers.

    The overlay estimates need only the inter-cell edge endpoints — no
    closure work is spent deciding — and run on checkpointed inputs so
    a lineage-heavy extraction is compiled once. Returns (src_id,
    tgt_id, dist); the weight type follows the input (the closure
    backend routes doubles, the CRP backends are integer-exact by
    contract).
    """
    if cells is None:
        # closure backend: ONE collect of the edge list (the closure is
        # about to be held driver-side anyway); size-gated inside
        rows = closure_rows_gated(edges, n_squarings=n_squarings)
        spark = edges.sparkSession
        # closure rows come back as Python floats regardless of the edge
        # weight type; integer-weighted closures are integral-valued, so
        # casting back to the input type is exact
        w_type = dict(edges.dtypes)["w"]
        cl = local_rows_df(spark, rows, "src long, dst long, w double")
        return (
            sources.join(cl, sources["node_id"] == cl["src"])
            .join(targets, cl["dst"] == targets["node_id"])
            .select("src_id", "tgt_id", "w")
            # explicit zero self-term: an isolated shared node appears in
            # no edge row, hence in no closure row — its diagonal is
            # emitted here (see _self_zero_pairs)
            .union(
                _self_zero_pairs(sources, targets)
                .select("src_id", "tgt_id", F.col("d").cast("double"))
            )
            .groupBy("src_id", "tgt_id")
            .agg(F.min("w").cast(w_type).alias("dist"))
        )
    # CRP backends: checkpoint the extracted graph ONCE before the
    # estimator touches it — lineage-heavy inputs (an XML scan + explode
    # + window, as from sources.osm) would otherwise re-run per probe
    # (measured ~2× the whole query). LAZY (r13): the returned frame is
    # LogicalRDD-backed either way (lineage truncated, single cached
    # copy); eager=False folds the materialization into the estimator's
    # aggregate job instead of scheduling a dedicated job per table —
    # the CRP build is a chain of ~dozens of such barriers and the
    # per-job overhead, not bytes, dominated the measured wall
    # (guide §1.2/§2: fix the job count first).
    edges = edges.localCheckpoint(eager=False)
    cells = cells.localCheckpoint(eager=False)
    inter = inter_cell_edges(edges, cells)
    bc = (
        inter.select(F.col("src").alias("node_id"))
        .union(inter.select(F.col("dst").alias("node_id")))
        .distinct()
        .join(cells, "node_id")
        .groupBy("cell")
        .agg(F.count("*").alias("nb"))
    )
    # ONE action for the whole estimate: clique sum and inter-edge count
    # as a 1×1 cross join — a separate count() would schedule a second
    # job over the same (checkpointed) inputs for no information gain.
    # With BOTH hierarchy maps given (the three-level caller), the
    # level-2 estimate joins the same action (r14, guide §1: the two
    # gated estimates ran as back-to-back driver collects; fusing them
    # drops one scheduled action + its planning gap, and the extra
    # aggregate is wasted only when est1 already fits — a metadata-sized
    # aggregate in the same job either way).
    est_df = bc.agg(
        F.coalesce(
            F.sum(F.col("nb") * (F.col("nb") - 1)), F.lit(0)
        ).alias("clique")
    ).crossJoin(inter.agg(F.count(F.lit(1)).alias("n_inter")))
    est2 = None
    if supercells is not None and regions is not None:
        node_sc = cells.join(supercells, "cell").select(
            "node_id", "supercell"
        )
        isc = (
            inter.join(
                node_sc.withColumnsRenamed(
                    {"node_id": "src", "supercell": "s_sc"}
                ),
                "src",
            )
            .join(
                node_sc.withColumnsRenamed(
                    {"node_id": "dst", "supercell": "d_sc"}
                ),
                "dst",
            )
            .where(F.col("s_sc") != F.col("d_sc"))
        )
        b2c = (
            isc.select(F.col("src").alias("node_id"))
            .union(isc.select(F.col("dst").alias("node_id")))
            .distinct()
            .join(node_sc, "node_id")
            .groupBy("supercell")
            .agg(F.count("*").alias("nb"))
        )
        est_df = est_df.crossJoin(
            b2c.agg(
                F.coalesce(
                    F.sum(F.col("nb") * (F.col("nb") - 1)), F.lit(0)
                ).alias("clique2")
            )
        ).crossJoin(isc.agg(F.count(F.lit(1)).alias("n_cross2")))
    est_row = est_df.collect()[0]
    est = int(est_row["clique"]) + int(est_row["n_inter"])
    if est2 is None and supercells is not None and regions is not None:
        est2 = int(est_row["clique2"]) + int(est_row["n_cross2"])
    if est <= max_overlay_rows:
        return partitioned_many_to_many(
            edges, cells, sources, targets,
            n_cell_squarings=n_cell_squarings,
            n_overlay_rounds=n_overlay_rounds,
            max_overlay_rows=max_overlay_rows,
            _checkpointed=True,
        )
    if supercells is None:
        if not auto_hierarchy:
            raise ValueError(
                f"route_many_to_many: estimated level-1 overlay {est} "
                f"rows > max_overlay_rows={max_overlay_rows}; pass "
                "`supercells` for the two-level hierarchy (or use "
                "smaller cells, or leave auto_hierarchy on)"
            )
        # zero-config escalation (VERDICT r6 #5): derive parent maps
        # from the cell ids themselves — the caller needs no topology
        # knowledge, exactly like the reference's planet recipe — and
        # keep deriving LEVELS until the estimated top overlay fits the
        # budget (derived rank-strips have larger boundaries than a
        # bespoke grid map, so a fixed three-level cap would not hold
        # at every size). The maps change only cost, never results.
        return _auto_hierarchy_route(
            edges, cells, inter, sources, targets,
            est1=est,
            auto_fan=auto_fan,
            n_cell_squarings=n_cell_squarings,
            n_super_squarings=n_super_squarings,
            n_region_squarings=n_region_squarings,
            n_overlay_rounds=n_overlay_rounds,
            max_overlay_rows=max_overlay_rows,
        )
    if regions is not None:
        # the LEVEL-2 overlay estimate (inter-supercell edge endpoints
        # only — no closure work spent deciding) was computed in the
        # SAME collect as est1 above: if it too exceeds the budget,
        # escalate to the three-level hierarchy
        if est2 is not None and est2 > max_overlay_rows:
            sc_cols = supercells.columns
            rg_cols = regions.columns
            return multi_level_many_to_many(
                edges, cells,
                [
                    supercells.select(
                        F.col(sc_cols[0]).alias("child"),
                        F.col(sc_cols[1]).alias("parent"),
                    ),
                    regions.select(
                        F.col(rg_cols[0]).alias("child"),
                        F.col(rg_cols[1]).alias("parent"),
                    ),
                ],
                sources, targets,
                n_cell_squarings=n_cell_squarings,
                level_squarings=[n_super_squarings, n_region_squarings],
                n_overlay_rounds=n_overlay_rounds,
                max_overlay_rows=max_overlay_rows,
                _checkpointed=True,
            )
    return two_level_many_to_many(
        edges, cells, supercells, sources, targets,
        n_cell_squarings=n_cell_squarings,
        n_super_squarings=n_super_squarings,
        n_overlay_rounds=n_overlay_rounds,
        max_overlay_rows=max_overlay_rows,
        _checkpointed=True,
    )
