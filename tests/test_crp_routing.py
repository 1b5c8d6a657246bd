"""Partitioned (CRP) routing correctness: the cell-partitioned pipeline
must reproduce plain all-pairs shortest paths exactly, including across
cells, same-cell pairs whose best route leaves the cell, and disconnected
components. Reference semantics: osrm.table many-to-many
(ram-analysis/app/calculate-eta/tasks.js:260) over a contracted graph
(scripts/osm2osrm.sh:32-33)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ram_datapipeline_spark.operators import routing as R


def _grid_edges(w: int, h: int, wt):
    """Directed symmetric edge list for a w×h grid; wt(r, c, horizontal)
    gives the integer weight of the edge leaving (r, c)."""
    rows = []
    for r in range(h):
        for c in range(w):
            nid = r * w + c
            if c + 1 < w:
                ww = wt(r, c, True)
                rows += [(nid, nid + 1, ww), (nid + 1, nid, ww)]
            if r + 1 < h:
                ww = wt(r, c, False)
                rows += [(nid, nid + w, ww), (nid + w, nid, ww)]
    return rows


def _dijkstra_all(edge_rows, sources):
    """Driver-side reference: exact Dijkstra from each source (heapq)."""
    import heapq
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in edge_rows:
        adj[s].append((d, w))
    out = {}
    for src in sources:
        dist = {src: 0}
        pq = [(0, src)]
        while pq:
            dw, u = heapq.heappop(pq)
            if dw > dist.get(u, 1 << 60):
                continue
            for v, w in adj[u]:
                nd = dw + w
                if nd < dist.get(v, 1 << 60):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        out[src] = dist
    return out


def _cells_df(spark, w, h, cell):
    rows = [(r * w + c, (r // cell) * ((w + cell - 1) // cell) + c // cell)
            for r in range(h) for c in range(w)]
    return spark.createDataFrame(rows, "node_id long, cell long")


def test_crp_matches_dijkstra_heterogeneous_grid(spark):
    """12×12 grid, 4×4 cells, weights varying so shortest paths detour
    through fast corridors (including leaving and re-entering a cell):
    every (source, target) distance must equal plain Dijkstra."""
    w = h = 12
    # row/column speed tiers: every 3rd row is a 'motorway' (weight 1),
    # others cost 7 — strong incentive to detour out of a cell.
    wt = lambda r, c, horiz: 1 if (horiz and r % 3 == 0) or (not horiz and c % 3 == 0) else 7  # noqa: E731
    edge_rows = _grid_edges(w, h, wt)
    edges = spark.createDataFrame(edge_rows, "src long, dst long, w long")
    cells = _cells_df(spark, w, h, 4)
    src_nodes = [0, 5, 77, 143, 70]
    tgt_nodes = list(range(0, w * h, 7)) + [143]
    sources = spark.createDataFrame(
        [(i, n) for i, n in enumerate(src_nodes)], "src_id long, node_id long"
    )
    targets = spark.createDataFrame(
        [(i, n) for i, n in enumerate(tgt_nodes)], "tgt_id long, node_id long"
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["dist"]
        for r in R.partitioned_many_to_many(
            edges, cells, sources, targets,
            n_cell_squarings=4, n_overlay_rounds=24,
        ).collect()
    }
    ref = _dijkstra_all(edge_rows, src_nodes)
    for si, sn in enumerate(src_nodes):
        for ti, tn in enumerate(tgt_nodes):
            assert got[(si, ti)] == ref[sn][tn], (sn, tn)
    assert len(got) == len(src_nodes) * len(tgt_nodes)


def test_crp_disconnected_pairs_absent(spark):
    """Two components split across cells: unreachable pairs produce NO
    row (the osrm.table null-cell semantic upstream callers map from
    absence)."""
    # component A: nodes 0-1 (cell 0); component B: nodes 10-11 (cell 1)
    rows = [(0, 1, 3), (1, 0, 3), (10, 11, 4), (11, 10, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    cells = spark.createDataFrame(
        [(0, 0), (1, 0), (10, 1), (11, 1)], "node_id long, cell long"
    )
    sources = spark.createDataFrame([(0, 0)], "src_id long, node_id long")
    targets = spark.createDataFrame(
        [(0, 1), (1, 11)], "tgt_id long, node_id long"
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["dist"]
        for r in R.partitioned_many_to_many(
            edges, cells, sources, targets,
            n_cell_squarings=2, n_overlay_rounds=4,
        ).collect()
    }
    assert got == {(0, 0): 3}  # 0→1 reachable; 0→11 absent


def test_overlay_convergence_probe_raises_when_rounds_too_small(spark):
    """A path chain needing 5 overlay hops must trip the convergence
    probe at n_rounds=2 instead of silently returning bounded-hop
    distances."""
    # chain of 6 single-node cells: every edge is inter-cell
    rows = []
    for i in range(5):
        rows += [(i, i + 1, 1), (i + 1, i, 1)]
    ovl = rows
    seeds = [(0, 0, 0)]
    with pytest.raises(RuntimeError, match="not converged"):
        R.multi_source_overlay_dist(ovl, seeds, n_rounds=2)
    ok = R.multi_source_overlay_dist(ovl, seeds, n_rounds=5)
    assert (0, 5, 5) in ok


def test_in_cell_closures_rejects_oversized_cell(spark):
    n = R.MAX_CELL_NODES + 1
    rows = [(i, i + 1, 1) for i in range(n - 1)]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    cells = spark.createDataFrame(
        [(i, 0) for i in range(n)], "node_id long, cell long"
    )
    with pytest.raises(Exception, match="MAX_CELL_NODES"):
        R.in_cell_closures(edges, cells, 1).count()


def test_in_cell_closure_exact_within_cell(spark):
    """Per-cell closure rows equal within-cell Dijkstra (cells isolated
    by construction here)."""
    wt = lambda r, c, horiz: 2 + (r + c) % 3  # noqa: E731
    edge_rows = _grid_edges(4, 4, wt)  # one 4×4 cell
    edges = spark.createDataFrame(edge_rows, "src long, dst long, w long")
    cells = spark.createDataFrame(
        [(i, 7) for i in range(16)], "node_id long, cell long"
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in R.in_cell_closures(edges, cells, 4).collect()
    }
    ref = _dijkstra_all(edge_rows, list(range(16)))
    for s in range(16):
        for d in range(16):
            assert got[(s, d)] == ref[s][d]


def test_seed_collect_gate_raises_with_fusion_hint(spark, monkeypatch):
    """VERDICT r4 #2: an oversized per-origin source set must trip the
    MAX_SEED_ROWS gate LOUDLY (with the min-fusion hint) instead of
    silently building driver-side overlay state."""
    monkeypatch.setattr(R, "MAX_SEED_ROWS", 3)
    wt = lambda r, c, horiz: 2  # noqa: E731
    edge_rows = _grid_edges(8, 8, wt)
    edges = spark.createDataFrame(edge_rows, "src long, dst long, w long")
    cells = _cells_df(spark, 8, 8, 4)
    sources = spark.createDataFrame(
        [(i, i) for i in range(8)], "src_id long, node_id long"
    )
    targets = spark.createDataFrame(
        [(0, 63)], "tgt_id long, node_id long"
    )
    with pytest.raises(ValueError, match="min-fuse"):
        R.partitioned_many_to_many(
            edges, cells, sources, targets,
            n_cell_squarings=4, n_overlay_rounds=16,
        )


def test_overlay_state_gate_raises(spark, monkeypatch):
    """The (n_sources × n_boundary) driver matrix is gated too."""
    monkeypatch.setattr(R, "MAX_OVERLAY_STATE", 4)
    wt = lambda r, c, horiz: 2  # noqa: E731
    edge_rows = _grid_edges(8, 8, wt)
    edges = spark.createDataFrame(edge_rows, "src long, dst long, w long")
    cells = _cells_df(spark, 8, 8, 4)
    sources = spark.createDataFrame(
        [(0, 0), (1, 9)], "src_id long, node_id long"
    )
    targets = spark.createDataFrame([(0, 63)], "tgt_id long, node_id long")
    with pytest.raises(ValueError, match="MAX_OVERLAY_STATE"):
        R.partitioned_many_to_many(
            edges, cells, sources, targets,
            n_cell_squarings=4, n_overlay_rounds=16,
        )


def test_crp_single_node_cells(spark):
    """Boundary nodes in single-node cells (no in-cell edges, hence no
    closure rows at all): sources and targets sitting on them must still
    route — via implicit zero legs — including source == target."""
    # chain 0-1-2, one cell per node: every edge is inter-cell
    rows = [(0, 1, 5), (1, 0, 5), (1, 2, 7), (2, 1, 7)]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    cells = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2)], "node_id long, cell long"
    )
    sources = spark.createDataFrame([(0, 0)], "src_id long, node_id long")
    targets = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2)], "tgt_id long, node_id long"
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["dist"]
        for r in R.partitioned_many_to_many(
            edges, cells, sources, targets,
            n_cell_squarings=1, n_overlay_rounds=4,
        ).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 5, (0, 2): 12}
