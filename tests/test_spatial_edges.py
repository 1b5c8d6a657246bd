"""Half-open point-in-polygon edge semantics (VERDICT r1 #6).

Both PIP paths — the JVM rectangle predicate (functions.geo.point_in_rect)
and the Arrow ray-casting kernel (operators.spatial.geojson_contains) —
must implement the SAME half-open rule [xmin,xmax) × [ymin,ymax), so that
a point exactly on a shared edge of a partition grid lands in EXACTLY ONE
cell under either path.
"""

from __future__ import annotations

import json

import pytest

from ram_datapipeline_spark.operators.spatial import (
    geojson_contains,
    points_in_geojson_areas,
    points_in_rect_areas,
)


def _rect_geojson(x0, y0, x1, y1):
    return json.dumps(
        {
            "type": "Polygon",
            "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
        }
    )


# one unit rectangle [0,1) × [0,1): every edge/corner case spelled out
EDGE_CASES = [
    ((0.0, 0.0), True),   # min corner: in (both min edges closed)
    ((0.0, 0.5), True),   # left edge: in
    ((0.5, 0.0), True),   # bottom edge: in
    ((1.0, 0.5), False),  # right edge: out (max open)
    ((0.5, 1.0), False),  # top edge: out
    ((1.0, 1.0), False),  # max corner: out
    ((1.0, 0.0), False),  # bottom-right corner: out (x at max)
    ((0.0, 1.0), False),  # top-left corner: out (y at max)
    ((0.5, 0.5), True),   # interior sanity
    ((-0.0, 0.5), True),  # negative zero coincides with the min edge
]


@pytest.mark.parametrize(("pt", "want"), EDGE_CASES)
def test_raycast_kernel_half_open(pt, want):
    g = _rect_geojson(0.0, 0.0, 1.0, 1.0)
    assert geojson_contains(g, pt[0], pt[1]) is want


def test_rect_and_raycast_paths_agree_on_edges(spark):
    """Run BOTH join paths over a 2×1 grid of adjacent rectangles with
    points deliberately placed on shared edges and corners: identical
    assignments, and every point inside the tiling's overall half-open
    extent lands in exactly one cell."""
    pts = [
        (0, 0.0, 0.0),   # min corner of cell A
        (1, 1.0, 0.0),   # shared edge: must belong to cell B only
        (2, 1.0, 0.5),   # shared edge midpoint: cell B only
        (3, 2.0, 0.5),   # right edge of B: outside both
        (4, 0.5, 1.0),   # top edge: outside both
        (5, 1.5, 0.25),  # interior of B
        (6, 0.999999999999, 0.5),  # just inside A
    ]
    points = spark.createDataFrame(pts, "pid long, lon double, lat double")
    rects = spark.createDataFrame(
        [(10, 0.0, 0.0, 1.0, 1.0), (11, 1.0, 0.0, 2.0, 1.0)],
        "aa_id long, xmin double, ymin double, xmax double, ymax double",
    )
    areas = spark.createDataFrame(
        [(10, _rect_geojson(0.0, 0.0, 1.0, 1.0)), (11, _rect_geojson(1.0, 0.0, 2.0, 1.0))],
        "aa_id long, geometry string",
    )
    via_rect = {
        (r["pid"], r["aa_id"])
        for r in points_in_rect_areas(points, rects).select("pid", "aa_id").collect()
    }
    via_ray = {
        (r["pid"], r["aa_id"])
        for r in points_in_geojson_areas(points, areas).select("pid", "aa_id").collect()
    }
    assert via_rect == via_ray
    assert via_rect == {(0, 10), (1, 11), (2, 11), (5, 11), (6, 10)}
    # exactly-one-cell property: no point appears twice
    pids = [p for p, _ in via_rect]
    assert len(pids) == len(set(pids))


def test_polygon_shoelace_known_shapes(spark):
    """Shoelace against analytically-known rings: unit square (CCW area
    +1, centroid center), its CW reverse (area −1), and a degenerate
    zero-area ring (NULL centroid, no NaN)."""
    from ram_datapipeline_spark.operators.spatial import polygon_shoelace

    sq = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    rows = spark.createDataFrame(
        [
            (1, sq),
            (2, list(reversed(sq))),
            (3, [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [0.0, 0.0]]),
        ],
        "rid long, coords array<array<double>>",
    ).select("rid", polygon_shoelace("coords").alias("g")).collect()
    out = {r.rid: r.g for r in rows}
    assert out[1].area == 1.0 and (out[1].cx, out[1].cy) == (0.5, 0.5)
    assert out[2].area == -1.0 and (out[2].cx, out[2].cy) == (0.5, 0.5)
    assert out[3].area == 0.0 and out[3].cx is None and out[3].cy is None
