"""Bench emission contract (VERDICT r6 next-round #1): the one stdout
line must stay inside the driver's tail capture whatever the suite
grows to — round 6 lost its headline number to an oversized line."""

from __future__ import annotations

import json

import bench


# The driver's tail capture demonstrably holds ~4 KiB (r6's lost line
# exceeded it; every line under 4000 bytes has parsed). Growth guard
# (VERDICT r7 #7): the compact line at worst-case widths must keep
# >=20% headroom under that cap, so headline growth trips a test
# failure instead of a lost round record.
CAPTURE_CAP_BYTES = 4000


def test_compact_line_parses_and_stays_small():
    rec = {
        "metric": "headline_suite_wall_seconds",
        "value": 123.456,
        "unit": "sec",
        "queries": {name: 12.345678 for name in bench.HEADLINE},
        "sf": 0.1,
        "load": {"start": 31.99, "end": 31.99},
        "anchor_prev": {
            "commit": "0" * 40,
            "value": 111.222,
            # full anchor records also carry per-query timings — the
            # compact line must DROP them
            "queries": {name: 9.87 for name in bench.HEADLINE},
        },
    }
    line = bench.compact_line(rec)
    parsed = json.loads(line)
    assert parsed["value"] == 123.456
    assert parsed["anchor_prev"] == {"commit": "0" * 40, "value": 111.222}
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    assert parsed["load"] == {"start": 31.99, "end": 31.99}
    assert len(line) <= 0.8 * CAPTURE_CAP_BYTES, len(line)


def test_headline_names_registered_and_unique():
    from ram_datapipeline_spark import queries as Q

    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    missing = [n for n in bench.HEADLINE if n not in Q.REGISTRY]
    assert not missing, missing
