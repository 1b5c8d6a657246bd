"""Bench emission contract (VERDICT r6 #1, r8 #1): the one stdout line
must stay inside the driver's tail capture whatever the suite grows to.
Round 6 and round 8 both lost their headline numbers to oversized lines;
r8 established the capture is only ~2,000 bytes (the 2,422-byte line's
head fell off while the r7 guard, sized against an assumed 4,000-byte
cap, passed). The fix is structural: per-query timings no longer appear
on stdout at all (they live in artifacts/BENCH_local_detail.json), so
the line has a FIXED field set and cannot grow with HEADLINE."""

from __future__ import annotations

import json

import bench


# Empirically measured from BENCH_r08.json: the driver's tail field held
# exactly 2,000 bytes of a 2,422-byte line. The compact line must keep
# >=20% headroom under that measured cap at worst-case field widths.
CAPTURE_CAP_BYTES = 2000


def _worst_case_rec() -> dict:
    return {
        "metric": "headline_suite_wall_seconds",
        "value": 99999.999,
        "unit": "sec",
        # full records carry per-query timings — the compact line must
        # DROP them (this is the field that grew past the capture twice)
        "queries": {name: 12.345678 for name in bench.HEADLINE},
        "sf": 0.001,
        "load": {"start": 31.99, "end": 31.99},
        "anchor_prev": {
            "commit": "0" * 40,
            "value": 99999.999,
            "queries": {name: 9.87 for name in bench.HEADLINE},
        },
    }


def test_compact_line_parses_and_stays_small():
    rec = _worst_case_rec()
    line = bench.compact_line(rec)
    parsed = json.loads(line)
    assert parsed["value"] == 99999.999
    assert parsed["anchor_prev"] == {"commit": "0" * 40, "value": 99999.999}
    assert "queries" not in parsed  # timings live in artifacts/, not stdout
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["load"] == {"start": 31.99, "end": 31.99}
    assert len(line) <= 0.8 * CAPTURE_CAP_BYTES, len(line)


def test_compact_line_fixed_size_even_at_10x_suite():
    """The line size must be INDEPENDENT of the suite size — that is the
    structural property that ends the parsed:null failure mode."""
    rec = _worst_case_rec()
    base_len = len(bench.compact_line(rec))
    rec10 = dict(rec)
    rec10["queries"] = {f"q_{i:04d}_padded_name": 12.345678 for i in range(10 * len(bench.HEADLINE))}
    line10 = bench.compact_line(rec10)
    # n_queries grows by at most a few digits; nothing else may move
    assert len(line10) - base_len <= 4, (base_len, len(line10))


def test_compact_line_anchor_error_path():
    rec = _worst_case_rec()
    rec["anchor_prev"] = {"commit": "0" * 12, "error": "x" * 300}
    line = bench.compact_line(rec)
    parsed = json.loads(line)
    assert parsed["anchor_prev"]["error"] == "x" * 300
    assert len(line) <= 0.8 * CAPTURE_CAP_BYTES, len(line)


def test_metric_line_survives_warning_spam_in_tail_capture():
    """VERDICT r9 #2: the r9 tail was >90% ``WARN WindowExec`` spam and
    the metric line survived only because it printed last. Simulate the
    driver's capture — 2,000-byte tail of combined output — with 200
    warning lines emitted BEFORE the metric line (the r9 shape), and
    assert the line is still recoverable by the driver's parse rule
    (last line that starts with '{')."""
    warn = (
        "26/08/15 18:35:57 WARN WindowExec: No Partition Defined for "
        "Window operation! Moving all data to a single partition, this "
        "can cause serious performance degradation.\n"
    )
    line = bench.compact_line(_worst_case_rec())
    combined = warn * 200 + line + "\n"
    tail = combined[-CAPTURE_CAP_BYTES:]
    candidates = [ln for ln in tail.strip().splitlines() if ln.startswith("{")]
    assert candidates, "metric line fell out of the tail capture"
    parsed = json.loads(candidates[-1])
    assert parsed["metric"] == "headline_suite_wall_seconds"


def test_bench_session_silences_warn_logs():
    """The structural guard against the spam itself: silence_bench_logs
    must drop the root log level to ERROR so WindowExec (and every other
    WARN source) cannot write into the tail at all."""
    from ram_datapipeline_spark.session import get_spark

    spark = get_spark()
    bench.silence_bench_logs(spark)
    jvm = spark.sparkContext._jvm
    root = jvm.org.apache.logging.log4j.LogManager.getRootLogger()
    assert str(root.getLevel()) == "ERROR"
    win = jvm.org.apache.logging.log4j.LogManager.getLogger(
        "org.apache.spark.sql.execution.window.WindowExec"
    )
    assert not win.isWarnEnabled()
    # restore the package default so later tests see expected verbosity
    spark.sparkContext.setLogLevel("WARN")


def test_headline_names_registered_and_unique():
    from ram_datapipeline_spark import queries as Q

    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    missing = [n for n in bench.HEADLINE if n not in Q.REGISTRY]
    assert not missing, missing


def test_anchor_degraded_flag():
    """VERDICT r11 #7: a degraded-box anchor phase must be machine-flagged,
    not prose-adjudicated. The flag fires when the anchor's worst loadavg
    exceeds 2x the candidate's (floored at 1.0), never on idle noise or
    missing data."""
    # r11 rep-3 shape: candidate idle, anchor on a loaded box -> flagged
    assert bench.anchor_degraded(
        {"start": 1.2, "end": 2.0}, {"start": 30.1, "end": 12.4}
    )
    # matched idle reps -> not flagged (0.3 vs 0.6 is noise, floor=1.0)
    assert not bench.anchor_degraded(
        {"start": 0.3, "end": 0.2}, {"start": 0.6, "end": 0.5}
    )
    # both genuinely loaded, same magnitude -> not flagged
    assert not bench.anchor_degraded(
        {"start": 10.0, "end": 9.0}, {"start": 12.0, "end": 11.0}
    )
    # anchor failed / no load recorded (pre-r12 anchor commit) -> False
    assert not bench.anchor_degraded({"start": 1.0, "end": 1.0}, None)
    assert not bench.anchor_degraded(None, {"start": 9.9, "end": 9.9})
    # flag rides the compact stdout line when present
    rec = {
        "metric": "headline_suite_wall_seconds", "value": 1.0, "unit": "sec",
        "sf": 0.1, "queries": {"q": 1.0}, "load": {"start": 0.1, "end": 0.1},
        "anchor_prev": {"commit": "abc", "value": 2.0,
                        "load": {"start": 9.0, "end": 9.0}},
        "anchor_degraded": True,
    }
    line = json.loads(bench.compact_line(rec))
    assert line["anchor_degraded"] is True
