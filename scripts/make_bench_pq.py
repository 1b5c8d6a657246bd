#!/usr/bin/env python
"""Assemble the driver-diffable per-query bench record (VERDICT r13 #2).

The bench's stdout contract line cannot carry per-query timings (the
driver tail-captures 2,000 bytes), so cross-round and low-core per-query
data lives in a FIXED committed artifact the driver (or judge) can diff
mechanically: ``artifacts/BENCH_pq_r{N}.json`` with three per-query maps
— candidate @32 cores, same-session anchor (previous round's final
commit) @32 cores, and one candidate rep @8 cores.

Usage:
  python scripts/make_bench_pq.py --round 14 \
      [--detail artifacts/BENCH_local_detail.json] \
      [--c8 artifacts/BENCH_local_c8.json]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--detail",
        default=os.path.join(REPO, "artifacts", "BENCH_local_detail.json"),
    )
    ap.add_argument(
        "--c8", default=os.path.join(REPO, "artifacts", "BENCH_local_c8.json")
    )
    args = ap.parse_args()

    with open(args.detail) as fh:
        detail = json.load(fh)
    try:
        with open(args.c8) as fh:
            c8 = json.load(fh)
    except OSError:
        c8 = {}

    anchor = detail.get("anchor_prev") or {}
    cand = detail.get("queries") or {}
    anch_q = anchor.get("queries") or {}
    c8_q = c8.get("queries") or {}
    common = sorted(set(cand) & set(anch_q))
    ratios = {
        n: round(cand[n] / anch_q[n], 3)
        for n in common
        if anch_q[n] and anch_q[n] > 0
    }
    scale = {
        n: round(c8_q[n] / cand[n], 3)
        for n in sorted(set(cand) & set(c8_q))
        if cand[n] and cand[n] > 0
    }
    rec = {
        "round": args.round,
        "sf": detail.get("sf"),
        "cpus_main": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "cpus_low": 8,
        "total_candidate": detail.get("value"),
        "total_anchor": anchor.get("value"),
        "total_c8": c8.get("value"),
        "anchor_commit": anchor.get("commit"),
        "load_candidate": detail.get("load"),
        "load_anchor": anchor.get("load"),
        "load_c8": c8.get("load"),
        "per_query_candidate": cand,
        "per_query_anchor": anch_q,
        "per_query_c8": c8_q,
        "per_query_ratio_vs_anchor": ratios,
        "per_query_c8_over_c32": scale,
    }
    out = os.path.join(REPO, "artifacts", f"BENCH_pq_r{args.round}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(out)


if __name__ == "__main__":
    main()
