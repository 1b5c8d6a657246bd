#!/usr/bin/env python
"""Full-sweep per-query wall-time trend diff (VERDICT r11 #3): compare
this round's sweep-times record against the prior round's and print
every off-headline regression passing the same screen the headline
bench uses — ratio >= 1.3x AND absolute delta >= 0.3s.

Usage:
    python scripts/sweep_times_diff.py NEW.json OLD.{json|txt}

NEW is a --times-out record from scripts/verify_driver_contract.py.
OLD is either another such record or a committed VERIFY_r{N}*.txt sweep
log (per-line "(X.Xs)" timings — those include the DuckDB oracle +
hashing overhead, so the diff compares against NEW's "total_s" field,
which has the same semantics). Exit 0 always — the diff is a report,
not a gate; the round report names what it prints.
"""

from __future__ import annotations

import json
import re
import sys

RATIO = 1.3
ABS_S = 0.3


def load_times(path: str) -> dict[str, float]:
    if path.endswith(".json"):
        rec = json.load(open(path))
        return {
            k: (v["total_s"] if isinstance(v, dict) else float(v))
            for k, v in rec["times"].items()
        }
    # VERIFY txt sweep log: "[OK ] name: ... (12.3s)" / "[rows-only] name: ..."
    out: dict[str, float] = {}
    pat = re.compile(r"^\[(?:OK |rows-only|FAIL)\]\s+(\S+?):.*\((\d+\.?\d*)s\)")
    for ln in open(path):
        m = pat.match(ln.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def load_spark_only(path: str) -> dict[str, float] | None:
    """spark_s per query when the record has it (JSON --times-out only).
    The committed VERIFY txt logs time engine + DuckDB oracle + hashing
    together, and the oracle side dominates several rows (measured:
    eta_routed_osm_large = 9s Spark + 971s DuckDB at sf0.1) — so a
    txt-vs-json diff screens COARSELY and the spark-only totals are the
    trend that actually reflects the engine."""
    if not path.endswith(".json"):
        return None
    rec = json.load(open(path))
    if not all(isinstance(v, dict) and "spark_s" in v for v in rec["times"].values()):
        return None
    return {k: v["spark_s"] for k, v in rec["times"].items()}


def main() -> int:
    new_p, old_p = sys.argv[1], sys.argv[2]
    new, old = load_times(new_p), load_times(old_p)
    common = sorted(set(new) & set(old))
    print(f"common queries: {len(common)} (new-only: {len(set(new) - set(old))},"
          f" old-only: {len(set(old) - set(new))})")
    regressions = []
    improvements = []
    for name in common:
        n, o = new[name], old[name]
        if o > 0 and n / o >= RATIO and n - o >= ABS_S:
            regressions.append((n / o, name, o, n))
        elif n > 0 and o / n >= RATIO and o - n >= ABS_S:
            improvements.append((o / n, name, o, n))
    tn, to = sum(new[c] for c in common), sum(old[c] for c in common)
    print(f"common-set total: {to:.1f}s -> {tn:.1f}s ({tn / to:.3f}x)")
    ns, os_ = load_spark_only(new_p), load_spark_only(old_p)
    if ns:
        print(f"new spark-only total (engine, excl. oracle+hash): "
              f"{sum(ns.values()):.1f}s over {len(ns)} queries")
    if ns and os_:
        c2 = sorted(set(ns) & set(os_))
        t2n, t2o = sum(ns[c] for c in c2), sum(os_[c] for c in c2)
        print(f"spark-only common-set: {t2o:.1f}s -> {t2n:.1f}s "
              f"({t2n / t2o:.3f}x)")
        for name in c2:
            n_, o_ = ns[name], os_[name]
            if o_ > 0 and n_ / o_ >= RATIO and n_ - o_ >= ABS_S:
                print(f"SPARK-ONLY REGRESSION {name}: {o_:.2f}s -> {n_:.2f}s"
                      f" ({n_ / o_:.2f}x)")
    for r, name, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    for r, name, o, n in sorted(improvements, reverse=True)[:10]:
        print(f"improved   {name}: {o:.2f}s -> {n:.2f}s ({1 / r:.2f}x)")
    if not regressions:
        print("no regressions past the >=1.3x and >=0.3s screen")
    return 0


if __name__ == "__main__":
    sys.exit(main())
