"""Plan introspection: the physical-plan properties the engine's
regression guards assert (exchanges, broadcasts, pushdown, Python
boundaries), exposed as a reusable API.

Intended uses: CI fences (assert a query's plan shape before it ships),
interactive review while authoring an operator ("did my filter reach the
scan?"), and PLANS.md-style audits. Counting is done on the
``explain("formatted")`` detail headers, where each operator appears
exactly once.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(df: DataFrame) -> dict:
    """Operator counts that matter at scale, from the physical plan:

    - ``exchanges``            data shuffles (hash/range/round-robin)
    - ``broadcast_exchanges``  small-side replications (not data shuffles)
    - ``broadcast_hash_joins`` / ``sort_merge_joins`` / ``nested_loop_joins``
    - ``windows``              window operators (each = a sorted partition)
    - ``python_eval``          Arrow/pandas boundaries (rows leave the JVM)
    - ``pushed_filter_scans``  scans with ≥1 pushed filter

    (Codegen-span width is NOT reported: under AQE the pre-execution
    formatted plan has no codegen ids — inspect a post-execution plan in
    the UI/event log for fusion width.)
    """
    plan = plan_text(df)

    def n(op: str) -> int:
        return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.M))

    return {
        "exchanges": n("Exchange"),
        "broadcast_exchanges": n("BroadcastExchange"),
        "broadcast_hash_joins": n("BroadcastHashJoin"),
        "sort_merge_joins": n("SortMergeJoin"),
        "nested_loop_joins": n("BroadcastNestedLoopJoin") + n("CartesianProduct"),
        "windows": n("Window"),
        "python_eval": (
            n("ArrowEvalPython") + n("MapInPandas") + n("BatchEvalPython")
            + n("FlatMapGroupsInPandas")
        ),
        "pushed_filter_scans": len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        ),
    }
