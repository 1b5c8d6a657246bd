#!/usr/bin/env python
"""Dump .explain("formatted") for every bench headline query to
artifacts/plans/<name>.txt — the raw material behind PLANS.md."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from ram_datapipeline_spark import queries as Q  # noqa: E402
from ram_datapipeline_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "plans")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="plan-audit")
    sf_dir = bench.SF_DIR
    for name in bench.HEADLINE:
        df = Q.REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "->", f"{OUT}/{name}.txt")


if __name__ == "__main__":
    main()
