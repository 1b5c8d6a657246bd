"""Operation log — parity with the reference's job-tracking tables.

Reference: `operations` + `operations_logs` Postgres tables driven by the
Operation class (`ram-analysis/app/utils/operation.js`): start enforces a
single running operation per (name, project, scenario) (`:87-99`), every
event appends a log row with a JSON payload (`:201-230`), finish marks
complete (`:141-154`), and readers take latest-row-per-key (`:45-59`) /
last-log (`:249-255`).

Spark-first restatement: both tables are append-only parquet; *status is an
event, not an UPDATE* — the current state of an operation is the newest
status event per op_id (SURVEY W1), which is how an object-store-backed log
must work anyway. All reads are DataFrame ops; the uniqueness guard is a
filter+count over the tiny ops table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class OperationLog:
    """Append-only operation tracker rooted at ``base_path`` (two parquet
    dirs: ``operations`` — status events — and ``operations_logs``)."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.ops_path = os.path.join(base_path, "operations")
        self.logs_path = os.path.join(base_path, "operations_logs")

    # -- reads ------------------------------------------------------------

    def _ops(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.ops_path)
        except Exception:
            return None  # no events yet

    def current_status(self) -> DataFrame:
        """Latest status event per op_id (W1): (op_id, name, project_id,
        scenario_id, status, updated_at)."""
        ops = self._ops()
        if ops is None:
            return self.spark.createDataFrame(
                [],
                "op_id long, name string, project_id long, scenario_id long,"
                " status string, updated_at timestamp",
            )
        w = Window.partitionBy("op_id").orderBy(F.desc("created_at"))
        return (
            ops.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "op_id",
                "name",
                "project_id",
                "scenario_id",
                "status",
                F.col("created_at").alias("updated_at"),
            )
        )

    def logs(self, op_id: int) -> DataFrame:
        """All log rows for an op, newest first (reference W3,
        operation.js:237-242)."""
        return (
            self.spark.read.parquet(self.logs_path)
            .filter(F.col("op_id") == op_id)
            .orderBy(F.desc("log_id"))
        )

    def last_log(self, op_id: int):
        """Newest log row (W2, operation.js:249-255) or None."""
        rows = self.logs(op_id).limit(1).collect()
        return rows[0] if rows else None

    # -- writes -----------------------------------------------------------

    def _append_status(self, op_id: int, name: str, project_id: int,
                       scenario_id: int, status: str) -> None:
        df = self.spark.createDataFrame(
            [(op_id, name, project_id, scenario_id, status)],
            "op_id long, name string, project_id long, scenario_id long, status string",
        ).withColumn("created_at", F.current_timestamp())
        df.write.mode("append").parquet(self.ops_path)

    def start(self, name: str, project_id: int, scenario_id: int) -> int:
        """Register a new running operation; raise if one with the same
        (name, project, scenario) is not complete (operation.js:87-99)."""
        cur = self.current_status()
        running = cur.filter(
            (F.col("name") == name)
            & (F.col("project_id") == project_id)
            & (F.col("scenario_id") == scenario_id)
            & (F.col("status") != "complete")
        )
        if running.count() > 0:
            raise RuntimeError(
                "Operation with the same name is already running"
            )
        prev = cur.agg(F.max("op_id")).collect()[0][0]
        op_id = (prev if prev is not None else -1) + 1
        self._append_status(op_id, name, project_id, scenario_id, "running")
        return op_id

    def log(self, op_id: int, code: str, data: dict) -> None:
        """Append one log event with a JSON payload (operation.js:201-230)."""
        prev = None
        try:
            prev = (
                self.spark.read.parquet(self.logs_path)
                .agg(F.max("log_id"))
                .collect()[0][0]
            )
        except Exception:
            pass
        log_id = (prev if prev is not None else -1) + 1
        df = self.spark.createDataFrame(
            [(log_id, op_id, code, json.dumps(data))],
            "log_id long, op_id long, code string, data string",
        ).withColumn("created_at", F.current_timestamp())
        df.write.mode("append").parquet(self.logs_path)

    def finish(self, op_id: int) -> None:
        """Mark complete (operation.js:141-154): one log event + one status
        event."""
        cur = self.current_status().filter(F.col("op_id") == op_id).collect()
        if not cur:
            raise RuntimeError(f"unknown op_id {op_id}")
        row = cur[0]
        if row["status"] == "complete":
            raise RuntimeError("Operation already complete")
        self.log(op_id, "success", {"message": "Operation complete"})
        self._append_status(
            op_id, row["name"], row["project_id"], row["scenario_id"], "complete"
        )
