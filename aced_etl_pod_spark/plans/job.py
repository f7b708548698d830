"""Job-protocol façade (reference R1 / R18 / R19).

The reference is dispatched with a JSON parameter blob in ``INPUT_DATA``
(etl-job/fhir_import_export.py:49-52), dispatches on ``method`` ∈
{put, get, delete} (:416-433) — where ``put`` chains a snapshot ``get``
(:418-423) and iterates ``push.commits`` (:451-470) — and marshals its
result as a final ``[out]``-prefixed JSON line (:402-403, :435-436).

Here the same contract is a function: ``run_job(spark, input_data, ...)``
returns the output dict (and ``format_out`` renders the ``[out]`` line for
callers that want the reference's stdout protocol).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from aced_etl_pod_spark.plans.pipeline import EtlPodPipeline


def run_job(
    spark: SparkSession,
    input_data: dict,
    warehouse: str,
    export_dir: str | None = None,
    user: dict | None = None,
    snapshot_ts: str = "00000000-000000",
) -> dict:
    """Dispatch one job. ``input_data`` mirrors the reference's blob:
    ``{"project_id": ..., "method": "put"|"get"|"delete",
    "push": {"commits": [{"meta_path": <dir-or-zip>, ...}]}}``."""
    project_id = input_data["project_id"]
    method = input_data.get("method")
    pipeline = EtlPodPipeline(spark, warehouse)
    out: dict = {"project_id": project_id, "method": method}

    if method == "put":
        commits = (input_data.get("push") or {}).get("commits") or []
        loaded = []
        for commit in commits:  # per-commit loop, :451-470
            loaded.append(pipeline.put(project_id, commit["meta_path"], user=user))
        out["commits"] = loaded
        # put chains a snapshot export, :418-423
        if export_dir is not None:
            out["snapshot"] = pipeline.get(
                project_id, export_dir, user=user, ts=snapshot_ts
            )
    elif method == "get":
        target = export_dir or os.path.join(warehouse, "_export")
        out["snapshot"] = pipeline.get(project_id, target, user=user, ts=snapshot_ts)
    elif method == "delete":
        out["dropped"] = pipeline.delete(project_id, user=user)
    else:
        raise ValueError(f"unknown method {method!r}")  # :431-433
    return out


def format_out(result: dict) -> str:
    """The reference's stdout marshalling: final line prefixed ``[out]``
    (:402-403, :435-436)."""
    return "[out] " + json.dumps(result, default=str)
