"""Executed-plan audit: expensive expressions leaked into scan filters.

Catalyst's infer-filters-from-generate + projection collapse can push a
derived predicate (e.g. ``size(transform(...)) > 0``) into the parquet
scan, re-evaluating the plan's most expensive expression once per row
per appearance (docs/SCALE.md §11; found as a 3× re-evaluation / 4×
slowdown in ``dedup_ngram_containment``). This tool builds every
registered operator's plan (no execution) and flags scans whose
DataFilters contain expensive-expression markers.

    python tools/plan_audit.py [op_id ...]

Exit code 1 iff any op is flagged. Cheap markers (``split(`` alone) are
reported as INFO, not flagged — re-running a split in a filter doubles a
cheap op; re-running a transform chain triples an expensive one.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from aced_etl_pod_spark.registry import registry  # noqa: E402
from aced_etl_pod_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
EXPENSIVE = (
    "transform(",
    "array_distinct(",
    "aggregate(",
    "regexp_replace(",
    "regexp_extract_all(",
    "md5(",
    "sha2(",
    "arrays_zip(",
)
INFO_ONLY = ("split(",)
# The sanctioned cheap-guard shape (docs/SCALE.md §11): a token-count
# bound `size(split(<normalize>(text))) >= n` placed BEFORE an expensive
# gram projection. It re-runs at most the tokenizer in the scan filter
# (never the gram/distinct/signature chain) — that bound is the point of
# the pattern, so expensive markers nested INSIDE the guard's tokenizer
# (normalize = lower/trim/regexp_replace under size(split()) report as
# info, not a flag. The plan's DataFilters string is truncated by Spark,
# so the check is positional: a marker only flags when it appears before
# the guard opens (i.e. outside it).
GUARD = "size(split("
# Streaming ops execute queries at build time — skip in a plan-only audit.
SKIP_PREFIX = ("stream_",)


def main() -> int:
    spark = get_spark("plan-audit")
    reg = registry()
    ids = sys.argv[1:] or [k for k in reg if not k.startswith(SKIP_PREFIX)]
    flagged, info, errs = [], [], []
    for op_id in ids:
        try:
            plan = (
                reg[op_id].fn(spark, SF)._jdf.queryExecution()
                .executedPlan().toString()
            )
        except Exception as ex:  # build-time failures are their own signal
            errs.append((op_id, f"{type(ex).__name__}: {ex}"))
            continue
        for scan in re.findall(r"DataFilters: \[(.*?)\], Format", plan, re.S):
            g = scan.find(GUARD)
            hit = next(
                (m for m in EXPENSIVE
                 if m in scan and (g < 0 or scan.find(m) < g)),
                None,
            )
            if hit:
                flagged.append((op_id, hit))
            elif any(m in scan for m in INFO_ONLY):
                info.append(op_id)
    for op_id, m in sorted(set(flagged)):
        print(f"FLAG {op_id}: {m} re-evaluated in a scan filter")
    for op_id in sorted(set(info)):
        print(f"info {op_id}: cheap expr (split) in a scan filter")
    for op_id, e in errs:
        print(f"ERR  {op_id}: {e}")
    print(f"\n{len(set(f[0] for f in flagged))} flagged, "
          f"{len(set(info))} info, {len(errs)} errors / {len(ids)} audited")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
