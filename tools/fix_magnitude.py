"""One-shot follow-up to fix_guard_idiom.py: upgrade the emitted
``abs(e) < Inf`` finite guards to MAGNITUDE bounds (the extreme-sweep
class-A fix).

Why: the finite test passes a finite 1e300, which then takes a
*different* divergence path than NaN — DuckDB raises on CAST→DECIMAL /
CAST→BIGINT / second-moment overflow while non-ANSI Spark silently
yields NULL / Long.MaxValue / NaN (and an ANSI Spark session raises).
A magnitude bound excludes NaN, ±Inf AND overflow-range values in the
same single-reference test (NaN sorts above +Inf > any bound in both
engines):

  * sandwich guards (THEN CAST(round(CAST(e AS DECIMAL(18,s))...) get
    ``abs(e) < 1e{18-s}`` — the largest double below that bound still
    round-trips the decimal, and round()'s carry widens (DuckDB
    DECIMAL(18,s)->(18,2), Spark ->(p-s+d+1,d)), so strict < is safe;
  * plain guards (measure filters, integer images, lane tests) get
    ``abs(e) < 1e12`` (WELL_SCALED_MAX) — floor-buckets stay inside
    BIGINT, second moments stay inside double (n * (1e12)^2 << 1.7e308).

    python tools/fix_magnitude.py [--write]
"""

from __future__ import annotations

import argparse
import glob
import re

GUARD = "CAST('Infinity' AS DOUBLE)"
SANDWICH = re.compile(
    r"\s*THEN\s+CAST\(\s*round\(\s*CAST\((?:.|\n){0,400}?DECIMAL\(18,\s*(\d+)\)"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    total = 0
    for path in sorted(glob.glob("aced_etl_pod_spark/**/*.py", recursive=True)):
        if path.endswith("util.py"):
            continue  # helpers updated by hand (they define the contract)
        text = open(path).read()
        n = 0
        pos = 0
        out = []
        last = 0
        while True:
            i = text.find(GUARD, pos)
            if i < 0:
                break
            # must be the right-hand side of a '<' comparison
            before = text[:i].rstrip()
            if not before.endswith("<"):
                pos = i + len(GUARD)
                continue
            after = text[i + len(GUARD):]
            m = SANDWICH.match(after)
            if m:
                bound = f"1e{18 - int(m.group(1))}"
            else:
                bound = "1e12"
            out.append(text[last:i])
            out.append(bound)
            last = i + len(GUARD)
            pos = last
            n += 1
        out.append(text[last:])
        if n:
            print(f"{path}: {n} guards bounded")
            total += n
            if args.write:
                open(path, "w").write("".join(out))
    print(f"total: {total} ({'written' if args.write else 'dry-run'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
