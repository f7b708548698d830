"""One-shot follow-up to fix_sandwich.py: replace the emitted
``(CASE WHEN (e) - (e) = 0 THEN ... )`` guards with the single-reference
``abs(e) < Inf`` test.

Why: two textual instances of a float AGGREGATE are two separate parallel
fold orders in DuckDB; their exact difference is not reliably 0 on clean
data (text_zipf_rank_frequency regressed exactly this way). The new test
references e once, so branch choice is deterministic.

    python tools/fix_guard_idiom.py [--write]
"""

from __future__ import annotations

import argparse
import glob
import re

OPEN = re.compile(r"\(CASE WHEN \(CAST\(")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    total = 0
    for path in sorted(glob.glob("aced_etl_pod_spark/**/*.py", recursive=True)):
        text = open(path).read()
        n = 0
        pos = 0
        while True:
            m = OPEN.search(text, pos)
            if m is None:
                break
            # balanced scan over the first CAST(...) instance
            i, depth = m.end(), 1
            while i < len(text) and depth:
                depth += {"(": 1, ")": -1}.get(text[i], 0)
                i += 1
            inner = text[m.end() : i - 1]  # "<expr> AS DOUBLE"
            mid = re.match(r"\) - \(CAST\(", text[i:])
            if mid is None or not inner.endswith(" AS DOUBLE"):
                pos = m.end()
                continue
            # second instance must be identical, then ") = 0 "
            j = i + mid.end()
            if not text.startswith(inner + ")", j):
                pos = m.end()
                continue
            k = j + len(inner) + 1
            eq = re.match(r"\) = 0 ", text[k:])
            if eq is None:
                pos = m.end()
                continue
            new = f"(CASE WHEN abs(CAST({inner})) < CAST('Infinity' AS DOUBLE) "
            text = text[: m.start()] + new + text[k + eq.end() :]
            pos = m.start() + len(new)
            n += 1
        if n:
            print(f"{path}: {n} guards rewritten")
            total += n
            if args.write:
                open(path, "w").write(text)
    print(f"total: {total} ({'written' if args.write else 'dry-run'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
