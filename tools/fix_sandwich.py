"""One-shot migration: wrap every inline decimal-sandwich oracle idiom in
the non-finite guard (the nonfinite-sweep class-A fix).

Rewrites ``CAST(round(CAST(<expr> AS DECIMAL(18,N)), K) AS DOUBLE)`` to the
exact text ``operators.util.money_sql(<expr>, K, N)`` emits, so helper-built
and inline oracles stay textually consistent. Balanced-paren scan (the expr
may nest arbitrarily); spans containing a double-quote are skipped and
flagged — they cross a Python string-literal boundary and need hand edits.

    python tools/fix_sandwich.py [--write] [files...]
"""

from __future__ import annotations

import argparse
import glob
import re
import sys

OPEN = re.compile(r"CAST\s*\(\s*round\s*\(\s*CAST\s*\(")


def money_sql(expr: str, scale: str, exact: str) -> str:
    # dialect-neutral finite guard — see operators/util.py:money_sql
    e = f"CAST({expr} AS DOUBLE)"
    return (
        f"(CASE WHEN ({e}) - ({e}) = 0 "
        f"THEN CAST(round(CAST({e} AS DECIMAL(18,{exact})), {scale}) AS DOUBLE) "
        f"ELSE {e} END)"
    )


def rewrite(text: str, path: str) -> tuple[str, int, list[str]]:
    """Single pass over the original text: collect non-overlapping full
    sandwiches left-to-right, then splice replacements end-to-start (so
    emitted guards are never re-scanned — the loop cannot diverge)."""
    flags: list[str] = []
    repls: list[tuple[int, int, str]] = []  # (start, end, replacement)
    last_end = 0
    for m in OPEN.finditer(text):
        if m.start() < last_end:
            continue  # inside the previous match's span
        # already-guarded (helper-built or previously migrated) text
        if text[max(0, m.start() - 8) : m.start()].rstrip().endswith("THEN"):
            continue
        # balanced scan from the inner CAST( to its matching close
        i, depth = m.end(), 1
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        inner = text[m.end() : i - 1]  # "<expr> AS DECIMAL(18,N)"
        line = text.count("\n", 0, m.start()) + 1
        dm = re.search(r"\s+AS\s+DECIMAL\s*\(\s*18\s*,\s*(\d+)\s*\)\s*$", inner)
        tail = re.match(r"\s*,\s*(\d+)\s*\)\s*AS\s+DOUBLE\s*\)", text[i:])
        end = i + (tail.end() if tail else 0)
        span = text[m.start() : end]
        if dm is None or tail is None or '"' in span:
            flags.append(f"{path}:{line}: unmatched/unsafe sandwich start")
            last_end = m.end()
            continue
        expr = inner[: dm.start()].strip()
        if "AS DECIMAL(" in expr:
            flags.append(f"{path}:{line}: nested sandwich — hand-edit")
            last_end = m.end()
            continue
        repls.append((m.start(), end, money_sql(expr, tail.group(1), dm.group(1))))
        last_end = end
    for start, end, repl in reversed(repls):
        text = text[:start] + repl + text[end:]
    return text, len(repls), flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("files", nargs="*")
    args = ap.parse_args()
    files = args.files or sorted(
        glob.glob("aced_etl_pod_spark/**/*.py", recursive=True)
    )
    total = 0
    for path in files:
        if path.endswith("operators/util.py"):
            continue
        src = open(path).read()
        out, n, flags = rewrite(src, path)
        for f in flags:
            print(f"FLAG {f}")
        if n:
            print(f"{path}: {n} sandwiches guarded")
            total += n
            if args.write:
                open(path, "w").write(out)
    print(f"total: {total} ({'written' if args.write else 'dry-run'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
