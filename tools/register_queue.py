"""One-shot mechanical registrar for the round-6 early registration
(VERDICT r5 item 1 taken to completion): give every finished queue
operator its ``@op`` decorator NOW, while the driver window stays on the
round-6 rotation and the r07-r09 windows remain machine-enforced by
``registry._ROTATION_PLAN`` + ``tests/test_parity.py``.

The (fn, oracle) pairs come from ``tools/queue_parity.queue_pairs()`` —
the same source of truth the local sf0.01/sf0.1 sweeps verified green.
For each pair not yet registered the script inserts

    @op("<fn name>", oracle=<ORACLE_CONST_NAME>, tags=(...))

directly above the ``def`` in the defining module (the oracle const name
is recovered by identity lookup in the module namespace, so the decorator
references the very string the sweeps checked). FACTORY-oracle ops (the
three fixture-path scans) are skipped here and upgraded by hand to
source-derived static oracles.

Usage:  python tools/register_queue.py [--dry-run]
"""

from __future__ import annotations

import argparse
import importlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {"scan_fixed_width", "scan_multiline_json", "scan_file_provenance"}


def tags_for(name: str) -> tuple[str, ...]:
    pre = [
        (("join_geo", "agg_geo"), ("geo", "extra")),
        (("dq_", "dp_", "fn_pseudonymize", "fn_ip_"), ("governance", "extra")),
        (("txnlog_", "plan_"), ("scan", "acid", "extra")),
        (("dedup_",), ("text", "dedup", "extra")),
        (("text_",), ("text", "extra")),
        (("sim_", "multimodal_", "embedding_"), ("similarity", "extra")),
        (("seq_", "pipeline_", "tokenizer_"), ("llm", "extra")),
        (("graph_", "hierarchy_"), ("graph", "extra")),
        (("stat_",), ("stat", "extra")),
        (("ts_",), ("timeseries", "extra")),
        (("join_",), ("join", "extra")),
        (("agg_",), ("agg", "extra")),
        (("win_",), ("window", "extra")),
        (("stream_",), ("stream", "extra")),
        (("scan_", "sink_"), ("scan", "extra")),
        (("fn_",), ("fn", "extra")),
        (("udf_", "udtf_"), ("udf", "extra")),
        (("sample_",), ("sampling", "extra")),
        (("mv_",), ("incremental", "extra")),
        (("sql_",), ("sql", "extra")),
        (("feature_",), ("features", "extra")),
    ]
    for prefixes, tags in pre:
        if name.startswith(prefixes):
            return tags
    return ("extra",)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from aced_etl_pod_spark.registry import registry
    from tools.queue_parity import queue_pairs

    # fn name -> oracle const name, parsed from queue_parity.py source so
    # aliased consts (two names bound to one string) resolve unambiguously.
    qp_src = open(os.path.join(os.path.dirname(__file__), "queue_parity.py")).read()
    const_of: dict[str, str] = {
        m.group(1): m.group(2)
        for m in re.finditer(
            r"\(\w+\.(\w+),\s*\w+\.([A-Z][A-Z0-9_]+)\)", qp_src
        )
    }

    registered = set(registry())
    # module file -> list of (fn_name, decorator_line)
    edits: dict[str, list[tuple[str, str]]] = {}
    planned_ids: list[str] = []

    for fn, oracle in queue_pairs():
        name = fn.__name__
        if name in registered or name in SKIP:
            continue
        mod = importlib.import_module(fn.__module__)
        if oracle is None:
            oracle_ref = "None"
        else:
            if isinstance(oracle, str) and oracle.startswith("FACTORY"):
                raise SystemExit(f"unexpected factory oracle for {name}")
            const = const_of.get(name)
            if const is None or getattr(mod, const, None) is not oracle:
                raise SystemExit(f"{name}: oracle const lookup failed ({const})")
            oracle_ref = f"oracle={const}"
        if oracle_ref == "None":
            oracle_ref = "oracle=None"
        deco = f'@op("{name}", {oracle_ref}, tags={tags_for(name)!r})'
        edits.setdefault(mod.__file__, []).append((name, deco))
        planned_ids.append(name)

    for path, items in sorted(edits.items()):
        with open(path) as f:
            src = f.read()
        for name, deco in items:
            pat = re.compile(rf"^def {name}\(", re.M)
            m = list(pat.finditer(src))
            if len(m) != 1:
                raise SystemExit(f"{path}: def {name} matched {len(m)} times")
            src = src[: m[0].start()] + deco + "\n" + src[m[0].start():]
        if "from aced_etl_pod_spark.registry import op" not in src:
            # insert after the tables import (every operator module has one)
            anchor = re.search(
                r"^from aced_etl_pod_spark\.tables import [^\n]+\n", src, re.M
            )
            if not anchor:
                raise SystemExit(f"{path}: no import anchor for `op`")
            src = (
                src[: anchor.start()]
                + "from aced_etl_pod_spark.registry import op\n"
                + src[anchor.start():]
            )
        print(f"{os.path.relpath(path)}: +{len(items)} decorators")
        if not args.dry_run:
            with open(path, "w") as f:
                f.write(src)

    print(f"\n{len(planned_ids)} ops decorated "
          f"({'dry run' if args.dry_run else 'written'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
