"""The correctness gate: every oracle-bearing operator matches DuckDB at
sf0.001 (fast tier of the scale ladder; sf0.01 runs via tools/parity.py and
the driver). Rows-only ops must at least execute and return a DataFrame."""

from __future__ import annotations

import os

import pytest

from aced_etl_pod_spark.oracle import compare, duck_con
from aced_etl_pod_spark.registry import registry
from tests.conftest import SF_SMALL

REG = registry()
ORACLE_OPS = sorted(k for k, v in REG.items() if v.oracle is not None)
ROWS_OPS = sorted(k for k, v in REG.items() if v.oracle is None)

# Streaming + LSH ops are seconds-each; keep the fast gate fast by marking.
SLOW = {k for k in REG if k.startswith("stream_") or k in {"dedup_minhash_lsh", "dedup_simhash"}}


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMALL)


@pytest.mark.parametrize("op_id", [o for o in ORACLE_OPS if o not in SLOW])
def test_oracle_parity(spark, con, op_id):
    op = REG[op_id]
    sdf = op.fn(spark, SF_SMALL).toPandas()
    ddf = con.execute(op.oracle).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, f"{op_id}: {errs[:5]}"


@pytest.mark.slow
@pytest.mark.parametrize("op_id", [o for o in ORACLE_OPS if o in SLOW])
def test_oracle_parity_slow(spark, con, op_id):
    op = REG[op_id]
    sdf = op.fn(spark, SF_SMALL).toPandas()
    ddf = con.execute(op.oracle).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, f"{op_id}: {errs[:5]}"


@pytest.mark.parametrize("op_id", [o for o in ROWS_OPS if o not in SLOW])
def test_rows_only_runs(spark, op_id):
    df = REG[op_id].fn(spark, SF_SMALL)
    assert df.count() >= 0 and len(df.schema) > 0


def test_registry_complete():
    """SURVEY §2.b promises 71 core operator IDs; extras are on top."""
    assert len(REG) >= 71
    assert len(ORACLE_OPS) >= 60


def test_driver_window_order():
    """The external harness verifies the FIRST 50 registry entries; the
    active (self-rotating) window must exactly occupy that slice (guards
    against a module refactor silently reshuffling which ops get
    driver-checked)."""
    from aced_etl_pod_spark.registry import driver_window

    win = driver_window()
    assert len(win) == 50
    assert len(set(win)) == 50
    assert list(REG)[:50] == list(win)


def test_driver_window_self_rotation():
    """driver_window() rotates itself from the committed CORRECTNESS
    files: for every future plan round, simulate that round being next
    and check the emitted window is the plan slice backfilled to exactly
    50 registered ops with the oldest external rows first."""
    from unittest import mock

    from aced_etl_pod_spark import registry as regmod

    rows = regmod._external_rows()
    latest = max(rows.values(), default=0)
    for r, planned in regmod._ROTATION_PLAN.items():
        if r <= latest:
            continue
        fake = dict(rows)
        fake["__probe__"] = r - 1  # pretend round r-1 already ran
        with mock.patch.object(regmod, "_external_rows", return_value=fake):
            win = regmod.driver_window()
        assert len(win) == 50 and len(set(win)) == 50
        assert list(win[: len(planned)]) == list(planned)
        fill = win[len(planned):]
        assert all(o in REG for o in fill)
        # backfill is oldest-external-row first, op id as tie-break
        keys = [(rows.get(o, 0), o) for o in fill]
        assert keys == sorted(keys)
    # beyond the plan: pure backfill, still a full valid window
    fake = dict(rows)
    fake["__probe__"] = max(regmod._ROTATION_PLAN) # next = max+1, unplanned
    with mock.patch.object(regmod, "_external_rows", return_value=fake):
        win = regmod.driver_window()
    assert len(win) == 50 and all(o in REG for o in win)


def test_operators_md_fresh():
    """docs/OPERATORS.md is generated from the registry — regenerate with
    tools/gen_operators_md.py whenever an operator is added/changed."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_operators_md import OUT, render

    with open(OUT) as f:
        assert f.read() == render(), "stale docs/OPERATORS.md — regenerate"


def test_operators_md_window_invariant():
    """r6 verdict item 2: the committed doc must NOT depend on the
    self-rotating driver window — landing a new CORRECTNESS_r*.json must
    never stale it. Simulate the next external round landing and assert
    render() is byte-identical."""
    import os
    import sys
    from unittest import mock

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_operators_md import render

    import aced_etl_pod_spark.registry as regmod

    before = render()
    rows = regmod._external_rows()
    nxt = max(rows.values(), default=0) + 1
    fake = dict(rows)
    fake.update({o: nxt for o in regmod.driver_window()})
    with mock.patch.object(regmod, "_external_rows", return_value=fake):
        assert regmod.driver_window() != tuple(), "window must stay populated"
        after = render()
    assert before == after, "doc depends on the rotating driver window"


def test_census_fully_externally_verified_or_queued():
    """Freshness guard (VERDICT r4 item 9): every registered operator must
    either already have an external CORRECTNESS_r*.json row, sit in the
    current driver window (driver_window() — the slice the next
    external run will check), or be pinned to a specific FUTURE round in
    _ROTATION_PLAN (whose execution test_rotation_plan_enforced enforces:
    the plan's window must be rotated to when its round arrives, and its
    ops must have external rows once it passes). New ops therefore cannot
    accumulate unverified: adding one without windowing or pinning it
    fails this test."""
    import glob
    import json
    import os

    from aced_etl_pod_spark.registry import _ROTATION_PLAN, driver_window

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            seen |= set(json.load(fh))
    queued = set(driver_window())
    planned = {o for ids in _ROTATION_PLAN.values() for o in ids}
    missing = sorted(set(registry()) - seen - queued - planned)
    assert not missing, (
        f"{len(missing)} ops have no external correctness row and are in "
        f"neither the driver window nor _ROTATION_PLAN — queue them: {missing}"
    )


def test_rotation_plan_enforced():
    """VERDICT r5 item 6: the r07-r09 verification-queue rotation is
    machine-enforced, not aspirational. For each planned round R:
      * R in the future  → every planned ID must exist as a def in some
        operator module (typo guard — most are not yet registered);
      * R == next round  → every planned op must sit in driver_window()
        (self-rotation must emit the plan);
      * R in the past    → every planned op must have an external
        CORRECTNESS row (the plan was actually executed).
    Rounds are disjoint and ≤50 (the driver window size)."""
    import glob
    import importlib
    import json
    import os
    import re

    from aced_etl_pod_spark.registry import _MODULES, _ROTATION_PLAN, driver_window

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds_seen = [
        int(re.search(r"_r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    latest = max(rounds_seen) if rounds_seen else 0
    verified: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            verified |= set(json.load(fh))

    all_ids: set[str] = set()
    for r, ids in _ROTATION_PLAN.items():
        assert len(ids) <= 50, f"plan round {r} exceeds the 50-slot window"
        overlap = all_ids & set(ids)
        assert not overlap, f"op(s) planned twice: {sorted(overlap)}"
        all_ids |= set(ids)

    # typo guard: every planned ID must be a def in some operator module
    defs: set[str] = set()
    mods = set(_MODULES) | {
        "aced_etl_pod_spark.operators.geo_ops",
        "aced_etl_pod_spark.operators.governance_ops",
    }
    for m in mods:
        mod = importlib.import_module(m)
        defs |= {n for n in dir(mod) if callable(getattr(mod, n, None))}
    unknown = sorted(all_ids - defs)
    assert not unknown, f"planned ops with no matching def: {unknown}"

    for r, ids in sorted(_ROTATION_PLAN.items()):
        if r <= latest:
            missed = sorted(set(ids) - verified)
            assert not missed, (
                f"round {r} has passed but these planned ops have no "
                f"external CORRECTNESS row: {missed}"
            )
        elif r == latest + 1:
            unqueued = sorted(set(ids) - set(driver_window()))
            assert not unqueued, (
                f"round {r} is next — driver_window() must emit the plan; "
                f"missing: {unqueued}"
            )


def test_round6_queue_parity(spark, con):
    """Ops finished in round 5 but deferred from registration (the r05
    window is full with VERDICT-mandated re-checks): verify them against
    their oracles with the same differential gate they'll face when
    round 6 registers them."""
    from aced_etl_pod_spark.operators.corpus_ops import (
        JOIN_ASOF_NEAREST_ORACLE,
        join_asof_nearest,
    )
    from aced_etl_pod_spark.operators.streaming_ops import (
        STREAM_SLIDING_TOPK_ORACLE,
        stream_sliding_topk,
    )

    for fn, oracle in [
        (join_asof_nearest, JOIN_ASOF_NEAREST_ORACLE),
        (stream_sliding_topk, STREAM_SLIDING_TOPK_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_rotation_drains_entire_census_within_bound():
    """Evidence-lag closure (r6 verdict 'what's missing' item 1, made a
    machine guarantee): simulate external rounds forward — each round
    checks exactly driver_window() and lands rows for it — and assert
    EVERY registered op has an external row within 6 simulated rounds.
    This proves the plan + oldest-first backfill actually drains the
    whole census (no op can hide forever), independent of which round
    we're in when the test runs."""
    from unittest import mock

    import aced_etl_pod_spark.registry as regmod

    rows = dict(regmod._external_rows())
    reg = set(regmod.registry())
    start = max(rows.values(), default=0)
    for rnd in range(start + 1, start + 7):
        win = None
        with mock.patch.object(regmod, "_external_rows", return_value=dict(rows)):
            win = regmod.driver_window()
        assert len(win) == 50 and len(set(win)) == 50, rnd
        for o in win:
            rows[o] = rnd
        if reg <= set(rows):
            break
    missing = reg - set(rows)
    assert not missing, (
        f"{len(missing)} ops never reach an external window within 6 "
        f"rounds: {sorted(missing)[:10]}"
    )


def test_census_counts_in_lockstep():
    """r9 verdict item 8: the registry count, README's census line, and
    docs/OPERATORS.md's auto-generated header must agree, so an r8-style
    drift (328 vs 329 across docs) cannot recur. The README line is
    matched by its 'Full inventory (N operators' anchor; OPERATORS.md by
    its 'N registered operators; N DuckDB-oracle-checked' header."""
    import re

    from aced_etl_pod_spark.registry import all_oracles, all_queries

    n = len(all_queries())
    assert len(all_oracles()) == n, "queries/oracles census mismatch"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    m = re.search(r"Full inventory \((\d+) operators, ALL (\d+) full-oracle", readme)
    assert m, "README census anchor line missing"
    assert int(m.group(1)) == n and int(m.group(2)) == n, (
        f"README says {m.groups()}, registry has {n}"
    )

    opsmd = open(os.path.join(root, "docs", "OPERATORS.md")).read()
    m2 = re.search(r"(\d+) registered operators; (\d+) DuckDB-oracle-checked", opsmd)
    assert m2, "OPERATORS.md header missing"
    assert int(m2.group(1)) == n and int(m2.group(2)) == n, (
        f"OPERATORS.md says {m2.groups()}, registry has {n}"
    )
