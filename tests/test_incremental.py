"""Round-6 queue, second tranche: incremental maintenance (MV refresh,
cascading rollups), Z-order clustering, EWMA, and SemDeDup. Same
differential gate these ops will face when the driver window rotates to
them, plus the behavior each one's scale story promises."""

from __future__ import annotations

import os

import pytest

from aced_etl_pod_spark.oracle import compare, duck_con
from aced_etl_pod_spark.operators import incremental_ops as inc
from aced_etl_pod_spark.operators import table_format as tf
from tests.conftest import SF_SMALL

QUEUE = [
    (inc.mv_incremental_refresh, inc.MV_INCREMENTAL_REFRESH_ORACLE),
    (inc.agg_cascading_rollup, inc.AGG_CASCADING_ROLLUP_ORACLE),
    (inc.win_ewma, inc.WIN_EWMA_ORACLE),
    (inc.dedup_semantic_cluster, inc.DEDUP_SEMANTIC_CLUSTER_ORACLE),
    (tf.txnlog_zorder_cluster, tf.TXNLOG_ZORDER_ORACLE),
]


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMALL)


@pytest.mark.parametrize("fn,oracle", QUEUE, ids=[f.__name__ for f, _ in QUEUE])
def test_queue2_parity(spark, con, fn, oracle):
    sdf = fn(spark, SF_SMALL).toPandas()
    ddf = con.execute(oracle).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_mv_snapshot_built_once_and_small(spark):
    """The refresh must not rebuild (or rescan) the base: the snapshot
    parquet is written once per source fingerprint and holds O(groups)
    rows, not O(rows)."""
    inc.mv_incremental_refresh(spark, SF_SMALL).collect()
    marker = os.path.join(inc.mv_snapshot_path(SF_SMALL), "_SUCCESS")
    mtime = os.path.getmtime(marker)
    inc.mv_incremental_refresh(spark, SF_SMALL).collect()
    assert os.path.getmtime(marker) == mtime, "snapshot rebuilt on refresh"
    snap = spark.read.parquet(inc.mv_snapshot_path(SF_SMALL))
    assert snap.count() <= 5  # |distinct o_orderstatus|, not |orders|


def test_zorder_prunes_files_on_both_dims(spark):
    """Morton layout must make the two-column band predicate skip files at
    the manifest level — the whole point of clustering."""
    total, kept = tf.zorder_pruned_counts(spark, SF_SMALL)
    assert total == tf.ZORDER_FILES
    assert 0 < kept < total, f"no manifest pruning: {kept}/{total}"


def test_ewma_truncation_bound():
    """Kernel property (pure Python): the K-truncated normalized EWMA
    tracks the UNtruncated normalized (adjust=True) EWMA within the
    dropped tail's weight share (1-α)^K — i.e. the truncation is the
    documented contract, not an unbounded error."""
    import random

    random.seed(7)
    a, k = inc.EWMA_ALPHA, inc.EWMA_K
    xs = [random.uniform(-100, 100) for _ in range(200)]
    for i in range(len(xs)):
        hist = xs[: i + 1]
        full_num = sum(
            x * (1 - a) ** (len(hist) - 1 - j) for j, x in enumerate(hist)
        )
        full_mass = sum((1 - a) ** j for j in range(len(hist)))
        frame = hist[-k:]
        n = len(frame)
        num = sum(x * (1 - a) ** (n - 1 - j) for j, x in enumerate(frame))
        mass = (1 - (1 - a) ** n) / a
        # tail carries <= (1-a)^K of the total weight; both numerator and
        # normalizer lose it, so the quotient moves by <= 2*tail*max|x|
        bound = 2 * (1 - a) ** k * 100 / (1 - (1 - a) ** k) + 1e-9
        assert abs(num / mass - full_num / full_mass) <= bound


def test_semdedup_reps_kept_one_per_cluster(spark):
    """Every cluster keeps exactly one representative at cos_rep = 1.0, and
    a representative is never dropped regardless of τ."""
    out = inc.dedup_semantic_cluster(spark, SF_SMALL).toPandas()
    reps = out[out.cos_rep == 1.0]
    assert (reps.groupby("cluster").size() == 1).all()
    assert reps.is_kept.all()
    # τ sits inside the observed range: both branches are exercised
    assert 0 < out.is_kept.sum() < len(out)
