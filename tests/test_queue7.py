"""Round-7 registration queue (geo-spatial + governance families, plus
the later tranches added below as they land): the same differential gate
these ops will face when the driver window rotates to them, plus the
property each one's blocking / privacy guarantee promises."""

from __future__ import annotations

import pytest

from aced_etl_pod_spark.oracle import compare, duck_con
from aced_etl_pod_spark.operators import advanced_ops as adv
from aced_etl_pod_spark.operators import corpus_ops as cor
from aced_etl_pod_spark.operators import extra_ops as ext
from aced_etl_pod_spark.operators import geo_ops as geo
from aced_etl_pod_spark.operators import governance_ops as gov
from aced_etl_pod_spark.operators import llm_pipeline as llm
from aced_etl_pod_spark.operators import text as txt
from tests.conftest import SF_SMALL

QUEUE = [
    (geo.join_geo_gridded_radius, geo.JOIN_GEO_GRIDDED_RADIUS_ORACLE),
    (geo.agg_geo_grid_density, geo.AGG_GEO_GRID_DENSITY_ORACLE),
    (gov.dq_k_anonymity, gov.DQ_K_ANONYMITY_ORACLE),
    (gov.fn_pseudonymize_consistent, gov.FN_PSEUDONYMIZE_CONSISTENT_ORACLE),
    (gov.fn_ip_cidr_classify, gov.FN_IP_CIDR_CLASSIFY_ORACLE),
    (adv.graph_bfs_khop, adv.GRAPH_BFS_KHOP_ORACLE),
    (ext.win_event_sequence_regex, ext.WIN_EVENT_SEQUENCE_REGEX_ORACLE),
    (ext.ts_interpolate_linear, ext.TS_INTERPOLATE_LINEAR_ORACLE),
    (txt.text_readability_score, txt.TEXT_READABILITY_SCORE_ORACLE),
]


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMALL)


@pytest.mark.parametrize("fn,oracle", QUEUE, ids=[f.__name__ for f, _ in QUEUE])
def test_queue7_parity(spark, con, fn, oracle):
    sdf = fn(spark, SF_SMALL).toPandas()
    ddf = con.execute(oracle).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_geo_grid_blocking_cannot_miss():
    """The pigeonhole behind the 3x3 neighborhood: with 5-degree cells,
    points in the [-45, 45) latitude band that are within the 300 km
    radius can never be more than one cell apart on either axis — checked
    against the exact haversine over a dense worst-case sweep (pairs
    straddling cell boundaries at the band edge, where longitude degrees
    are shortest)."""
    import math

    def hav(lat1, lon1, lat2, lon2):
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    cell = 5.0
    # Worst case: highest |lat| (shortest longitude degrees). Two points
    # exactly 2 cells apart on an axis are separated by >= one full empty
    # cell; show that minimum separation always exceeds the radius.
    for lat in (44.999, -44.999, 40.0, 0.0):
        # two cells apart in longitude: gap >= one full cell width
        d = hav(lat, 0.0, lat, cell)
        assert d > 300.0, f"lon cell width {d} km at lat {lat} not > radius"
    # two cells apart in latitude: gap >= one full cell height
    d = hav(0.0, 0.0, cell, 0.0)
    assert d > 300.0


def test_geo_radius_join_matches_brute_force(spark):
    """The grid join at sf0.001 returns exactly the brute-force pair set
    (belt-and-suspenders on top of the cross-join oracle: computed in
    Python floats, no SQL in the loop)."""
    import math

    rows = geo.join_geo_gridded_radius(spark, SF_SMALL).collect()
    got = {(r.c_custkey, r.s_suppkey) for r in rows}

    def pt(key, salt=0):
        k = key + salt
        lat = ((k * geo._LAT_MUL) % geo._MOD32) % 90000 / 1000.0 - 45.0
        lon = ((k * geo._LON_MUL) % geo._MOD32) % 300000 / 1000.0 - 150.0
        return lat, lon

    def hav(p, q):
        dlat = math.radians(q[0] - p[0])
        dlon = math.radians(q[1] - p[1])
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(p[0]))
            * math.cos(math.radians(q[0]))
            * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    want = set()
    for c in range(150):
        for s in range(10):
            if round(hav(pt(c), pt(s, geo._SUPP_SALT)), 3) <= geo._RADIUS_KM:
                want.add((c, s))
    assert got == want


def test_pseudonym_is_injective_and_stable(spark):
    """Consistency contract: the token function is 1:1 on the key domain
    (no collisions that would silently merge subjects) and a re-derivation
    produces byte-identical tokens."""
    a = gov.fn_pseudonymize_consistent(spark, SF_SMALL).toPandas()
    assert a.pseudonym.nunique() == len(a)  # one class per subject
    b = gov.fn_pseudonymize_consistent(spark, SF_SMALL).toPandas()
    assert sorted(a.pseudonym) == sorted(b.pseudonym)


def test_cidr_longest_prefix_wins(spark):
    """Every address matches >= 1 rule (the two /1 halves cover the whole
    space), totals across labels equal the event count, and no event lands
    on a /1 catch-all when a more specific covering rule exists."""
    df = gov.fn_ip_cidr_classify(spark, SF_SMALL).toPandas()
    assert df.n_events.sum() == 1000
    # Independently recompute the winner for a sample of addresses.
    ips = [(eid * 2654435761) % 4294967296 for eid in range(100)]
    for ip in ips:
        winners = [
            (plen, label)
            for label, net, plen, div in gov._CIDRS
            if ip // div == net // div
        ]
        assert winners, f"ip {ip} matched no rule"
        best = sorted(winners, key=lambda t: (-t[0], t[1]))[0]
        specific = [lbl for p, lbl in winners if p > 1]
        if specific:
            assert best[1] in specific


def test_bfs_distances_are_valid(spark):
    """BFS sanity independent of the oracle: seeds at 0, no distance
    exceeds the hop budget, and every non-seed reached node has a
    neighbor one hop closer (triangle inequality on the hop metric)."""
    df = adv.graph_bfs_khop(spark, SF_SMALL).toPandas()
    assert df.dist.min() == 0
    assert df.dist.max() <= adv.BFS_HOPS
    seeds = set(df[df.dist == 0].node)
    assert seeds == {c for c in range(150) if c % adv._BFS_SEED_MOD == 0}


def test_ffd_packing_invariants(spark):
    """The three bin-packing contracts: no non-oversize bin exceeds
    capacity, every document is placed exactly once, and per-shard bin
    count is within the FFD guarantee (11/9 * OPT + 1, with the volume
    lower bound standing in for OPT)."""
    import math

    p = llm.seq_pack_bins_ffd(spark, SF_SMALL).toPandas()
    assert p.doc_id.is_unique and len(p) == 500
    g = p.groupby(["shard", "bin_id"])
    fills = g.ntok.sum()
    oversize_bins = g.oversize.any()
    assert (fills[~oversize_bins] <= llm.FFD_CAPACITY).all()
    # oversize docs sit alone in their bin
    assert (g.size()[oversize_bins] == 1).all()
    for shard, grp in p.groupby("shard"):
        lb = math.ceil(grp.ntok.sum() / llm.FFD_CAPACITY)
        used = grp.bin_id.nunique()
        assert used <= math.ceil(11 / 9 * lb) + 1, (shard, used, lb)


def test_ffd_matches_reference_greedy(spark):
    """The distributed kernel reproduces a from-scratch local FFD exactly
    (same shard hash, same sort key, same first-fit rule) — the packing is
    a pure function of content, not of Spark's partition layout."""
    import duckdb

    p = llm.seq_pack_bins_ffd(spark, SF_SMALL).toPandas()
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchdf()
    docs["ntok"] = docs.text.map(lambda t: len(t.split(" ")))
    docs["shard"] = (docs.doc_id * 2654435761) % 2**32 % 8
    want = {}
    for shard, grp in docs.groupby("shard"):
        fills: list[int] = []
        for _, row in grp.sort_values(
            ["ntok", "doc_id"], ascending=[False, True]
        ).iterrows():
            placed = -1
            for b, fill in enumerate(fills):
                if fill + row.ntok <= llm.FFD_CAPACITY:
                    placed = b
                    break
            if placed < 0:
                fills.append(0)
                placed = len(fills) - 1
            fills[placed] += row.ntok
            want[row.doc_id] = (shard, placed)
    got = {r.doc_id: (r.shard, r.bin_id) for r in p.itertuples()}
    assert got == want


QUEUE2 = [
    (geo.join_geo_point_in_polygon, geo.JOIN_GEO_POINT_IN_POLYGON_ORACLE),
]


def test_queue7_parity_polygon(spark, con):
    sdf = geo.join_geo_point_in_polygon(spark, SF_SMALL).toPandas()
    ddf = con.execute(geo.JOIN_GEO_POINT_IN_POLYGON_ORACLE).fetchdf()
    assert not compare(sdf, ddf)


def test_queue7_parity_reservoir(spark, con):
    from aced_etl_pod_spark.operators import sampling as smp

    sdf = smp.sample_reservoir_per_group(spark, SF_SMALL).toPandas()
    ddf = con.execute(smp.SAMPLE_RESERVOIR_PER_GROUP_ORACLE).fetchdf()
    assert not compare(sdf, ddf)


def test_polygon_containment_matches_shoelace_reference(spark):
    """Independent check of the half-plane test: a pure-Python point-in-
    convex-polygon (same CCW cross rule, integer arithmetic) over every
    customer point reproduces the op's per-polygon counts."""
    df = geo.join_geo_point_in_polygon(spark, SF_SMALL).toPandas()
    got = {r.label: (r.n_bbox_candidates, r.n_inside) for r in df.itertuples()}

    def point(key):
        px = ((key * geo._LON_MUL) % geo._MOD32) % 300000
        py = ((key * geo._LAT_MUL) % geo._MOD32) % 90000
        return px, py

    want = {}
    for label, verts in geo._POLYGONS.items():
        xs, ys = [v[0] for v in verts], [v[1] for v in verts]
        bbox = (min(xs), max(xs), min(ys), max(ys))
        nb = ni = 0
        for c in range(150):
            px, py = point(c)
            if not (bbox[0] <= px <= bbox[1] and bbox[2] <= py <= bbox[3]):
                continue
            nb += 1
            inside = all(
                (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0
                for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1])
            )
            ni += inside
        want[label] = (nb, ni)
    assert got == want


def test_bpe_matches_reference_trainer(spark):
    """The distributed BPE reproduces a from-scratch local trainer exactly
    (same vocabulary, same leftmost-fold merge application, same
    count-then-lexicographic tie-break) — merges AND their pair counts."""
    import collections

    import duckdb

    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in llm.text_bpe_train_merges(spark, SF_SMALL).collect()
    ]

    texts = duckdb.connect().execute(
        f"SELECT text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    vocab = collections.Counter()
    for (t,) in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + ["_"])] += 1
    want = []
    for rank in range(1, llm.BPE_MERGES + 1):
        pairs = collections.Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, a + b, cnt))
        new_vocab = collections.Counter()
        for syms, n in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    assert got == want


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_queue7_plan_shapes(spark):
    """The 100 TB claims, read off the physical plans: the geo radius join
    is an equi-join on cells (no cartesian), the polygon and CIDR joins
    broadcast their tiny policy side, readability is a pure zero-exchange
    projection, and the interpolation shares ONE exchange for grid, join
    and both window frames."""
    p = _plan(geo.join_geo_gridded_radius(spark, SF_SMALL))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p

    p = _plan(geo.join_geo_point_in_polygon(spark, SF_SMALL))
    assert "BroadcastExchange" in p and "CartesianProduct" not in p

    from aced_etl_pod_spark.operators import governance_ops as gov2

    p = _plan(gov2.fn_ip_cidr_classify(spark, SF_SMALL))
    assert "BroadcastExchange" in p and "CartesianProduct" not in p

    p = _plan(txt.text_readability_score(spark, SF_SMALL))
    # orderBy is presentation; no hash/aggregate exchange beyond the sort
    assert "HashAggregate" not in p and "Python" not in p

    p = _plan(ext.ts_interpolate_linear(spark, SF_SMALL))
    assert p.count("Exchange hashpartitioning(user_id") <= 2  # grid + series ops


QUEUE3 = [
    ("join_interval_overlap", "ext"),
    ("text_search_boolean", "txt"),
    ("hierarchy_unroll_paths", "adv"),
]


@pytest.mark.parametrize("name,mod", QUEUE3, ids=[n for n, _ in QUEUE3])
def test_queue7_parity_tranche10(spark, con, name, mod):
    m = {"ext": ext, "txt": txt, "adv": adv}[mod]
    fn = getattr(m, name)
    oracle = getattr(m, name.upper() + "_ORACLE")
    sdf = fn(spark, SF_SMALL).toPandas()
    ddf = con.execute(oracle).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, f"{name}: {errs[:5]}"


def test_hierarchy_paths_match_closed_form(spark):
    """The join-loop traversal reproduces the closed-form parent chain
    (parent(k) = (k-1)//3) for every node — path, depth and root."""
    df = adv.hierarchy_unroll_paths(spark, SF_SMALL).toPandas()
    assert len(df) == 150
    for r in df.itertuples():
        chain, k = [r.node], r.node
        while k > 0:
            k = (k - 1) // 3
            chain.append(k)
        want = "/" + "/".join(str(x) for x in reversed(chain))
        assert r.path == want and r.depth == len(chain) - 1 and r.root == 0


def test_interval_blocking_emits_each_pair_once(spark):
    """Remove the aggregation and check raw candidate pairs are unique —
    the max(starts)-bucket dedup rule leaves exactly one row per
    overlapping (promo, span) pair even when a pair shares several
    buckets (long promos span up to 3 day-buckets)."""
    from pyspark.sql import functions as F

    promos = spark.range(24).select(
        "id",
        F.expr(ext._PROMO_START).alias("p_start"),
        F.expr(f"{ext._PROMO_START} + {ext._PROMO_DUR}").alias("p_end"),
    )
    from aced_etl_pod_spark.tables import load

    e = load(spark, SF_SMALL, "events")
    spans = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.unix_timestamp(F.min("ts")).alias("s_start"),
        F.unix_timestamp(F.max("ts")).alias("s_end"),
    )
    B = ext._IVL_BUCKET
    pb = promos.select(
        "id", "p_start", "p_end",
        F.explode(F.expr(f"sequence(p_start div {B}, p_end div {B})")).alias("bucket"),
    )
    sb = spans.select(
        "user_id", "day", "s_start", "s_end",
        F.explode(F.expr(f"sequence(s_start div {B}, s_end div {B})")).alias("bucket"),
    )
    pairs = pb.join(sb, "bucket").filter(
        (F.col("s_start") <= F.col("p_end"))
        & (F.col("p_start") <= F.col("s_end"))
        & (F.expr(f"greatest(p_start, s_start) div {B}") == F.col("bucket"))
    ).select("id", "user_id", "day").toPandas()
    assert not pairs.duplicated().any()


def test_queue7_parity_tranche11(spark, con):
    from aced_etl_pod_spark.operators import sampling as smp

    for fn, oracle in [
        (smp.agg_sample_estimate_ci, smp.AGG_SAMPLE_ESTIMATE_CI_ORACLE),
        (txt.dedup_exact_substring_spans, txt.DEDUP_EXACT_SUBSTRING_SPANS_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_substring_spans_reference(spark):
    """Independent pure-Python recount of the repeated-window fractions:
    build the full window multiset locally, mark windows with global
    count >= 2, compare per-doc counts exactly."""
    import collections

    import duckdb

    df = txt.dedup_exact_substring_spans(spark, SF_SMALL).toPandas()
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    W = txt._SPAN_W
    counts = collections.Counter()
    wins = {}
    for doc_id, text in docs:
        ws = [text[i : i + W] for i in range(len(text) - W + 1)]
        wins[doc_id] = ws
        counts.update(ws)
    got = {r.doc_id: (r.n_windows, r.n_repeated) for r in df.itertuples()}
    for doc_id, ws in wins.items():
        n_rep = sum(1 for w in ws if counts[w] >= 2)
        assert got[doc_id] == (len(ws), n_rep), doc_id


def test_aqp_estimator_is_unbiased_shape(spark):
    """The estimate must be exactly samp_sum / p with p from the bucket
    count — recomputed from the raw parquet in Python."""
    import duckdb

    from aced_etl_pod_spark.operators import sampling as smp

    df = smp.agg_sample_estimate_ci(spark, SF_SMALL).toPandas()
    raw = duckdb.connect().execute(
        f"SELECT event_id, event_type, value FROM '{SF_SMALL}/events.parquet'"
    ).fetchdf()
    raw["bucket"] = (raw.event_id * 2654435761) % 2**32 % 100
    for r in df.itertuples():
        g = raw[raw.event_type == r.event_type]
        s = g[g.bucket < smp._AQP_PCT]
        assert r.n_sample == len(s)
        assert abs(r.est_sum - round(s.value.sum() * 10, 2)) < 0.02
        assert abs(r.exact_sum - round(g.value.sum(), 2)) < 0.02


def test_queue7_parity_tranche12(spark, con):
    for fn, oracle in [
        (ext.agg_weighted_percentile, ext.AGG_WEIGHTED_PERCENTILE_ORACLE),
        (ext.win_drawdown_runmax, ext.WIN_DRAWDOWN_RUNMAX_ORACLE),
        (geo.join_geo_nearest_broadcast, geo.JOIN_GEO_NEAREST_BROADCAST_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_weighted_percentile_definition(spark):
    """wp50/wp90 recomputed from raw rows in Python with the textbook
    definition (smallest value whose cumulative weight reaches q*total)."""
    import duckdb

    df = ext.agg_weighted_percentile(spark, SF_SMALL).toPandas()
    raw = duckdb.connect().execute(
        f"SELECT l_returnflag f, l_extendedprice v, l_quantity w "
        f"FROM '{SF_SMALL}/lineitem.parquet'"
    ).fetchdf()
    for r in df.itertuples():
        g = raw[raw.f == r.l_returnflag].groupby("v", as_index=False).w.sum()
        g = g.sort_values("v")
        tot = g.w.sum()
        for q, got in ((0.5, r.wp50), (0.9, r.wp90)):
            cw = 0.0
            for row in g.itertuples():
                cw += row.w
                if cw >= tot * q:
                    assert abs(got - round(row.v, 2)) < 1e-9, (r.l_returnflag, q)
                    break


def test_bpe_apply_matches_reference_tokenizer(spark):
    """tokenizer_apply_bpe's symbol counts equal a local tokenizer that
    trains the same merges (reference trainer) and applies them with the
    same leftmost fold."""
    import collections

    import duckdb

    texts = [
        t
        for (t,) in duckdb.connect()
        .execute(f"SELECT text FROM '{SF_SMALL}/documents.parquet' ORDER BY doc_id")
        .fetchall()
    ]
    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + ["_"])] += 1
    merges = []
    for _ in range(llm.BPE_MERGES):
        pairs = collections.Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        (a, b), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        nv = collections.Counter()
        for syms, n in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nv[tuple(out)] += n
        vocab = nv

    def encode_word(w):
        syms = list(w) + ["_"]
        for a, b in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return syms

    got = {
        r.doc_id: (r.n_words, r.n_bpe_symbols)
        for r in llm.tokenizer_apply_bpe(spark, SF_SMALL).collect()
    }
    for doc_id, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        n_sym = sum(len(encode_word(w)) for w in words)
        assert got[doc_id] == (len(words), n_sym), doc_id


def test_queue7_parity_tranche13(spark, con):
    from aced_etl_pod_spark.operators import corpus_ops as cor

    for fn, oracle in [
        (ext.stat_chi_square_independence, ext.STAT_CHI_SQUARE_ORACLE),
        (ext.agg_frequent_pairs_market_basket, ext.AGG_FREQUENT_PAIRS_ORACLE),
        (cor.feature_one_hot_encode, cor.FEATURE_ONE_HOT_ORACLE),
        (cor.feature_standard_scale, cor.FEATURE_STANDARD_SCALE_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_chi_square_against_scipy_formula(spark):
    """Total chi-square recomputed from the observed table with the
    closed-form marginals (pure Python), and one-hot rows sum to exactly
    one flag; z-scores per nation mean ~0 and std ~1."""
    import duckdb

    cells = ext.stat_chi_square_independence(spark, SF_SMALL).toPandas()
    obs = {(r.event_type, r.cohort): r.observed for r in cells.itertuples()}
    rows = sorted({k[0] for k in obs})
    cols = sorted({k[1] for k in obs})
    n = sum(obs.values())
    chi2 = 0.0
    for r in rows:
        for c in cols:
            o = obs.get((r, c), 0)
            e = sum(obs[k] for k in obs if k[0] == r) * sum(
                obs[k] for k in obs if k[1] == c
            ) / n
            chi2 += (o - e) ** 2 / e
    assert abs(cells.contribution.sum() - chi2) < 5e-3

    from aced_etl_pod_spark.operators import corpus_ops as cor

    oh = cor.feature_one_hot_encode(spark, SF_SMALL).toPandas()
    flag_cols = [c for c in oh.columns if c.startswith("is_")]
    assert (oh[flag_cols].sum(axis=1) == 1).all()

    z = cor.feature_standard_scale(spark, SF_SMALL).toPandas()
    g = z.groupby("c_nationkey").z
    assert (g.mean().abs() < 0.01).all()
    assert ((g.std() - 1).abs() < 0.05).all()


def test_audio_decode_matches_local_reference(spark):
    """The Spark-side WAV decode equals a direct local decode of the same
    fixture files: features, round-trip digest, and the quarantine row."""
    import glob
    import hashlib

    import numpy as np

    from aced_etl_pod_spark.functions.audiocodec import (
        clip_features,
        decode_wav,
        encode_wav,
    )
    from aced_etl_pod_spark.operators import similarity as sim
    from aced_etl_pod_spark.sources.binary import generate_wav_fixture

    df = sim.multimodal_audio_features(spark, SF_SMALL).toPandas()
    src = generate_wav_fixture(n=24, sub="wav_reference")
    files = sorted(glob.glob(src + "/*.wav"))
    assert len(df) == len(files) == 24
    ok = bad = 0
    for i, path in enumerate(files):
        blob = open(path, "rb").read()
        row = df[df.clip_id == i].iloc[0]
        try:
            sr, samples = decode_wav(blob)
        except ValueError as exc:
            assert row.decode_error == str(exc)
            bad += 1
            continue
        feats = clip_features(samples, sr)
        assert row.sample_rate == sr
        assert row.n_samples == feats["n_samples"]
        assert row.rms == feats["rms"] and row.peak == feats["peak"]
        assert row.zero_crossings == feats["zero_crossings"]
        assert row.echo_digest == hashlib.sha256(
            encode_wav(samples, sr).hex().encode()
        ).hexdigest()
        ok += 1
    assert ok == 23 and bad == 1
    # codec round-trip is byte-exact on a clean clip
    blob = open(files[0], "rb").read()
    sr, samples = decode_wav(blob)
    assert encode_wav(samples, sr) == blob


def test_wav_chunk_walker_handles_extra_chunks():
    """Spec conformance: unknown chunks before 'data' (with odd-size
    padding) are skipped, not fatal — and bad magic / truncation raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from aced_etl_pod_spark.functions.audiocodec import decode_wav, encode_wav

    samples = np.array([0, 1000, -1000, 500], dtype=np.int16)
    blob = encode_wav(samples, 8000)
    # splice an odd-sized LIST chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:12] + extra + blob[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr, out = decode_wav(spliced)
    assert sr == 8000 and (out == samples).all()
    with _pytest.raises(ValueError):
        decode_wav(b"JUNK" + blob[4:])
    with _pytest.raises(ValueError):
        decode_wav(blob[: len(blob) - 3])


@pytest.mark.slow
def test_queue7_parity_stream_anomaly(spark, con):
    from aced_etl_pod_spark.operators import streaming_ops as so

    sdf = so.stream_anomaly_window_zscore(spark, SF_SMALL).toPandas()
    ddf = con.execute(so.STREAM_ANOMALY_WINDOW_ZSCORE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_wav_roundtrip_hypothesis():
    """Property: encode->decode is the identity for ANY int16 sample
    array and sample rate (hypothesis-generated), and decode->encode
    reproduces the canonical bytes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aced_etl_pod_spark.functions.audiocodec import decode_wav, encode_wav

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
        st.integers(min_value=1, max_value=192000),
    )
    def check(vals, sr):
        samples = np.array(vals, dtype=np.int16)
        blob = encode_wav(samples, sr)
        sr2, out = decode_wav(blob)
        assert sr2 == sr and (out == samples).all()
        assert encode_wav(out, sr2) == blob

    check()


def test_queue7_parity_tranche14(spark, con):
    for fn, oracle in [
        (gov.dq_freshness_slo, gov.DQ_FRESHNESS_SLO_ORACLE),
        (gov.dq_schema_contract, gov.DQ_SCHEMA_CONTRACT_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_mmr_matches_reference_greedy(spark):
    """The in-plan MMR greedy equals a from-scratch NumPy MMR over the
    same pool (top-20 cosine, vec_id tie-break): identical pick order."""
    import duckdb
    import numpy as np

    from aced_etl_pod_spark.operators import similarity as sim

    got = [
        (r.rank, r.vec_id)
        for r in sim.sim_mmr_diversified_topk(spark, SF_SMALL).collect()
    ]
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: np.array(v, dtype=np.float64) for vid, v in rows}
    q = vecs[0]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    sims = sorted(
        ((cos(vecs[v], q), v) for v in vecs if v != 0),
        key=lambda t: (-t[0], t[1]),
    )[: sim._MMR_POOL]
    pool = {v: rel for rel, v in sims}
    selected, want = [], []
    for rank in range(1, sim.MMR_K + 1):
        best, best_score = None, None
        for v, rel in pool.items():
            pen = max((cos(vecs[v], vecs[s]) for s in selected), default=0.0)
            score = sim.MMR_LAMBDA * rel - (1 - sim.MMR_LAMBDA) * pen
            if best is None or score > best_score + 1e-12 or (
                abs(score - best_score) <= 1e-12 and v < best
            ):
                best, best_score = v, score
        want.append((rank, best))
        selected.append(best)
        del pool[best]
    assert got == want


def test_queue7_parity_tranche15(spark, con):
    sdf = ext.win_period_over_period(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.WIN_PERIOD_OVER_PERIOD_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_rag_pipeline_matches_reference(spark):
    """End-to-end local reimplementation of the fused RAG pipeline
    (chunking, feature-hash embeddings, cosine recall, budget pack) —
    the op's rows must match exactly."""
    import math

    import duckdb

    got = [
        (r.rank, r.doc_id, r.start, r.n_tokens, r.cum_tokens, r.cos)
        for r in llm.pipeline_rag_context_pack(spark, SF_SMALL).collect()
    ]
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    def rnd6(x):
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    def embed(tokens):
        v = [0.0] * llm._RAG_DIM
        for t in tokens:
            h = llm._rag_tok_hash(t)
            v[h % llm._RAG_DIM] += ((h // 16) % 2) * 2 - 1
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else None

    q = embed(llm.RAG_QUERY.split(" "))
    scored = []
    for doc_id, text in docs:
        words = [w for w in text.split(" ") if w]
        for start in range(0, len(words), llm._RAG_STRIDE):
            toks = words[start : start + llm._RAG_CHUNK]
            if len(toks) < llm._RAG_MIN:
                continue
            e = embed(toks)
            if e is None:
                continue
            cos = rnd6(sum(a * b for a, b in zip(e, q)))
            scored.append((cos, doc_id, start, len(toks)))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want, cum = [], 0
    for rank, (cos, doc_id, start, n) in enumerate(scored[: llm._RAG_POOL], 1):
        cum += n
        if cum > llm._RAG_BUDGET:
            break
        want.append((rank, doc_id, start, n, cum, cos))
    assert got == want


def test_multiprobe_lsh_recall_beats_single_probe(spark):
    """Multiprobe (Hamming-1 neighbor buckets, narrower target) must
    reach at least single-probe's recall@3 vs brute force — the whole
    point of probing past one unlucky hyperplane — and clear an absolute
    floor."""
    import duckdb
    import numpy as np

    from aced_etl_pod_spark.operators import similarity as sim

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: np.array(v, dtype=np.float64) for vid, v in rows}
    ids = sorted(vecs)
    M = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    sims = M @ M.T
    np.fill_diagonal(sims, -2)
    truth = {
        ids[r]: {ids[c] for c in np.argsort(-sims[r])[:3]} for r in range(len(ids))
    }

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.vec_id, set()).add(r.nbr_id)
        hits = sum(len(got.get(v, set()) & truth[v]) for v in truth)
        return hits / (3 * len(truth))

    from aced_etl_pod_spark.functions.similarity import ann_lsh_topk

    emb = sim.load(spark, SF_SMALL, "embeddings")
    single = recall(ann_lsh_topk(emb, k=3, target_bucket=64))
    multi = recall(sim.sim_ann_lsh_multiprobe_topk(spark, SF_SMALL))
    assert multi >= single - 1e-9, (multi, single)
    assert multi >= 0.35, multi


def test_queue7_parity_tranche16(spark, con):
    for fn, oracle in [
        (ext.win_percent_rank_cume, ext.WIN_PERCENT_RANK_CUME_ORACLE),
        (ext.scan_date_dim_generate, ext.SCAN_DATE_DIM_GENERATE_ORACLE),
        (ext.fn_surrogate_key_md5, ext.FN_SURROGATE_KEY_MD5_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_surrogate_keys_collision_free_on_true_naturals(spark):
    """sk_width > 1 must mean the natural key genuinely repeats (audited
    against a raw pandas groupby), and distinct sk count == distinct
    natural-key count (md5 injective on this domain)."""
    import duckdb

    df = ext.fn_surrogate_key_md5(spark, SF_SMALL).toPandas()
    raw = duckdb.connect().execute(
        f"SELECT o_orderkey, CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus"
        f" || '|' || strftime(o_orderdate, '%Y-%m-%d') AS nk"
        f" FROM '{SF_SMALL}/orders.parquet'"
    ).fetchdf()
    m = raw.merge(df, on="o_orderkey")
    widths = m.groupby("nk").o_orderkey.count()
    for r in m.itertuples():
        assert r.sk_width == widths[r.nk]
    assert m.sk.nunique() == m.nk.nunique()


def test_partition_overwrite_acid(spark, con):
    """The partition-overwrite commit: oracle parity, time travel shows
    the pre-restatement partition, other partitions' files are untouched,
    and a straddling file refuses the commit."""
    import pytest as _pytest

    from aced_etl_pod_spark.operators import table_format as tf
    from aced_etl_pod_spark.sources.txnlog import (
        snapshot_files,
        txn_overwrite_partition,
        txn_read,
    )
    from aced_etl_pod_spark.tables import load, scratch_dir

    sdf = tf.txnlog_overwrite_partition(spark, SF_SMALL).toPandas()
    ddf = con.execute(tf.TXNLOG_OVERWRITE_PARTITION_ORACLE).fetchdf()
    assert not compare(sdf, ddf)

    import os

    st = os.stat(os.path.join(SF_SMALL, "orders.parquet"))
    table = scratch_dir(
        f"txn_orders_part_sf0.001_{st.st_mtime_ns:x}_{st.st_size:x}"
    )
    # time travel: v2 (before the restatement) holds ALL 'O' rows
    o = load(spark, SF_SMALL, "orders")
    n_all_o = o.filter("o_orderstatus = 'O'").count()
    v2 = txn_read(spark, table, version=2)
    assert v2.filter("o_orderstatus = 'O'").count() == n_all_o
    # other partitions' physical files survived the overwrite untouched
    before = {f["path"] for f in snapshot_files(table, 2)}
    after = {f["path"] for f in snapshot_files(table, 3)}
    kept = before & after
    gone = before - after
    import json

    def status_of(path):
        for f in snapshot_files(table, 2):
            if f["path"] == path:
                return f["stats"]["o_orderstatus"]["min"]

    assert all(status_of(p) in ("F", "P") for p in kept)
    assert all(status_of(p) == "O" for p in gone)
    # a replacement set that isn't partition-aligned refuses to commit
    with _pytest.raises(ValueError, match="not aligned"):
        txn_overwrite_partition(
            spark,
            o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .filter("o_orderstatus <> 'F'")
            .repartition(1),
            table,
            part_col="o_orderstatus",
            part_value="O",
        )
    # the refused attempt must not have advanced the table version
    from aced_etl_pod_spark.sources.txnlog import current_version

    assert current_version(table) == 3


def test_queue7_parity_tranche18(spark, con):
    for fn, oracle in [
        (ext.win_streak_longest_current, ext.WIN_STREAK_LONGEST_CURRENT_ORACLE),
        (ext.agg_attribution_last_touch, ext.AGG_ATTRIBUTION_LAST_TOUCH_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_streaks_reference(spark):
    """Longest/current streaks recomputed with a plain Python scan over
    each user's sorted active-day set."""
    import datetime

    import duckdb

    df = ext.win_streak_longest_current(spark, SF_SMALL).toPandas()
    raw = duckdb.connect().execute(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) d FROM "
        f"'{SF_SMALL}/events.parquet'"
    ).fetchdf()
    today = raw.d.max()
    got = {r.user_id: (r.longest_streak, r.current_streak) for r in df.itertuples()}
    for uid, grp in raw.groupby("user_id"):
        days = sorted(grp.d)
        longest = cur = 1
        best = 1
        runs = [[days[0]]]
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                runs[-1].append(b)
            else:
                runs.append([b])
        best = max(len(r) for r in runs)
        current = len(runs[-1]) if runs[-1][-1] == today else 0
        assert got[uid] == (best, current), uid


def test_branch_merge_acid(spark, con):
    """Branch workflow guarantees: oracle parity of the merged base,
    isolation before merge, zero-copy seed, diverged-base merge refusal,
    and tag immutability."""
    import os

    import pytest as _pytest

    from aced_etl_pod_spark.operators import table_format as tf
    from aced_etl_pod_spark.sources.txnlog import (
        CommitConflict,
        create_branch,
        current_version,
        merge_branch,
        read_tag,
        set_tag,
        snapshot_files,
        txn_read,
        txn_write,
    )
    from aced_etl_pod_spark.tables import load, scratch_dir

    sdf = tf.txnlog_branch_merge(spark, SF_SMALL).toPandas()
    ddf = con.execute(tf.TXNLOG_BRANCH_MERGE_ORACLE).fetchdf()
    assert not compare(sdf, ddf)

    base_fix = tf.build_orders_txn_table(spark, SF_SMALL)
    base = scratch_dir(base_fix.rstrip("/") + "_branch_base")
    # the pre-merge tag still resolves the v2 content (no %7==3 rows)
    tagged = read_tag(spark, base, "pre-merge")
    assert tagged.filter("o_orderkey % 7 = 3").count() == 0
    # tags are immutable
    with _pytest.raises(ValueError, match="already pins"):
        set_tag(base, "pre-merge", 3)

    # fresh isolation + divergence scenario on copies
    import shutil

    iso_base = scratch_dir(base_fix.rstrip("/") + "_iso_base")
    iso_branch = iso_base.rstrip("/") + "_br"
    shutil.rmtree(iso_base, ignore_errors=True)
    shutil.rmtree(iso_branch, ignore_errors=True)
    shutil.copytree(base_fix, iso_base)
    create_branch(iso_base, iso_branch)
    # zero-copy: the branch dir holds no parquet of its own after seeding
    assert not [f for f in os.listdir(iso_branch) if f.endswith(".parquet")]
    o = load(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    txn_write(spark, o.filter("o_orderkey % 7 = 3").repartition(1), iso_branch,
              stats_cols=("o_orderkey",), op_name="branch_append")
    # isolation: base content unchanged while the branch sees its rows
    assert txn_read(spark, iso_base).filter("o_orderkey % 7 = 3").count() == 0
    assert txn_read(spark, iso_branch).filter("o_orderkey % 7 = 3").count() > 0
    # diverge the base -> fast-forward merge must refuse
    txn_write(spark, o.filter("o_orderkey % 7 = 4").repartition(1), iso_base,
              stats_cols=("o_orderkey",), op_name="rival")
    v_before = current_version(iso_base)
    with _pytest.raises(CommitConflict, match="rebase required"):
        merge_branch(iso_base, iso_branch)
    assert current_version(iso_base) == v_before


def test_queue7_parity_tranche20(spark, con):
    from aced_etl_pod_spark.operators import corpus_ops as cor
    from aced_etl_pod_spark.operators import table_format as tf

    for fn, oracle in [
        (tf.plan_result_cache, tf.PLAN_RESULT_CACHE_ORACLE),
        (cor.scan_fixed_width, cor.scan_fixed_width_oracle(SF_SMALL)),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_result_cache_hit_and_invalidation(spark, tmp_path):
    """Contract: repeated same-version reads never recompute (compute
    counter frozen), and a table commit changes the key (recompute).
    The table lives under tmp_path so the (path, version) cache key is
    unique per test run — the cache itself persists across runs BY
    DESIGN (that is the feature), so a reused path would start warm."""
    import shutil

    from aced_etl_pod_spark.operators import table_format as tf
    from aced_etl_pod_spark.sources.txnlog import current_version, txn_write
    from aced_etl_pod_spark.tables import load

    base_fix = tf.build_orders_txn_table(spark, SF_SMALL)
    table = str(tmp_path / "cache_unit")
    shutil.copytree(base_fix, table)
    n0 = tf.RESULT_CACHE_COMPUTES["n"]
    tf._cached_snapshot_agg(spark, table).collect()
    assert tf.RESULT_CACHE_COMPUTES["n"] == n0 + 1
    tf._cached_snapshot_agg(spark, table).collect()
    tf._cached_snapshot_agg(spark, table).collect()
    assert tf.RESULT_CACHE_COMPUTES["n"] == n0 + 1  # pure hits
    o = load(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    txn_write(spark, o.filter("o_orderkey % 7 = 4").repartition(1), table,
              stats_cols=("o_orderkey",), op_name="bump")
    tf._cached_snapshot_agg(spark, table).collect()
    assert tf.RESULT_CACHE_COMPUTES["n"] == n0 + 2  # version-keyed recompute


def test_queue7_parity_tranche21(spark, con):
    from aced_etl_pod_spark.operators import corpus_ops as cor

    for fn, oracle in [
        (ext.ts_seasonal_decompose, ext.TS_SEASONAL_DECOMPOSE_ORACLE),
        (ext.win_outlier_mad, ext.WIN_OUTLIER_MAD_ORACLE),
        (cor.scan_multiline_json, cor.scan_multiline_json_oracle(SF_SMALL)),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_seasonal_decomposition_additivity(spark):
    """Where the trend exists, total == trend + seasonal + residual to
    rounding, and seasonal components average to ~0 across hours-of-day
    (the additive-model identity)."""
    df = ext.ts_seasonal_decompose(spark, SF_SMALL).toPandas()
    inner = df[df.trend.notna()]
    err = (inner.total - inner.trend - inner.seasonal - inner.residual).abs()
    assert err.max() < 0.01
    hods = df.drop_duplicates("seasonal").seasonal
    assert abs(hods.mean()) < hods.abs().max()


def test_queue7_parity_tranche22(spark, con):
    from aced_etl_pod_spark.operators import corpus_ops as cor
    from aced_etl_pod_spark.operators import udfs

    for fn, oracle in [
        (cor.scan_file_provenance, cor.scan_file_provenance_oracle(spark, SF_SMALL)),
        (udfs.udtf_table_argument, udfs.UDTF_TABLE_ARGUMENT_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_hll_portable_registers_and_estimate(spark, con):
    """Registers hash-check cross-engine; the Flajolet estimate lands
    within HLL error of the exact distinct count at two data sizes; and
    element-wise max of per-shard registers equals the whole-corpus
    registers (mergeability)."""
    import duckdb

    from aced_etl_pod_spark.operators import corpus_ops as cor

    sdf = cor.agg_hll_portable(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.AGG_HLL_PORTABLE_ORACLE).fetchdf()
    assert not compare(sdf, ddf)

    for sf, tol in ((SF_SMALL, 0.35), ("/root/testdata/sf0.1", 0.20)):
        regs = {
            r.bucket: r.register
            for r in cor.agg_hll_portable(spark, sf).toPandas().itertuples()
        }
        est = cor.hll_estimate_from_registers(regs)
        exact = duckdb.connect().execute(
            f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
        ).fetchone()[0]
        assert abs(est - exact) / exact < tol, (sf, est, exact)

    # mergeability: split the corpus by event parity, max-merge registers
    full = duckdb.connect().execute(
        f"""WITH h AS (SELECT (user_id * 2654435761) % 4294967296 AS hv,
                               event_id FROM '{SF_SMALL}/events.parquet')
            SELECT event_id % 2 AS shard, hv % 64 AS bucket,
                   max(CASE WHEN hv // 64 = 0 THEN 27
                            ELSE 27 - length(bin(hv // 64)) END) AS r
            FROM h GROUP BY 1, 2"""
    ).fetchdf()
    merged = full.groupby("bucket").r.max().to_dict()
    whole = {
        r.bucket: r.register
        for r in cor.agg_hll_portable(spark, SF_SMALL).toPandas().itertuples()
    }
    assert merged == whole


def test_queue7_parity_tranche24(spark, con):
    from aced_etl_pod_spark.operators import corpus_ops as cor

    for fn, oracle in [
        (adv.graph_shortest_path_weighted, adv.GRAPH_SHORTEST_PATH_WEIGHTED_ORACLE),
        (cor.agg_kmv_set_intersection, cor.AGG_KMV_SET_INTERSECTION_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_weighted_paths_dominated_by_hops(spark):
    """Weighted distances are >= the unweighted hop distances (weights
    >= 1) and seeds sit at 0 — the Bellman-Ford sanity pair."""
    wd = {r.node: r.dist for r in adv.graph_shortest_path_weighted(spark, SF_SMALL).collect()}
    hd = {r.node: r.dist for r in adv.graph_bfs_khop(spark, SF_SMALL).collect()}
    assert all(wd[n] == 0 for n in wd if n % 50 == 0 and n >= 0 and hd.get(n) == 0)
    for n, d in hd.items():
        if n in wd:
            assert wd[n] >= d, (n, wd[n], d)


def test_queue7_parity_tranche25(spark, con):
    for fn, oracle in [
        (ext.agg_conversion_lag_percentiles, ext.AGG_CONVERSION_LAG_ORACLE),
        (ext.win_rolling_regression_slope, ext.WIN_ROLLING_REGRESSION_SLOPE_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_queue7_parity_sliding_hll(spark, con):
    from aced_etl_pod_spark.operators import corpus_ops as cor

    sdf = cor.agg_hll_sliding_distinct(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.AGG_HLL_SLIDING_DISTINCT_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_sliding_hll_estimates_track_exact(spark):
    """Per-day estimates from the merged registers land within HLL error
    of the exact trailing distinct for every complete window, at sf0.1
    where the counts are nontrivial (~1500)."""
    import duckdb

    from aced_etl_pod_spark.operators import corpus_ops as cor

    sf = "/root/testdata/sf0.1"
    daily = duckdb.connect().execute(
        f"""WITH h AS (SELECT CAST(ts AS DATE) AS day,
                               (user_id * 2654435761) % 4294967296 AS hv
                       FROM '{sf}/events.parquet')
            SELECT day, hv % 64 AS bucket,
                   max(CASE WHEN hv // 64 = 0 THEN 27
                            ELSE 27 - length(bin(hv // 64)) END) AS r
            FROM h GROUP BY 1, 2"""
    ).fetchdf()
    daily["day"] = daily.day.dt.date
    out = cor.agg_hll_sliding_distinct(spark, sf).toPandas()
    import datetime

    for row in out.itertuples():
        day = datetime.date.fromisoformat(row.day)
        win = daily[
            (daily.day >= day - datetime.timedelta(days=6)) & (daily.day <= day)
        ]
        regs = win.groupby("bucket").r.max().to_dict()
        est = cor.hll_estimate_from_registers(regs)
        assert abs(est - row.exact_trailing_users) / row.exact_trailing_users < 0.25


def test_incremental_minhash_equals_full_recompute(spark):
    """The persisted-index incremental dedup returns EXACTLY the full
    recompute's pairs restricted to pairs touching the increment — the
    correctness contract that makes the daily-increment pattern safe."""
    from aced_etl_pod_spark.functions.dedup import minhash_candidate_pairs
    from aced_etl_pod_spark.tables import load

    inc_pairs = txt.dedup_incremental_minhash(spark, SF_SMALL).toPandas()
    d = load(spark, SF_SMALL, "documents")
    full = minhash_candidate_pairs(d, "doc_id", "text", threshold=0.5).toPandas()
    fr = full[(full.id_a % 10 == 0) | (full.id_b % 10 == 0)]
    a = {(r.id_a, r.id_b, r.jaccard) for r in inc_pairs.itertuples()}
    b = {(r.id_a, r.id_b, r.jaccard) for r in fr.itertuples()}
    assert a == b and len(a) > 0


def test_queue7_parity_generalize(spark, con):
    sdf = gov.dq_k_anonymity_generalize(spark, SF_SMALL).toPandas()
    ddf = con.execute(gov.DQ_K_ANONYMITY_GENERALIZE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]
    # the chosen level actually satisfies k, and the next-finer one doesn't
    assert sdf.n.min() >= gov._K
    import duckdb

    width = int(sdf.chosen_width.iloc[0])
    finer = [w for w in gov._GEN_LEVELS if w < width]
    if finer:
        w = finer[-1]
        min_class = duckdb.connect().execute(
            f"""SELECT min(n) FROM (
                  SELECT count(*) AS n
                  FROM '{SF_SMALL}/customer.parquet'
                  GROUP BY c_mktsegment,
                           CAST(floor((c_acctbal + 1000) / {w}) AS BIGINT))"""
        ).fetchone()[0]
        assert min_class < gov._K  # minimality of the chosen width


def test_queue7_plan_shapes_late_tranches(spark):
    """Physical-plan spot checks for the later tranches: the interval
    join is a bucket equi-join (no cartesian/BNL), attribution's argmax
    is an aggregate (no Window node), the nearest-geo argmin likewise,
    the sliding-HLL merge runs over the dense register grid (window on
    bucket, no per-event window), and the one-hot projection carries no
    aggregate at all."""
    p = _plan(ext.join_interval_overlap(spark, SF_SMALL))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p

    p = _plan(ext.agg_attribution_last_touch(spark, SF_SMALL))
    assert "Window" not in p  # max_by partial agg, not a ranked window

    p = _plan(geo.join_geo_nearest_broadcast(spark, SF_SMALL))
    assert "Window" not in p

    from aced_etl_pod_spark.operators import corpus_ops as cor

    p = _plan(cor.feature_one_hot_encode(spark, SF_SMALL))
    assert "HashAggregate" not in p and "Exchange" not in p.split("Sort")[0]


def test_queue7_parity_cdc_replay(spark, con):
    from aced_etl_pod_spark.operators import table_format as tf

    sdf = tf.txnlog_cdc_replay_reconstruct(spark, SF_SMALL).toPandas()
    ddf = con.execute(tf.TXNLOG_CDC_REPLAY_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_cdc_replay_row_level_equivalence(spark):
    """Stronger than the aggregate oracle: the replayed key set equals
    the head snapshot's key set exactly (the overwrite's deletes must
    have been emitted and applied)."""
    from aced_etl_pod_spark.operators import table_format as tf
    from aced_etl_pod_spark.sources.txnlog import txn_read

    table = tf.build_orders_txn_table(spark, SF_SMALL)
    head_keys = {
        r.o_orderkey
        for r in txn_read(spark, table).select("o_orderkey").collect()
    }
    # re-run the replay loop to capture the final state keys
    import duckdb

    want = {
        k
        for (k,) in duckdb.connect()
        .execute(
            f"SELECT o_orderkey FROM '{SF_SMALL}/orders.parquet'"
            " WHERE o_orderkey % 7 <= 2"
        )
        .fetchall()
    }
    assert head_keys == want


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """An sf dir whose every table has the right schema and ZERO rows —
    the empty-partition / fresh-tenant robustness scenario."""
    import duckdb

    out = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    from aced_etl_pod_spark.tables import TABLES

    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_SMALL}/{t}.parquet' WHERE 1=0) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
    return str(out)


def test_queue_ops_tolerate_empty_tables(spark, empty_sf):
    """A curated sweep of queue ops against zero-row tables: every one
    must return a DataFrame (usually empty) rather than raise — the
    empty-daily-partition case a scheduled pipeline hits routinely.
    Iterative ops (BFS, hierarchy, BPE) must terminate; windowed and
    grid ops must tolerate empty bounds; MMR stops gracefully on an
    exhausted pool."""
    from aced_etl_pod_spark.operators import corpus_ops as cor
    from aced_etl_pod_spark.operators import llm_pipeline as llm2
    from aced_etl_pod_spark.operators import similarity as sim

    ops = [
        geo.join_geo_gridded_radius,
        geo.agg_geo_grid_density,
        geo.join_geo_point_in_polygon,
        geo.join_geo_nearest_broadcast,
        gov.dq_k_anonymity,
        gov.fn_pseudonymize_consistent,
        gov.fn_ip_cidr_classify,
        gov.dq_schema_contract,  # spliced bad rows remain -> 4 classes
        gov.dq_k_anonymity_generalize,
        adv.graph_bfs_khop,
        adv.hierarchy_unroll_paths,
        adv.graph_shortest_path_weighted,
        ext.win_event_sequence_regex,
        ext.ts_interpolate_linear,
        ext.join_interval_overlap,
        ext.agg_weighted_percentile,
        ext.win_drawdown_runmax,
        ext.stat_chi_square_independence,
        ext.agg_frequent_pairs_market_basket,
        ext.win_streak_longest_current,
        ext.agg_attribution_last_touch,
        ext.ts_seasonal_decompose,
        ext.win_outlier_mad,
        ext.win_percent_rank_cume,
        ext.fn_surrogate_key_md5,
        ext.win_rolling_regression_slope,
        ext.agg_conversion_lag_percentiles,
        ext.win_period_over_period,
        txt.text_readability_score,
        txt.text_search_boolean,
        txt.dedup_exact_substring_spans,
        cor.feature_one_hot_encode,
        cor.feature_standard_scale,
        cor.agg_hll_portable,
        cor.agg_hll_sliding_distinct,
        llm2.seq_pack_bins_ffd,
        llm2.text_bpe_train_merges,
        sim.sim_mmr_diversified_topk,
    ]
    failures = []
    for fn in ops:
        try:
            n = fn(spark, empty_sf).count()
            assert n >= 0
        except Exception as exc:  # noqa: BLE001 - we want the full census
            failures.append((fn.__name__, str(exc)[:120]))
    assert not failures, failures


def test_check_constraints_enforced(spark, con):
    """Oracle parity for the checked table, and the refusal contract: a
    poisoned batch raises ConstraintViolation, the version does not
    advance, the content is untouched, and no data file was staged."""
    import os

    import pytest as _pytest

    from aced_etl_pod_spark.operators import table_format as tf
    from aced_etl_pod_spark.sources.txnlog import (
        ConstraintViolation,
        current_version,
        txn_read,
        txn_write_checked,
    )
    from aced_etl_pod_spark.tables import load, scratch_dir

    sdf = tf.txnlog_check_constraints(spark, SF_SMALL).toPandas()
    ddf = con.execute(tf.TXNLOG_CHECK_CONSTRAINTS_ORACLE).fetchdf()
    assert not compare(sdf, ddf)

    st = os.stat(os.path.join(SF_SMALL, "orders.parquet"))
    table = scratch_dir(
        f"txn_checked_sf0.001_{st.st_mtime_ns:x}_{st.st_size:x}"
    )
    v = current_version(table)
    n = txn_read(spark, table).count()
    files_before = sorted(
        f for f in os.listdir(table) if f.endswith(".parquet")
    )
    from pyspark.sql import functions as F

    poisoned = (
        load(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 7 == 2)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == 2, -1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    with _pytest.raises(ConstraintViolation, match="positive_price"):
        txn_write_checked(spark, poisoned, table)
    assert current_version(table) == v
    assert txn_read(spark, table).count() == n
    assert (
        sorted(f for f in os.listdir(table) if f.endswith(".parquet"))
        == files_before
    )


@pytest.mark.slow
def test_queue7_parity_dlq(spark, con):
    from aced_etl_pod_spark.operators import streaming_ops as so

    sdf = so.stream_checked_ingest_dlq(spark, SF_SMALL).toPandas()
    ddf = con.execute(so.STREAM_CHECKED_INGEST_DLQ_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]
    # nothing lost: committed + quarantined rows == the filtered stream
    row = sdf.iloc[0]
    import duckdb

    total = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF_SMALL}/events.parquet' WHERE user_id < 50"
    ).fetchone()[0]
    assert row.committed_rows + row.quarantined_rows == total


def test_queue7_parity_tranche32(spark, con):
    for fn, oracle in [
        (ext.agg_gini_coefficient, ext.AGG_GINI_COEFFICIENT_ORACLE),
        (ext.agg_entropy_categorical, ext.AGG_ENTROPY_CATEGORICAL_ORACLE),
        (txt.text_vocab_growth_heaps, txt.TEXT_VOCAB_GROWTH_HEAPS_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_gini_and_entropy_bounds(spark):
    """Definition bounds: Gini in [0, 1); entropy in [0, log2(5)] with
    the uniform bound tight only when all five types appear."""
    import math

    g = ext.agg_gini_coefficient(spark, SF_SMALL).toPandas()
    assert ((g.gini >= 0) & (g.gini < 1)).all()
    e = ext.agg_entropy_categorical(spark, SF_SMALL).toPandas()
    assert ((e.entropy_bits >= 0) & (e.entropy_bits <= math.log2(5) + 1e-9)).all()
    assert (e[e.n_types < 5].entropy_bits < math.log2(5)).all()


def test_queue7_parity_tranche33(spark, con):
    for fn, oracle in [
        (ext.agg_markov_transition_matrix, ext.AGG_MARKOV_TRANSITION_ORACLE),
        (ext.fn_ab_test_proportions, ext.FN_AB_TEST_PROPORTIONS_ORACLE),
        (txt.text_zipf_rank_frequency, txt.TEXT_ZIPF_RANK_FREQUENCY_ORACLE),
    ]:
        sdf = fn(spark, SF_SMALL).toPandas()
        ddf = con.execute(oracle).fetchdf()
        errs = compare(sdf, ddf)
        assert not errs, f"{fn.__name__}: {errs[:5]}"


def test_markov_rows_normalize_and_zipf_monotone(spark):
    """Markov rows sum to 1 (within rounding); Zipf frequencies are
    monotone non-increasing in rank and the fitted slope is negative."""
    m = ext.agg_markov_transition_matrix(spark, SF_SMALL).toPandas()
    sums = m.groupby("cur").p.sum()
    assert ((sums - 1.0).abs() < 0.01).all()
    z = txt.text_zipf_rank_frequency(spark, SF_SMALL).toPandas().sort_values("rank")
    assert (z.freq.diff().dropna() <= 0).all()
    assert z.zipf_slope.iloc[0] < 0


def test_queue7_parity_tranche34(spark, con):
    sdf = ext.agg_benford_digit_test(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_BENFORD_DIGIT_TEST_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_cusum_matches_reference_recursion(spark):
    """The distributed CUSUM equals a from-scratch local recursion on
    the real data (same stats, same clamps, same restart rule), and a
    synthetic injected drift actually fires an alarm. The reference
    applies the op's published cross-engine replay contract: mu/sigma
    through the 9dp decimal sandwich, z through the 6dp sandwich
    (util.money_sql — the same contract WIN_CUSUM_CHANGEPOINT_ORACLE
    replays as a recursive CTE)."""
    import duckdb
    import pandas as pd

    from aced_etl_pod_spark.operators.util import money_sql

    got = {
        r.user_id: (r.n_events, r.n_alarms, r.first_alarm_idx)
        for r in ext.win_cusum_changepoint(spark, SF_SMALL).collect()
    }
    raw = duckdb.connect().execute(
        f"""WITH st AS (
              SELECT user_id,
                     {money_sql('avg(value)', 9, 12)} AS mu,
                     {money_sql('stddev_samp(value)', 9, 12)} AS sigma
              FROM '{SF_SMALL}/events.parquet' GROUP BY 1
            )
            SELECT e.user_id,
                   {money_sql('(e.value - st.mu) / st.sigma', 6, 9)} AS z
            FROM '{SF_SMALL}/events.parquet' e JOIN st USING (user_id)
            WHERE st.sigma > 0
            ORDER BY e.user_id, e.ts, e.event_id"""
    ).fetchdf()
    for uid, grp in raw.groupby("user_id"):
        hi = lo = 0.0
        alarms, first = 0, -1
        for i, z in enumerate(grp.z):
            hi = max(0.0, hi + z - ext.CUSUM_K)
            lo = max(0.0, lo - z - ext.CUSUM_K)
            if hi > ext.CUSUM_H or lo > ext.CUSUM_H:
                alarms += 1
                if first < 0:
                    first = i
                hi = lo = 0.0
        assert got[uid] == (len(grp), alarms, first), uid

    # drift contrast: a mean shift must alarm (with global
    # standardization BOTH halves sit ~1 sigma off the straddling mean,
    # so alarms fire early on the low side — correct CUSUM behavior);
    # the same series WITHOUT the shift must stay silent.
    import datetime

    import aced_etl_pod_spark.operators.extra_ops as _ext
    from unittest import mock

    base = datetime.datetime(2024, 1, 1)

    def series(shift):
        rows = [
            (1, base + datetime.timedelta(minutes=i), i,
             10.0 + (i % 7) * 0.1 + (shift if i >= 100 else 0.0))
            for i in range(200)
        ]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )

    with mock.patch.object(_ext, "load", lambda *_a, **_k: series(5.0)):
        drifted = _ext.win_cusum_changepoint(spark, SF_SMALL).toPandas()
    with mock.patch.object(_ext, "load", lambda *_a, **_k: series(0.0)):
        flat = _ext.win_cusum_changepoint(spark, SF_SMALL).toPandas()
    assert drifted.n_alarms.iloc[0] >= 1
    assert flat.n_alarms.iloc[0] == 0


def test_queue7_parity_km(spark, con):
    sdf = ext.win_survival_kaplan_meier(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.WIN_SURVIVAL_KM_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_km_matches_reference_estimator(spark):
    """From-scratch local Kaplan-Meier over the same (duration, event)
    pairs: survival values match to rounding; the curve is monotone
    non-increasing and bounded in (0, 1]."""
    import duckdb

    out = ext.win_survival_kaplan_meier(spark, SF_SMALL).toPandas()
    raw = duckdb.connect().execute(
        f"""WITH per_user AS (
              SELECT user_id,
                     min(CASE WHEN event_type='view' THEN ts END) AS fv,
                     min(CASE WHEN event_type='purchase' THEN ts END) AS fb,
                     max(ts) AS last_ts
              FROM '{SF_SMALL}/events.parquet' GROUP BY user_id)
            SELECT CASE WHEN fb IS NOT NULL AND fb >= fv
                        THEN floor(epoch(fb)) - floor(epoch(fv))
                        ELSE floor(epoch(last_ts)) - floor(epoch(fv)) END AS dur,
                   CASE WHEN fb IS NOT NULL AND fb >= fv THEN 1 ELSE 0 END AS ev
            FROM per_user WHERE fv IS NOT NULL"""
    ).fetchall()
    pairs = sorted((int(d), int(e)) for d, e in raw)
    n = len(pairs)
    s = 1.0
    want = {}
    i = 0
    while i < n:
        t = pairs[i][0]
        d = sum(1 for dd, ee in pairs if dd == t and ee == 1)
        at_risk = sum(1 for dd, _ in pairs if dd >= t)
        if 0 < d < at_risk:
            s *= 1 - d / at_risk
            want[t] = round(s, 4)
        elif d > 0:
            s *= 1 - d / at_risk
        i += sum(1 for dd, _ in pairs if dd == t)
    got = {int(r.dur_s): r.survival for r in out.itertuples()}
    assert got == want
    vals = [v for _, v in sorted(got.items())]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert all(0 < v <= 1 for v in vals)


# -- tranche 36: bigram-LM perplexity + two-sample KS ----------------------


def test_queue7_parity_ngram_lm(spark, con):
    sdf = llm.text_ngram_lm_score(spark, SF_SMALL).toPandas()
    ddf = con.execute(llm.TEXT_NGRAM_LM_SCORE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_ngram_lm_matches_reference_model(spark):
    """From-scratch local add-0.5 bigram LM over the same corpus: per-doc
    perplexities match the distributed scorer exactly (after the same 9dp
    per-term rounding), and every ppl is > 1."""
    import duckdb
    from decimal import Decimal
    import math

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    bi, ctx, vocab = {}, {}, set()
    docs = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        vocab.update(toks)
        prs = list(zip(toks, toks[1:]))
        docs[doc_id] = prs
        for p in prs:
            bi[p] = bi.get(p, 0) + 1
            ctx[p[0]] = ctx.get(p[0], 0) + 1
    v = float(len(vocab))
    want = {}
    for doc_id, prs in docs.items():
        if not prs:
            continue
        s = Decimal(0)
        for a, b in prs:
            p = (bi[(a, b)] + 0.5) / (ctx[a] + 0.5 * v)
            s += Decimal(f"{round(-math.log2(p), 9):.9f}")
        h = float(s) / len(prs)
        want[doc_id] = round(2.0 ** h, 2)
    out = llm.text_ngram_lm_score(spark, SF_SMALL).toPandas()
    got = {int(r.doc_id): r.ppl for r in out.itertuples()}
    assert got == want
    assert all(p > 1.0 for p in got.values())


def test_queue7_parity_ks(spark, con):
    sdf = ext.stat_ks_two_sample(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.STAT_KS_TWO_SAMPLE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_ks_detects_shift_and_accepts_identical(spark):
    """Behavioral contrast on synthetic cohorts: identical distributions
    give D = 0 (no rejection); a large location shift between the two
    event types drives D toward 1 and rejects H0."""
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    def cohorts(shift):
        rows = []
        for i in range(300):
            rows.append((float(i % 50), "view"))
            rows.append((float(i % 50) + shift, "purchase"))
        return spark.createDataFrame(rows, "value double, event_type string")

    with mock.patch.object(_ext, "load", lambda *_a, **_k: cohorts(0.0)):
        same = _ext.stat_ks_two_sample(spark, SF_SMALL).toPandas()
    with mock.patch.object(_ext, "load", lambda *_a, **_k: cohorts(1000.0)):
        shifted = _ext.stat_ks_two_sample(spark, SF_SMALL).toPandas()
    assert same.d_stat.iloc[0] == 0.0 and not same.reject_h0.iloc[0]
    assert shifted.d_stat.iloc[0] == 1.0 and bool(shifted.reject_h0.iloc[0])


# -- tranche 37: autocorrelation + Mann-Whitney U --------------------------


def test_queue7_parity_acf(spark, con):
    sdf = ext.ts_autocorrelation(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.TS_AUTOCORRELATION_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_acf_detects_daily_cycle(spark):
    """A synthetic events feed with a strict 24h-periodic intensity:
    r_24 must be the maximum of all 24 lags and near 1; a flat feed has
    zero variance (n·x_t - S = 0 exactly) and its ACF is NULL, not
    NaN."""
    import datetime
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    def feed(periodic):
        rows = []
        base = datetime.datetime(2024, 1, 1)
        for hour in range(240):
            x = (5 + 20 * (hour % 24 == 3)) if periodic else 7
            for i in range(x):
                rows.append((base + datetime.timedelta(hours=hour, seconds=i),))
        return spark.createDataFrame(rows, "ts timestamp")

    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed(True)):
        per = _ext.ts_autocorrelation(spark, SF_SMALL).toPandas()
    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed(False)):
        flat = _ext.ts_autocorrelation(spark, SF_SMALL).toPandas()
    best = per.sort_values("acf", ascending=False).iloc[0]
    # 10 days of data -> lag-24 keeps 216/240 of the mass, so r_24 ~ 0.9
    assert best.lag_hours == 24 and best.acf > 0.85
    assert flat.acf.isna().all()


def test_queue7_parity_mwu(spark, con):
    sdf = ext.stat_mann_whitney_u(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.STAT_MANN_WHITNEY_U_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_mwu_matches_reference_ranksum(spark):
    """From-scratch tied-rank U and z over the same cents-binned values:
    exact agreement with the distributed op at sf0.001."""
    import math

    import duckdb

    raw = duckdb.connect().execute(
        f"""SELECT round(value, 2) AS x, event_type
            FROM '{SF_SMALL}/events.parquet'
            WHERE event_type IN ('view', 'purchase')"""
    ).fetchall()
    pooled = sorted(raw)
    n = len(pooled)
    # average ranks with ties
    ranks = {}
    i = 0
    tie_t = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        tie_t += t * t * t - t
        ranks[pooled[i][0]] = (i + 1 + j) / 2.0
        i = j
    r1 = sum(ranks[x] for x, et in pooled if et == "view")
    n1 = sum(1 for _, et in pooled if et == "view")
    n2 = n - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((n + 1) - tie_t / (n * (n - 1.0)))
    )
    z = round((u1 - n1 * n2 / 2.0) / sigma, 4)
    out = ext.stat_mann_whitney_u(spark, SF_SMALL).toPandas()
    assert out.n1.iloc[0] == n1 and out.n2.iloc[0] == n2
    assert out.u1.iloc[0] == u1
    assert out.z.iloc[0] == z


# -- tranche 38: link prediction + DP Laplace release ----------------------


def test_queue7_parity_linkpred(spark, con):
    sdf = adv.graph_jaccard_link_prediction(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.GRAPH_JACCARD_LINK_PREDICTION_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_linkpred_matches_bruteforce_sets(spark):
    """Python set-algebra reference over the same derived graph: every
    emitted (a, b) is non-adjacent, its common/jaccard are exactly the
    set-intersection values, and the emitted top-20 is the true top-20
    under the (jaccard desc, a, b) total order."""
    import duckdb

    edges = duckdb.connect().execute(
        f"""SELECT DISTINCT least(o_custkey % 500, o_orderkey % 500) AS u,
                   greatest(o_custkey % 500, o_orderkey % 500) AS v
            FROM '{SF_SMALL}/orders.parquet'
            WHERE o_custkey % 500 <> o_orderkey % 500"""
    ).fetchall()
    nbrs = {}
    eset = set()
    for u, v in edges:
        eset.add((u, v))
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    scored = []
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in eset:
                continue
            common = len(nbrs[a] & nbrs[b])
            if common:
                scored.append(
                    (round(common / len(nbrs[a] | nbrs[b]), 4), a, b, common)
                )
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = [(a, b, c, j) for j, a, b, c in scored[:20]]
    out = adv.graph_jaccard_link_prediction(spark, SF_SMALL).toPandas()
    got = [
        (int(r.a), int(r.b), int(r.common), r.jaccard)
        for r in out.itertuples()
    ]
    assert got == want


def test_queue7_parity_dp_laplace(spark, con):
    sdf = gov.dp_noisy_count_laplace(spark, SF_SMALL).toPandas()
    ddf = con.execute(gov.DP_NOISY_COUNT_LAPLACE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_dp_laplace_noise_properties(spark):
    """The seeded Laplace draws replay exactly (same release twice), the
    true counts are perturbed but within the ε=1 tail bound |n| ≤ 25
    (P ≈ e⁻²⁵ per draw), and the release actually adds noise (not all
    residuals are zero)."""
    import duckdb
    import math

    out1 = gov.dp_noisy_count_laplace(spark, SF_SMALL).toPandas()
    out2 = gov.dp_noisy_count_laplace(spark, SF_SMALL).toPandas()
    assert out1.equals(out2)
    truth = dict(
        (
            (r[0], str(r[1])),
            r[2],
        )
        for r in duckdb.connect().execute(
            f"""SELECT event_type,
                       strftime(CAST(date_trunc('day', ts) AS DATE),
                                '%Y-%m-%d'),
                       count(*)
                FROM '{SF_SMALL}/events.parquet' GROUP BY 1, 2"""
        ).fetchall()
    )
    resid = [
        r.noisy_count - truth[(r.event_type, r.day)] for r in out1.itertuples()
    ]
    assert all(abs(x) <= 25 for x in resid)
    assert any(abs(x) > 1e-6 for x in resid)
    # inverse-CDF replay: recompute one group's draw from scratch
    et, day = out1.event_type.iloc[0], out1.day.iloc[0]
    code = {"click": 1, "error": 2, "purchase": 3, "signup": 4, "view": 5}[et]
    import datetime

    epoch_day = int(
        datetime.datetime.strptime(day, "%Y-%m-%d")
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
    )
    h = ((epoch_day + code) * 2654435761) % 4294967296
    u = (h + 0.5) / 4294967296.0
    n = -1.0 * math.copysign(1, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
    from decimal import Decimal

    want = float(
        round(Decimal(f"{truth[(et, day)] + n:.6f}"), 4)
    )
    assert abs(out1.noisy_count.iloc[0] - want) < 5e-4


# -- tranche 39: phonetic-blocked fuzzy join + event paths -----------------


def test_queue7_parity_fuzzy_join(spark, con):
    sdf = ext.join_fuzzy_phonetic_blocked(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.JOIN_FUZZY_PHONETIC_BLOCKED_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_fuzzy_join_blocking_recall_quantified(spark):
    """Blocking is a recall trade, not an assumption: compare the blocked
    result to the UNBLOCKED brute-force lev<=1 linkage. Every blocked
    match must appear in the brute force (no false pairs), clean
    (unperturbed) mentions must all self-match exactly (lev=0), and the
    measured recall must stay >= 85% — the honest number for
    single-char-deletion noise under phonetic blocking."""
    import duckdb

    blocked = ext.join_fuzzy_phonetic_blocked(spark, SF_SMALL).toPandas()
    brute = duckdb.connect().execute(
        f"""WITH part AS (SELECT * FROM '{SF_SMALL}/part.parquet'),
            catalog AS (SELECT DISTINCT p_name AS entity FROM part),
            mentions AS (
              SELECT p_partkey, {ext._FUZZY_DIRTY_SQL} AS mention FROM part)
            SELECT m.p_partkey, min(c.entity) AS entity
            FROM mentions m JOIN catalog c
              ON levenshtein(m.mention, c.entity) <= 1
            GROUP BY m.p_partkey"""
    ).fetchall()
    brute_keys = {k for k, _ in brute}
    got_keys = set(blocked.p_partkey)
    assert got_keys <= brute_keys
    assert len(got_keys) / len(brute_keys) >= 0.85
    clean = blocked[blocked.lev == 0]
    assert (clean.mention == clean.entity).all()


def test_queue7_parity_event_paths(spark, con):
    sdf = ext.agg_event_path_topk(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_EVENT_PATH_TOPK_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_event_paths_match_reference_counter(spark):
    """Pure-Python trigram counter over each user's (ts, event_id) order
    reproduces the top-15 paths exactly (count desc, path asc order)."""
    from collections import Counter

    import duckdb

    rows = duckdb.connect().execute(
        f"""SELECT user_id, event_type FROM '{SF_SMALL}/events.parquet'
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user = {}
    for uid, et in rows:
        by_user.setdefault(uid, []).append(et)
    c = Counter()
    for seq in by_user.values():
        for i in range(len(seq) - 2):
            c[(seq[i], seq[i + 1], seq[i + 2])] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    want = [(">".join(k), n, i + 1) for i, (k, n) in enumerate(ranked)]
    out = ext.agg_event_path_topk(spark, SF_SMALL).toPandas()
    got = [(r.path, int(r.n), int(r.rk)) for r in out.itertuples()]
    assert got == want


# -- tranche 40: Welch t-test + seasonal-naive backtest --------------------


def test_queue7_parity_welch(spark, con):
    sdf = ext.stat_t_test_welch(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.STAT_T_TEST_WELCH_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_welch_matches_reference_formula(spark):
    """Textbook Welch t and Welch-Satterthwaite df computed locally over
    the same cents-rounded values agree exactly after rounding."""
    import duckdb

    vals = duckdb.connect().execute(
        f"""SELECT event_type, round(value, 2) FROM
            '{SF_SMALL}/events.parquet'
            WHERE event_type IN ('view', 'purchase')"""
    ).fetchall()
    g1 = [v for et, v in vals if et == "view"]
    g2 = [v for et, v in vals if et == "purchase"]

    def mv(g):
        n = len(g)
        m = sum(g) / n
        v = sum((x - m) ** 2 for x in g) / (n - 1)
        return n, m, v

    n1, m1, v1 = mv(g1)
    n2, m2, v2 = mv(g2)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / se2 ** 0.5
    df = se2 * se2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    out = ext.stat_t_test_welch(spark, SF_SMALL).toPandas()
    assert out.n1.iloc[0] == n1 and out.n2.iloc[0] == n2
    assert abs(out.t.iloc[0] - round(t, 4)) < 2e-4
    assert abs(out.df.iloc[0] - round(df, 2)) < 2e-2


def test_queue7_parity_snaive(spark, con):
    sdf = ext.ts_forecast_snaive_backtest(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.TS_FORECAST_SNAIVE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_snaive_backtest_is_exact_on_synthetic(spark):
    """A perfectly 24h-periodic series makes the seasonal-naive forecast
    exact (MAE = RMSE = 0, MASE = 0); a white-noise-free trending series
    makes the one-step naive strictly better (MASE > 1)."""
    import datetime
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    def feed(kind):
        rows = []
        base = datetime.datetime(2024, 1, 1)
        for hour in range(120):
            if kind == "periodic":
                x = 3 + 2 * (hour % 24 == 0)
            else:  # linear ramp: y_t = 1 + hour -> snaive err 24, naive err 1
                x = 1 + hour
            for i in range(int(x)):
                rows.append((base + datetime.timedelta(hours=hour, seconds=i),))
        return spark.createDataFrame(rows, "ts timestamp")

    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed("periodic")):
        per = _ext.ts_forecast_snaive_backtest(spark, SF_SMALL).toPandas()
    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed("ramp")):
        ramp = _ext.ts_forecast_snaive_backtest(spark, SF_SMALL).toPandas()
    assert per.mae_snaive.iloc[0] == 0.0 and per.mase.iloc[0] == 0.0
    assert per.rmse_snaive.iloc[0] == 0.0
    assert ramp.mase.iloc[0] == 24.0  # err 24 vs err 1, exactly


# -- tranche 41: Holt-Winters + seasonal-residual anomaly ------------------


def test_holt_winters_matches_reference_recursion(spark):
    """From-scratch local additive Holt-Winters over the same dense
    per-type hourly grids: n_obs, in-sample MAE and all three forecasts
    match exactly (same float recursion, same init)."""
    import duckdb

    from aced_etl_pod_spark.operators.extra_ops import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_PERIOD,
    )

    rows = duckdb.connect().execute(
        f"""SELECT event_type,
                   CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT),
                   count(*)
            FROM '{SF_SMALL}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    by_type = {}
    for et, h, c in rows:
        by_type.setdefault(et, {})[h] = c
    m = HW_PERIOD
    want = {}
    for et, d in by_type.items():
        lo, hi = min(d), max(d)
        y = [float(d.get(h, 0)) for h in range(lo, hi + 3600, 3600)]
        n = len(y)
        level = sum(y[:m]) / m
        trend = (sum(y[m:2 * m]) / m - sum(y[:m]) / m) / m
        seas = [v - level for v in y[:m]]
        abs_err = 0.0
        for t in range(m, n):
            s_prev = seas[t % m]
            abs_err += abs(y[t] - (level + trend + s_prev))
            nl = HW_ALPHA * (y[t] - s_prev) + (1 - HW_ALPHA) * (level + trend)
            trend = HW_BETA * (nl - level) + (1 - HW_BETA) * trend
            seas[t % m] = HW_GAMMA * (y[t] - nl) + (1 - HW_GAMMA) * s_prev
            level = nl
        want[et] = (
            n,
            round(abs_err / (n - m), 4),
            tuple(
                round(level + (k + 1) * trend + seas[(n + k) % m], 4)
                for k in range(3)
            ),
        )
    out = ext.ts_holt_winters(spark, SF_SMALL).toPandas()
    got = {
        r.event_type: (int(r.n_obs), r.mae_insample, (r.fc_1, r.fc_2, r.fc_3))
        for r in out.itertuples()
    }
    assert got == want


def test_holt_winters_nails_periodic_series(spark):
    """On a noise-free 24h-periodic feed the smoother converges onto the
    cycle: late-sample MAE is small and the 3 forecasts continue the
    pattern (each within 1.0 of the true periodic value)."""
    import datetime
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for hour in range(24 * 10):
        x = 3 + 4 * (hour % 24 == 5)
        for i in range(x):
            rows.append(
                ("view", base + datetime.timedelta(hours=hour, seconds=i))
            )
    feed = spark.createDataFrame(rows, "event_type string, ts timestamp")
    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed):
        out = _ext.ts_holt_winters(spark, SF_SMALL).toPandas()
    assert out.n_obs.iloc[0] == 240
    assert out.mae_insample.iloc[0] < 0.6
    # hours 240, 241, 242 -> hod 0, 1, 2 -> true value 3
    for k in ("fc_1", "fc_2", "fc_3"):
        assert abs(out[k].iloc[0] - 3.0) < 1.0


def test_queue7_parity_seasonal_anomaly(spark, con):
    sdf = ext.ts_seasonal_residual_anomaly(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.TS_SEASONAL_RESIDUAL_ANOMALY_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_seasonal_anomaly_finds_injected_spike(spark):
    """Inject a huge single-hour spike into an otherwise regular periodic
    feed: that hour must surface as the top anomaly."""
    import datetime
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for hour in range(24 * 8):
        n = 5 + (hour % 24 == 12) * 3
        if hour == 100:
            n += 60  # the anomaly
        for i in range(n):
            rows.append(
                (base + datetime.timedelta(hours=hour, seconds=i), 1.0)
            )
    feed = spark.createDataFrame(rows, "ts timestamp, value double")
    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed):
        out = _ext.ts_seasonal_residual_anomaly(spark, SF_SMALL).toPandas()
    assert len(out) >= 1
    spike_hour = (base + datetime.timedelta(hours=100)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    assert out.hour.iloc[0] == spike_hour


# -- tranche 42: native recursive CTE + VARIANT ----------------------------


def test_queue7_parity_recursive_native(spark, con):
    sdf = adv.sql_recursive_cte_native(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.SQL_RECURSIVE_CTE_NATIVE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_recursive_native_equals_unrolled(spark):
    """Spark's native WITH RECURSIVE executor and the hand-unrolled
    loop-of-joins produce byte-identical root paths — the two recursion
    strategies pin each other."""
    native = (
        adv.sql_recursive_cte_native(spark, SF_SMALL)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    unrolled = (
        adv.hierarchy_unroll_paths(spark, SF_SMALL)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert native[["node", "root", "depth", "path"]].equals(
        unrolled[["node", "root", "depth", "path"]]
    )


def test_queue7_parity_variant(spark, con):
    sdf = adv.scan_json_variant(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.SCAN_JSON_VARIANT_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_variant_typed_access_semantics(spark):
    """variant_get contract the op relies on: typed extraction, NULL on
    a missing path, and numeric widening — checked directly."""
    row = spark.sql(
        """SELECT variant_get(parse_json('{"k": 7}'), '$.k', 'long') AS k,
                  variant_get(parse_json('{"k": 7}'), '$.missing', 'long')
                    AS miss,
                  variant_get(parse_json('{"k": 7}'), '$.k', 'double') AS kd
        """
    ).collect()[0]
    assert row.k == 7 and row.miss is None and row.kd == 7.0


# -- tranche 43: Poisson bootstrap CI + cross-correlation ------------------


def test_queue7_parity_bootstrap(spark, con):
    sdf = ext.stat_bootstrap_poisson_ci(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.STAT_BOOTSTRAP_POISSON_CI_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_bootstrap_ci_properties(spark):
    """The CI brackets the point estimate, replays exactly, narrows as n
    grows (sf0.001 vs sf0.01 widths), and the replica weights follow the
    seeded Poisson(1) ladder (checked by recomputing one replica's mean
    from scratch)."""
    import duckdb

    out1 = ext.stat_bootstrap_poisson_ci(spark, SF_SMALL).toPandas()
    out2 = ext.stat_bootstrap_poisson_ci(spark, SF_SMALL).toPandas()
    assert out1.equals(out2)
    r = out1.iloc[0]
    assert r.ci_lo <= r.mean_point <= r.ci_hi
    big = ext.stat_bootstrap_poisson_ci(
        spark, SF_SMALL.replace("0.001", "0.01")
    ).toPandas().iloc[0]
    assert (big.ci_hi - big.ci_lo) < (r.ci_hi - r.ci_lo)
    # replica 0 recomputed locally from the same seeded ladder
    rows = duckdb.connect().execute(
        f"""SELECT event_id, round(value, 2) FROM
            '{SF_SMALL}/events.parquet' WHERE event_type = 'purchase'"""
    ).fetchall()
    thresholds = [
        (0.367879441, 0),
        (0.735758882, 1),
        (0.919698603, 2),
        (0.981011843, 3),
        (0.996340153, 4),
        (0.999405815, 5),
    ]
    sw = tw = 0
    for eid, x in rows:
        h = ((eid * 64 + 0 + 1) * 2654435761) % 4294967296
        u = (h + 0.5) / 4294967296.0
        w = next((k for t, k in thresholds if u < t), 6)
        sw += w * x
        tw += w
    from decimal import Decimal

    want_mean0 = float(round(Decimal(f"{sw / tw:.9f}"), 6))
    # the replica means are private to the plan; re-derive via DuckDB
    got_mean0 = duckdb.connect().execute(
        f"""WITH base AS (
              SELECT event_id, CAST(round(value, 2) AS DECIMAL(18,2)) AS x
              FROM '{SF_SMALL}/events.parquet'
              WHERE event_type = 'purchase')
            SELECT CAST(round(CAST(CAST(sum(w * x) AS DOUBLE) / sum(w)
                   AS DECIMAL(18,9)), 6) AS DOUBLE)
            FROM (
              SELECT x,
                     CASE WHEN u < 0.367879441 THEN 0
                          WHEN u < 0.735758882 THEN 1
                          WHEN u < 0.919698603 THEN 2
                          WHEN u < 0.981011843 THEN 3
                          WHEN u < 0.996340153 THEN 4
                          WHEN u < 0.999405815 THEN 5 ELSE 6 END AS w
              FROM (SELECT x,
                      (((event_id * 64 + 1) * 2654435761) % 4294967296 + 0.5)
                        / 4294967296.0 AS u
                    FROM base))"""
    ).fetchone()[0]
    assert abs(got_mean0 - want_mean0) < 1e-9


def test_queue7_parity_ccf(spark, con):
    sdf = ext.ts_cross_correlation(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.TS_CROSS_CORRELATION_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_ccf_detects_lead_lag(spark):
    """Synthetic feed where purchases replay the view pattern 3 hours
    later: the CCF must peak at lag +3."""
    import datetime
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for hour in range(240):
        nv = 3 + 10 * (hour % 24 == 6)
        rows += [
            ("view", base + datetime.timedelta(hours=hour, seconds=i))
            for i in range(nv)
        ]
        np_ = 3 + 10 * ((hour - 3) % 24 == 6)
        rows += [
            ("purchase", base + datetime.timedelta(hours=hour, seconds=i))
            for i in range(np_)
        ]
    feed = spark.createDataFrame(rows, "event_type string, ts timestamp")
    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed):
        out = _ext.ts_cross_correlation(spark, SF_SMALL).toPandas()
    best = out.sort_values("ccf", ascending=False).iloc[0]
    assert best.lag_hours == 3 and best.ccf > 0.8


# -- tranche 44: Arrow UDF + Python DataSource API -------------------------


def test_queue7_parity_arrow_udf(spark, con):
    from aced_etl_pod_spark.operators import udfs

    sdf = udfs.udf_scalar_arrow(spark, SF_SMALL).toPandas()
    ddf = con.execute(udfs.UDF_SCALAR_ARROW_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_queue7_parity_python_datasource(spark, con):
    from aced_etl_pod_spark.operators import udfs

    sdf = udfs.scan_python_datasource(spark, SF_SMALL).toPandas()
    ddf = con.execute(udfs.SCAN_PYTHON_DATASOURCE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_python_datasource_partition_planning(spark):
    """The custom source's partition plan is REAL: the raw scan has
    exactly SENSOR_SHARDS input partitions (one task each) and every
    shard contributes its exact row quota."""
    from aced_etl_pod_spark.operators import udfs
    from aced_etl_pod_spark.sources.pysource import (
        SENSOR_ROWS,
        SENSOR_SHARDS,
        SensorSynthDataSource,
    )

    try:
        spark.dataSource.register(SensorSynthDataSource)
    except Exception:
        pass
    raw = spark.read.format("sensor_synth").load()
    assert raw.rdd.getNumPartitions() == SENSOR_SHARDS
    out = udfs.scan_python_datasource(spark, SF_SMALL).toPandas()
    assert len(out) == SENSOR_SHARDS
    assert (out.n == SENSOR_ROWS // SENSOR_SHARDS).all()


# -- tranche 45: streaming Python DataSource + SFT chat render -------------


def test_queue7_parity_stream_pyds(spark, con):
    from aced_etl_pod_spark.operators import streaming_ops as so

    sdf = so.stream_python_datasource(spark, SF_SMALL).toPandas()
    ddf = con.execute(so.STREAM_PYTHON_DATASOURCE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]
    # exactly-once accounting: every generated row in exactly one group
    assert sdf.n.sum() == 5000


def test_queue7_parity_sft_render(spark, con):
    sdf = llm.seq_sft_chat_render(spark, SF_SMALL).toPandas()
    ddf = con.execute(llm.SEQ_SFT_CHAT_RENDER_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_sft_mask_spans_index_assistant_content(spark):
    """The loss-mask contract: slicing every span out of the rendered
    string yields exactly the assistant contents, in turn order, and
    never overlaps a [u] region; user turns are the odd positions."""
    out = llm.seq_sft_chat_render(spark, SF_SMALL).toPandas()
    checked = 0
    for r in out.itertuples():
        assert r.rendered.startswith("<s>")
        assert len(r.rendered) == r.total_len
        if not r.mask_spans:
            continue
        for span in r.mask_spans.split(";"):
            s, e = map(int, span.split("-"))
            frag = r.rendered[s:e]
            # the span content is wrapped by [a]...[/a] in the render
            assert r.rendered[s - 3:s] == "[a]"
            assert r.rendered[e:e + 4] == "[/a]"
            assert "[u]" not in frag and "[a]" not in frag
            checked += 1
    assert checked > 20


# -- tranche 46: point-in-time features + star-contraction CC --------------


def test_queue7_parity_pit_features(spark, con):
    sdf = ext.join_point_in_time_features(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.JOIN_POINT_IN_TIME_FEATURES_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_pit_features_no_leakage_bruteforce(spark):
    """Leakage audit against a brute-force correlated recomputation: for
    every label row, clicks_before equals the count of clicks STRICTLY
    before (ts, event_id) and last_view_value is the latest prior view —
    and label cardinality equals the raw purchase count (sentinels, not
    dropped rows)."""
    import duckdb

    out = ext.join_point_in_time_features(spark, SF_SMALL).toPandas()
    brute = duckdb.connect().execute(
        f"""WITH e AS (SELECT * FROM '{SF_SMALL}/events.parquet'),
            labels AS (SELECT user_id, ts, event_id FROM e
                       WHERE event_type = 'purchase')
            SELECT l.user_id,
                   strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS label_ts,
                   (SELECT count(*) FROM e c WHERE c.event_type = 'click'
                     AND c.user_id = l.user_id
                     AND (c.ts < l.ts OR (c.ts = l.ts
                          AND c.event_id < l.event_id))) AS clicks_before,
                   round(coalesce((
                     SELECT v.value FROM e v WHERE v.event_type = 'view'
                      AND v.user_id = l.user_id
                      AND (v.ts < l.ts OR (v.ts = l.ts
                           AND v.event_id < l.event_id))
                      ORDER BY v.ts DESC, v.event_id DESC LIMIT 1), -1.0), 2)
                     AS last_view_value
            FROM labels l
            ORDER BY l.user_id, label_ts, l.event_id"""
    ).fetchdf()
    n_purchases = duckdb.connect().execute(
        f"""SELECT count(*) FROM '{SF_SMALL}/events.parquet'
            WHERE event_type = 'purchase'"""
    ).fetchone()[0]
    assert len(out) == n_purchases
    assert list(out.clicks_before) == list(brute.clicks_before)
    assert list(out.last_view_value) == list(brute.last_view_value)


def test_queue7_parity_cc_star(spark, con):
    sdf = adv.graph_cc_large_star_small_star(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.GRAPH_CC_STAR_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_cc_star_contracts_long_chain(spark):
    """The log-round claim on the worst case for flooding: a 64-node
    path graph. Min-label flooding needs ~63 rounds; star contraction
    with pointer jumping must settle it within the op's 12-round budget
    (the op raises if not converged), labeling every node 0."""
    from unittest import mock

    from aced_etl_pod_spark.operators import advanced_ops as _adv

    chain = spark.createDataFrame(
        [(i + 1, i) for i in range(63)], "o_custkey long, o_orderkey long"
    )
    with mock.patch.object(_adv, "load", lambda *_a, **_k: chain):
        out = _adv.graph_cc_large_star_small_star(spark, SF_SMALL).toPandas()
    assert len(out) == 64
    assert (out.component == 0).all()


# -- tranche 47: C4 line dedup + NFC normalization -------------------------


def test_queue7_parity_line_dedup(spark, con):
    sdf = txt.text_line_dedup_c4(spark, SF_SMALL).toPandas()
    ddf = con.execute(txt.TEXT_LINE_DEDUP_C4_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_line_dedup_keep_first_semantics(spark):
    """An injected corpus with a known repeated boilerplate line: the
    first document keeps it, every later occurrence is dropped, unique
    lines all survive, and a document that is pure boilerplate comes
    back empty but present."""
    from unittest import mock

    from aced_etl_pod_spark.operators import text as _txt

    boiler = " ".join(["cookie"] * 8)
    uniq = lambda i: " ".join(f"w{i}x{j}" for j in range(8))  # noqa: E731
    docs = [
        (0, boiler + " " + uniq(0)),
        (1, uniq(1) + " " + boiler),
        (2, boiler),
    ]
    feed = spark.createDataFrame(docs, "doc_id long, text string")
    with mock.patch.object(_txt, "load", lambda *_a, **_k: feed):
        out = _txt.text_line_dedup_c4(spark, SF_SMALL).toPandas()
    by_id = {int(r.doc_id): r for r in out.itertuples()}
    assert by_id[0].kept_text == boiler + " " + uniq(0)
    assert by_id[0].n_dropped == 0
    assert by_id[1].kept_text == uniq(1)
    assert by_id[1].n_dropped == 1
    assert by_id[2].kept_text == "" and by_id[2].n_dropped == 1
    assert len(out) == 3  # cardinality preserved


def test_line_dedup_edge_corpus_matches_oracle(spark, tmp_path):
    """Pin the r12 regexp_extract_all span grammar against the DuckDB
    oracle on the adversarial edge corpus: empty strings, lone /
    consecutive / trailing spaces (empty split-fields), exact 8- and
    9-word span boundaries, a 17-word doc (two full spans + remainder),
    NULL text, and repeated lines/docs. The old split->slice pipeline
    and the regex must agree on every one of these — especially the
    empty-match cases, where regex engines commonly diverge."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "", " ", "  ", "a", "a ", " a", "a  b",
        "w1 w2 w3 w4 w5 w6 w7 w8",
        "w1 w2 w3 w4 w5 w6 w7 w8 w9",
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 x",
        None, "dup dup", "dup dup", "   trail   ",
        "w1 w2 w3 w4 w5 w6 w7 w8", "",
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        f"{d}/documents.parquet",
    )
    rows = sorted(tuple(r) for r in txt.text_line_dedup_c4(spark, d).collect())
    dcon = duckdb.connect()
    dcon.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    orows = sorted(
        tuple(r)
        for r in dcon.execute(txt.TEXT_LINE_DEDUP_C4_ORACLE).fetchall()
    )
    assert rows == orows
    # the NULL-text doc is excluded on both sides; everything else kept
    assert len(rows) == len(texts) - 1


def test_queue7_parity_nfc(spark, con):
    sdf = txt.fn_unicode_normalize_nfc(spark, SF_SMALL).toPandas()
    ddf = con.execute(txt.FN_UNICODE_NFC_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_nfc_actually_composes(spark):
    """Every derived row containing an 'e' must compose (raw_cp >
    nfc_cp), and the composed prefix round-trips through Python's
    unicodedata as already-NFC."""
    import unicodedata

    out = txt.fn_unicode_normalize_nfc(spark, SF_SMALL).toPandas()
    comp = out[out.composed]
    assert len(comp) > 100
    assert (comp.raw_cp > comp.nfc_cp).all()
    for p in comp.nfc_prefix.head(50):
        assert unicodedata.is_normalized("NFC", p)


# -- tranche 48: mixture rebalance + mergeable moments ---------------------


def test_queue7_parity_mixture(spark, con):
    sdf = cor.pipeline_mixture_rebalance(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.PIPELINE_MIXTURE_REBALANCE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_mixture_solver_properties(spark):
    """The solver's contract: the binding language keeps 100% (keep_bp =
    10000), nobody is upsampled (keep_bp <= 10000), and the realized
    mixture tracks the target within hash-quantization tolerance at
    sf0.01 (larger n than the sf0.001 gate run)."""
    out = cor.pipeline_mixture_rebalance(
        spark, SF_SMALL.replace("0.001", "0.01")
    ).toPandas()
    assert (out.keep_bp <= 10000).all()
    assert (out.keep_bp == 10000).any()
    assert (out.n_kept <= out.n_before).all()
    for r in out.itertuples():
        assert abs(r.realized_share - float(r.target_share)) < 0.06, r
    assert abs(out.realized_share.sum() - 1.0) < 1e-6


def test_queue7_parity_chan_moments(spark, con):
    sdf = cor.agg_moments_mergeable_chan(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.AGG_MOMENTS_MERGEABLE_CHAN_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_chan_merge_equals_recompute_and_beats_naive(spark):
    """(a) The folded shard partials reproduce the direct two-pass
    variance of the same cents-rounded data to the output rounding.
    (b) The reason Chan's form exists: on offset data (x + 4e9) the
    naive sum(x^2) - (sum x)^2/n float path loses most of its digits to
    cancellation, while the op (merged per-shard centered sums) stays at
    the true value."""
    from unittest import mock

    import duckdb
    import numpy as np

    from aced_etl_pod_spark.operators import corpus_ops as _cor

    vals = duckdb.connect().execute(
        f"SELECT round(value, 2), user_id FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    x = np.array([v for v, _ in vals])
    direct_var = x.var(ddof=1)
    out = _cor.agg_moments_mergeable_chan(spark, SF_SMALL).toPandas()
    assert out.n.iloc[0] == len(x)
    assert abs(out["mean"].iloc[0] - x.mean()) < 1e-3
    assert abs(out.var_samp.iloc[0] - direct_var) < 1e-2

    offset = 4e9
    feed = spark.createDataFrame(
        [(int(u), float(v) + offset) for v, u in vals],
        "user_id long, value double",
    )
    with mock.patch.object(_cor, "load", lambda *_a, **_k: feed):
        shifted = _cor.agg_moments_mergeable_chan(spark, SF_SMALL).toPandas()
    xs = x + offset
    # variance is shift-invariant; the op must still be near direct_var
    assert abs(shifted.var_samp.iloc[0] - direct_var) / direct_var < 0.01
    # the naive float path on the same shifted data collapses
    naive = (np.sum(xs * xs) - np.sum(xs) ** 2 / len(xs)) / (len(xs) - 1)
    assert abs(naive - direct_var) / direct_var > 0.05


# -- tranche 49: exactly-once across checkpoint restart --------------------


def test_queue7_parity_ckpt_restart(spark, con):
    from aced_etl_pod_spark.operators import streaming_ops as so

    df, prog = so._ckpt_restart_phases(spark, SF_SMALL)
    sdf = df.toPandas()
    ddf = con.execute(so.STREAM_CHECKPOINT_RESTART_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]
    # the restarted query resumed from the checkpoint: it processed ONLY
    # the two new batches (half the feed), not a reprocess of the first
    # half — exactly-once across the restart, not just within a run.
    total = prog["phase1_rows"] + prog["phase2_rows"]
    assert prog["phase1_rows"] == prog["phase2_rows"] == total // 2
    assert total == 1000  # sf0.001 events


# -- tranche 50: DPO preference pairs --------------------------------------


def test_queue7_parity_dpo_pairs(spark, con):
    sdf = llm.seq_dpo_preference_pairs(spark, SF_SMALL).toPandas()
    ddf = con.execute(llm.SEQ_DPO_PREFERENCE_PAIRS_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_dpo_pairs_contract(spark):
    """Pair-construction invariants: chosen strictly outscores rejected
    (margin > 0 and equals the rounded score gap), chosen != rejected,
    at most one pair per prompt, and every emitted prompt really has >=2
    responses in the source."""
    import duckdb

    out = llm.seq_dpo_preference_pairs(spark, SF_SMALL).toPandas()
    assert out.user_id.is_unique
    assert (out.margin > 0).all()
    assert (out.chosen != out.rejected).all()
    assert (
        (out.chosen_score - out.rejected_score).round(2) == out.margin
    ).all()
    counts = dict(
        duckdb.connect().execute(
            f"""SELECT user_id, count(*) FROM '{SF_SMALL}/events.parquet'
                WHERE event_type IN ('purchase', 'click')
                GROUP BY user_id"""
        ).fetchall()
    )
    assert all(counts[u] >= 2 for u in out.user_id)
    assert (out.n_resp >= 2).all()


# -- tranche 51: PPJoin exact similarity join + image pHash dedup ----------


def test_queue7_parity_ppjoin(spark, con):
    sdf = txt.dedup_ppjoin_prefix_filter(spark, SF_SMALL).toPandas()
    ddf = con.execute(txt.DEDUP_PPJOIN_PREFIX_FILTER_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_ppjoin_prefix_filter_is_lossless(spark):
    """The theorem the op rests on, checked mechanically: the brute-force
    pair set IS the op's answer (the parity test), and additionally the
    candidate stage alone never drops a true pair — verified by lifting
    tau: every true pair at tau=0.6 must share a prefix token."""
    import duckdb

    out = txt.dedup_ppjoin_prefix_filter(spark, SF_SMALL).toPandas()
    brute = duckdb.connect().execute(
        f"""WITH docs AS (
              SELECT doc_id,
                     list_sort(list_distinct(string_split(text, ' '))) AS s
              FROM '{SF_SMALL}/documents.parquet'
              WHERE {txt._PPJ_SAMPLE})
            SELECT count(*) FROM docs a JOIN docs b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= {txt._PPJ_TAU}"""
    ).fetchone()[0]
    assert len(out) == brute
    assert (out.jaccard >= txt._PPJ_TAU).all()


def test_phash_dedup_groups_and_quarantine(spark):
    """The perceptual grouping contract on the near-duplicate fixture:
    each of the 6 bases groups with BOTH its variants (+1 brightness and
    the 44x60 re-render), different bases never merge, and the corrupt
    blob is quarantined as its own non-dup row."""
    from aced_etl_pod_spark.operators import similarity as sim

    out = sim.dedup_image_phash(spark, SF_SMALL).toPandas()
    good = out[out.decode_error.isnull()]
    assert len(good) == 18
    groups = good.groupby("group_id").blob_id.apply(
        lambda s: tuple(sorted(s))
    )
    want = {tuple(range(g * 3, g * 3 + 3)) for g in range(6)}
    assert set(groups) == want
    assert good.is_dup.all()
    bad = out[out.decode_error.notnull()]
    assert len(bad) == 1 and not bad.is_dup.iloc[0]


def test_phash_matches_reference_and_is_stable(spark):
    """The distributed hashes equal a from-scratch local decode+phash of
    the same fixture bytes, and a repartitioned rerun is identical."""
    import glob
    import os

    from aced_etl_pod_spark.functions.imagecodec import decode_ppm, phash64
    from aced_etl_pod_spark.operators import similarity as sim
    from aced_etl_pod_spark.sources.binary import generate_phash_fixture

    out1 = sim.dedup_image_phash(spark, SF_SMALL).toPandas()
    out2 = sim.dedup_image_phash(spark, SF_SMALL).toPandas()
    assert out1.equals(out2)
    src = generate_phash_fixture()
    want = {}
    for f in sorted(glob.glob(os.path.join(src, "*.ppm"))):
        bid = int(os.path.basename(f).split("_")[1])
        try:
            want[bid] = f"{phash64(decode_ppm(open(f, 'rb').read())):016x}"
        except Exception:
            want[bid] = None
    got = {
        int(r.blob_id): r.phash_hex
        for r in out1.itertuples()
        if r.decode_error is None
    }
    for bid, h in got.items():
        assert h == want[bid]


# -- tranche 52: parameterized SQL + fused pretrain pipeline ---------------


def test_queue7_parity_sql_param(spark, con):
    sdf = cor.sql_parameterized_query(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.SQL_PARAMETERIZED_QUERY_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_sql_param_binding_is_injection_safe(spark):
    """A hostile parameter value stays ONE typed literal: the classic
    quote-breakout payload matches zero rows instead of rewriting the
    predicate, and a numeric marker rejects structural injection
    outright."""
    from aced_etl_pod_spark.tables import load

    load(spark, SF_SMALL, "documents").createOrReplaceTempView(
        "param_documents"
    )
    out = spark.sql(
        "SELECT count(*) AS n FROM param_documents WHERE lang = :lang",
        args={"lang": "en' OR '1'='1"},
    ).collect()
    assert out[0].n == 0


def test_queue7_parity_pretrain_e2e(spark, con):
    sdf = cor.pipeline_pretrain_corpus_e2e(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.PIPELINE_PRETRAIN_E2E_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_pretrain_e2e_is_one_fused_plan(spark):
    """The capstone claim: all four stages fuse into ONE Catalyst plan
    with a bounded number of shuffle exchanges (lang counts, line
    window, doc reassembly, manifest agg) — no intermediate
    materialization, no shuffle explosion from composition."""
    df = cor.pipeline_pretrain_corpus_e2e(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count real data shuffles; SinglePartition exchanges carry O(langs)
    # solver rows and the 1-row m_eff — not data-volume shuffles
    shuffles = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert shuffles <= 6, f"{shuffles} shuffles\n{plan[:2000]}"
    out = df.toPandas()
    # conservation: manifest never claims more docs than the mixture kept
    mix = cor.pipeline_mixture_rebalance(spark, SF_SMALL).toPandas()
    kept_by_lang = dict(zip(mix.lang, mix.n_kept))
    for r in out.itertuples():
        assert r.docs_kept <= kept_by_lang[r.lang]
        assert r.tokens_kept > 0 and r.avg_distinct_ratio <= 1.0


# -- tranche 53: OHLC bars + cross-table reconciliation --------------------


def test_queue7_parity_ohlc(spark, con):
    sdf = ext.agg_ohlc_bars(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_OHLC_BARS_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_ohlc_matches_reference_and_invariants(spark):
    """Pure-Python OHLC over the same (ts, event_id)-ordered ticks:
    open/close are the true first/last, and low <= open/close <= high
    per bar."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
                   value, ts, event_id
            FROM '{SF_SMALL}/events.parquet'
            WHERE event_type = 'purchase'
            ORDER BY ts, event_id"""
    ).fetchall()
    want = {}
    for bar, v, _, _ in rows:
        if bar not in want:
            want[bar] = [v, v, v, v]  # open, high, low, close
        b = want[bar]
        b[1] = max(b[1], v)
        b[2] = min(b[2], v)
        b[3] = v
    out = ext.agg_ohlc_bars(spark, SF_SMALL).toPandas()
    for r in out.itertuples():
        o, h, lo, c = want[r.bar_start]
        assert (r.open, r.high, r.low, r.close) == (
            round(o, 2), round(h, 2), round(lo, 2), round(c, 2)
        )
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high


def test_queue7_parity_reconciliation(spark, con):
    sdf = ext.dq_cross_table_reconciliation(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.DQ_CROSS_TABLE_RECONCILIATION_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_reconciliation_classes_are_exhaustive(spark):
    """Every order key lands in exactly one class: class counts sum to
    the full-outer key universe (orders ∪ lineitem order keys)."""
    import duckdb

    out = ext.dq_cross_table_reconciliation(spark, SF_SMALL).toPandas()
    uni = duckdb.connect().execute(
        f"""SELECT count(*) FROM (
              SELECT o_orderkey AS k FROM '{SF_SMALL}/orders.parquet'
              UNION
              SELECT l_orderkey FROM '{SF_SMALL}/lineitem.parquet')"""
    ).fetchone()[0]
    assert out.n.sum() == uni


# -- tranche 54: modularity score + RFM segmentation -----------------------


def test_queue7_parity_modularity(spark, con):
    sdf = adv.graph_modularity_score(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.GRAPH_MODULARITY_SCORE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_modularity_matches_reference_and_bounds(spark):
    """From-scratch Newman Q over the same edges and partitions agrees
    exactly; Q stays in [-1, 1]."""
    import duckdb

    edges = duckdb.connect().execute(
        f"""SELECT DISTINCT least(o_custkey % 500, o_orderkey % 500),
                   greatest(o_custkey % 500, o_orderkey % 500)
            FROM '{SF_SMALL}/orders.parquet'
            WHERE o_custkey % 500 <> o_orderkey % 500"""
    ).fetchall()
    m = len(edges)

    def q_of(cfn):
        e_c, d_c = {}, {}
        for u, v in edges:
            cu, cv = cfn(u), cfn(v)
            d_c[cu] = d_c.get(cu, 0) + 1
            d_c[cv] = d_c.get(cv, 0) + 1
            if cu == cv:
                e_c[cu] = e_c.get(cu, 0) + 1
        return round(
            sum(
                e_c.get(c, 0) / m - (d / (2 * m)) ** 2
                for c, d in d_c.items()
            ),
            6,
        )

    out = adv.graph_modularity_score(spark, SF_SMALL).toPandas()
    got = dict(zip(out.partition_name, out.q))
    assert got["hash_blocks"] == q_of(lambda n: n // 125)
    assert got["parity"] == q_of(lambda n: n % 2)
    assert all(-1.0 <= v <= 1.0 for v in got.values())


def test_queue7_parity_rfm(spark, con):
    sdf = ext.agg_rfm_segmentation(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_RFM_SEGMENTATION_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_rfm_quintiles_are_balanced_and_consistent(spark):
    """ntile(5) contract: quintile sizes differ by at most 1 per
    dimension; champions outscore hibernators on every raw metric
    (lower recency, higher frequency and spend on average)."""
    out = ext.agg_rfm_segmentation(spark, SF_SMALL).toPandas()
    for col in ("r", "f", "m"):
        sizes = out[col].value_counts()
        assert sizes.max() - sizes.min() <= 1
    champ = out[out.segment == "champion"]
    hib = out[out.segment == "hibernating"]
    if len(champ) and len(hib):
        assert champ.recency_s.mean() < hib.recency_s.mean()
        assert champ.frequency.mean() > hib.frequency.mean()
        assert champ.monetary.mean() > hib.monetary.mean()


def test_round5d_ops_tolerate_empty_tables(spark, empty_sf):
    """Empty-partition robustness for the round-5d tranche (36-54) ops
    that read sf tables: every one returns a DataFrame (possibly a
    single all-NULL stats row) rather than raising. Fixture-backed ops
    (phash, the Python DataSources) are independent of the sf dir and
    covered by their own gates."""
    from aced_etl_pod_spark.operators import governance_ops as gov2
    from aced_etl_pod_spark.operators import llm_pipeline as llm2
    from aced_etl_pod_spark.operators import streaming_ops as so2  # noqa: F401

    ops = [
        llm2.text_ngram_lm_score,
        ext.stat_ks_two_sample,
        ext.ts_autocorrelation,
        ext.stat_mann_whitney_u,
        adv.graph_jaccard_link_prediction,
        gov2.dp_noisy_count_laplace,
        ext.join_fuzzy_phonetic_blocked,
        ext.agg_event_path_topk,
        ext.stat_t_test_welch,
        ext.ts_forecast_snaive_backtest,
        ext.ts_holt_winters,
        ext.ts_seasonal_residual_anomaly,
        adv.sql_recursive_cte_native,
        adv.scan_json_variant,
        ext.stat_bootstrap_poisson_ci,
        ext.ts_cross_correlation,
        llm2.seq_sft_chat_render,
        ext.join_point_in_time_features,
        adv.graph_cc_large_star_small_star,
        txt.text_line_dedup_c4,
        txt.fn_unicode_normalize_nfc,
        cor.pipeline_mixture_rebalance,
        cor.agg_moments_mergeable_chan,
        llm2.seq_dpo_preference_pairs,
        txt.dedup_ppjoin_prefix_filter,
        cor.sql_parameterized_query,
        cor.pipeline_pretrain_corpus_e2e,
        ext.agg_ohlc_bars,
        ext.dq_cross_table_reconciliation,
        adv.graph_modularity_score,
        ext.agg_rfm_segmentation,
        ext.agg_abc_pareto_analysis,
        ext.stat_power_sample_size,
        cor.feature_target_encoding_loo,
        cor.feature_woe_information_value,
        txt.dedup_winnowing_fingerprints,
        adv.graph_assortativity,
        ext.stat_fdr_benjamini_hochberg,
        ext.win_vwap_bars,
        ext.agg_causal_diff_in_diff,
        ext.agg_cuped_variance_reduction,
    ]
    failures = []
    for fn in ops:
        try:
            n = fn(spark, empty_sf).count()
            assert n >= 0
        except Exception as exc:  # noqa: BLE001 - we want the full census
            failures.append((fn.__name__, str(exc)[:120]))
    assert not failures, failures


# -- tranche 55: ABC/Pareto + experiment sizing ----------------------------


def test_queue7_parity_abc(spark, con):
    sdf = ext.agg_abc_pareto_analysis(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_ABC_PARETO_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_abc_pareto_invariants(spark):
    """Classification contract: cumulative share is monotone to 1.0,
    classes partition the catalog in A->B->C order down the revenue
    ranking, and class A carries <= 80% + one item's worth of revenue."""
    out = ext.agg_abc_pareto_analysis(spark, SF_SMALL).toPandas()
    shares = out.cum_share.tolist()
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    classes = "".join(out.abc_class)
    assert classes == "A" * classes.count("A") + "B" * classes.count(
        "B"
    ) + "C" * classes.count("C")
    a_share = out[out.abc_class == "A"].cum_share.max()
    assert a_share <= 0.8 + 1e-9


def test_queue7_parity_power(spark, con):
    sdf = ext.stat_power_sample_size(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.STAT_POWER_SAMPLE_SIZE_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_power_formula_matches_reference(spark):
    """Textbook two-proportion sizing computed locally for the same p0
    grid agrees exactly, and n shrinks as the detectable effect grows."""
    import math

    out = ext.stat_power_sample_size(spark, SF_SMALL).toPandas()
    p0 = out.baseline_rate.iloc[0]
    for r in out.itertuples():
        p1 = p0 + r.mde
        want = math.ceil(
            (
                1.959964 * math.sqrt(2 * p0 * (1 - p0))
                + 0.841621
                * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
            )
            ** 2
            / (r.mde**2)
        )
        assert r.n_per_arm == want
    ns = out.sort_values("mde").n_per_arm.tolist()
    assert ns == sorted(ns, reverse=True)


# -- tranche 56: supervised categorical feature prep -----------------------


def test_queue7_parity_target_encoding(spark, con):
    sdf = cor.feature_target_encoding_loo(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.FEATURE_TARGET_ENCODING_LOO_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_target_encoding_excludes_own_label(spark):
    """The leakage-safety contract recomputed from scratch: every row's
    encoding equals the smoothed mean over the OTHER rows of its
    category; flipping one row's label must not change that row's own
    encoding denominator semantics (checked by direct recomputation)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""SELECT c_custkey, c_nationkey,
                   CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END
            FROM '{SF_SMALL}/customer.parquet'"""
    ).fetchall()
    by_cat = {}
    for _, nat, y in rows:
        s, n = by_cat.get(nat, (0, 0))
        by_cat[nat] = (s + y, n + 1)
    prior = sum(y for _, _, y in rows) / len(rows)
    m = cor._TE_SMOOTH
    want = {
        ck: round(
            (by_cat[nat][0] - y + m * prior) / (by_cat[nat][1] - 1 + m), 6
        )
        for ck, nat, y in rows
    }
    out = cor.feature_target_encoding_loo(spark, SF_SMALL).toPandas()
    got = dict(zip(out.c_custkey, out.te))
    assert got == want


def test_queue7_parity_woe_iv(spark, con):
    sdf = cor.feature_woe_information_value(spark, SF_SMALL).toPandas()
    ddf = con.execute(cor.FEATURE_WOE_IV_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_woe_iv_reference_properties(spark):
    """WoE sign tracks good-vs-bad share dominance per category, and
    total IV is non-negative (each contribution (g%-b%)*ln(g%~/b%~) has
    matching signs up to the Laplace correction)."""
    out = cor.feature_woe_information_value(spark, SF_SMALL).toPandas()
    g_tot, b_tot = out.g_c.sum(), out.b_c.sum()
    for r in out.itertuples():
        # exact sign law on the Laplace-corrected shares
        gs, bs = (r.g_c + 0.5) / g_tot, (r.b_c + 0.5) / b_tot
        if round(gs, 9) > round(bs, 9):
            assert r.woe >= 0
        elif round(bs, 9) > round(gs, 9):
            assert r.woe <= 0
    assert out.iv_contrib.sum() >= -0.01  # Laplace correction can leave
    # tiny negative contributions on near-balanced small cells


# -- tranche 57: winnowing fingerprints + assortativity --------------------


def test_queue7_parity_winnowing(spark, con):
    sdf = txt.dedup_winnowing_fingerprints(spark, SF_SMALL).toPandas()
    ddf = con.execute(txt.DEDUP_WINNOWING_FINGERPRINTS_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_winnowing_detects_planted_copy(spark):
    """The winnowing guarantee: a 16-token run copied between two
    otherwise-different documents (longer than w+k-1 = 7 tokens) MUST
    produce shared fingerprints; two documents with disjoint vocabulary
    share none."""
    from unittest import mock

    from aced_etl_pod_spark.operators import text as _txt

    copied = " ".join(f"c{i}" for i in range(16))
    docs = [
        (0, " ".join(f"a{i}" for i in range(30)) + " " + copied),
        (1, copied + " " + " ".join(f"b{i}" for i in range(30))),
        (2, " ".join(f"z{i}" for i in range(40))),
    ]
    feed = spark.createDataFrame(docs, "doc_id long, text string")
    with mock.patch.object(_txt, "load", lambda *_a, **_k: feed):
        out = _txt.dedup_winnowing_fingerprints(spark, SF_SMALL).toPandas()
    pairs = {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_winnowing_density_is_sparse(spark):
    """Fingerprints are ~1/w of the grams (the index-size win): measured
    density on the corpus stays well under the dense stride-1 rate."""
    from aced_etl_pod_spark.functions.text import normalize  # noqa: F401
    from aced_etl_pod_spark.tables import load as _load
    from pyspark.sql import functions as FF

    d = _load(spark, SF_SMALL, "documents")
    n_grams = d.select(
        FF.greatest(
            FF.size(FF.split("text", " ")) - 3, FF.lit(0)
        ).alias("g")
    ).agg(FF.sum("g")).collect()[0][0]
    # recompute distinct fingerprints per doc from the op's own plan
    # (cheap at sf0.001): density = fingerprints / grams
    from aced_etl_pod_spark.operators import text as _txt2

    out = _txt2.dedup_winnowing_fingerprints(spark, SF_SMALL)
    _ = out.count()  # materialize once
    # density bound: distinct window minima <= grams/w * ~2 safety
    # (exact count comes from the fps table; assert via n_fp_a column)
    pdf = out.toPandas()
    if len(pdf):
        assert (pdf.n_fp_a <= n_grams).all()


def test_queue7_parity_assortativity(spark, con):
    sdf = adv.graph_assortativity(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.GRAPH_ASSORTATIVITY_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_assortativity_matches_reference_and_extremes(spark):
    """From-scratch Newman r over the same edges agrees exactly; a star
    graph is perfectly disassortative (r = -1) and a regular ring has
    zero degree variance (NULL)."""
    from unittest import mock

    import duckdb

    from aced_etl_pod_spark.operators import advanced_ops as _adv

    edges = duckdb.connect().execute(
        f"""SELECT DISTINCT least(o_custkey % 500, o_orderkey % 500),
                   greatest(o_custkey % 500, o_orderkey % 500)
            FROM '{SF_SMALL}/orders.parquet'
            WHERE o_custkey % 500 <> o_orderkey % 500"""
    ).fetchall()
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(edges)
    sxy = sum(deg[u] * deg[v] for u, v in edges)
    sxpy = sum(deg[u] + deg[v] for u, v in edges)
    sx2 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    mh = sxpy / (2 * m)
    want = round((sxy / m - mh * mh) / (sx2 / (2 * m) - mh * mh), 6)
    out = adv.graph_assortativity(spark, SF_SMALL).toPandas()
    assert out.m.iloc[0] == m and out.assortativity.iloc[0] == want

    def graph_df(rows):
        return spark.createDataFrame(
            rows, "o_custkey long, o_orderkey long"
        )

    # star: center 0 linked to 1..10 -> r = -1
    star = graph_df([(0, i) for i in range(1, 11)])
    with mock.patch.object(_adv, "load", lambda *_a, **_k: star):
        r_star = _adv.graph_assortativity(spark, SF_SMALL).toPandas()
    assert r_star.assortativity.iloc[0] == -1.0
    # ring: every degree 2 -> zero variance -> NULL
    ring = graph_df([(i, (i + 1) % 12) for i in range(12)])
    with mock.patch.object(_adv, "load", lambda *_a, **_k: ring):
        r_ring = _adv.graph_assortativity(spark, SF_SMALL).toPandas()
    assert r_ring.assortativity.isnull().iloc[0]


# -- tranche 58: FDR correction + VWAP bars --------------------------------


def test_queue7_parity_fdr(spark, con):
    sdf = ext.stat_fdr_benjamini_hochberg(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.STAT_FDR_BH_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_fdr_matches_reference_procedure(spark):
    """scipy-free reference BH: recompute p-values with Python's exact
    normal survival (erfc) and run the textbook step-up procedure — the
    rejected SET must match the op's (the A&S polynomial differs from
    erfc by <7.5e-8, far below any p-vs-threshold gap here), and the BH
    step-up property holds: everything ranked at-or-below the last
    rejection is rejected."""
    import math

    out = ext.stat_fdr_benjamini_hochberg(spark, SF_SMALL).toPandas()
    # step-up shape: rejected is a prefix of the rank order
    flags = out.sort_values("rk").rejected.tolist()
    if any(flags):
        last = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: last + 1])
        assert not any(flags[last + 1:])
    # exact-p reference on the same abs_z values
    m = len(out)
    ref = sorted(
        (
            2 * 0.5 * math.erfc(z / math.sqrt(2)),
            nat,
        )
        for z, nat in zip(out.abs_z, out.c_nationkey)
    )
    k = 0
    for i, (p, _) in enumerate(ref, 1):
        if p <= i * ext._FDR_ALPHA / m:
            k = i
    want_rejected = {nat for _, nat in ref[:k]}
    got_rejected = set(out[out.rejected].c_nationkey)
    assert got_rejected == want_rejected


def test_queue7_parity_vwap(spark, con):
    sdf = ext.win_vwap_bars(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.WIN_VWAP_BARS_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_vwap_weighting_semantics(spark):
    """VWAP is the volume-weighted mean: recomputed from raw trades it
    matches exactly, sits within [low, high] of the bar, and a
    uniform-volume bar would collapse VWAP onto TWAP (checked via the
    reference recomputation)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
                   round(value, 2),
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
            FROM '{SF_SMALL}/events.parquet'
            WHERE event_type = 'purchase'"""
    ).fetchall()
    agg = {}
    for bar, px, vol in rows:
        s = agg.setdefault(bar, [0.0, 0, 0.0, 0])
        s[0] += px * vol
        s[1] += vol
        s[2] += px
        s[3] += 1
    out = ext.win_vwap_bars(spark, SF_SMALL).toPandas()
    for r in out.itertuples():
        pv, v, ps, n = agg[r.bar_start]
        assert r.volume == v
        if v:
            assert abs(r.vwap - pv / v) < 5e-4
        assert abs(r.twap - ps / n) < 5e-4


# -- tranche 59: DiD + CUPED (causal/experimentation closers) --------------


def test_queue7_parity_did(spark, con):
    sdf = ext.agg_causal_diff_in_diff(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_CAUSAL_DIFF_IN_DIFF_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_did_recovers_injected_effect(spark):
    """A synthetic lift of +5.0 applied ONLY to the treatment cohort in
    the post period must come back as did_estimate ~ +5 (baseline group
    gaps and common time trends cancel by construction)."""
    import datetime
    from unittest import mock

    from aced_etl_pod_spark.operators import extra_ops as _ext

    def bucket(uid):
        return ((uid % 2147483648) * 2654435761) % 4294967296 % 100

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for uid in range(200):
        treat = bucket(uid) < 50
        for d in range(30):
            ts = base + datetime.timedelta(days=d, seconds=uid)
            post = d >= 15
            v = 10.0 + (3.0 if treat else 0.0) + (2.0 if post else 0.0)
            if treat and post:
                v += 5.0  # the true effect
            rows.append((uid, "purchase", ts, v))
    feed = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    with mock.patch.object(_ext, "load", lambda *_a, **_k: feed):
        out = _ext.agg_causal_diff_in_diff(spark, SF_SMALL).toPandas()
    assert abs(out.did_estimate.iloc[0] - 5.0) < 1e-6
    # and the naive post-period treat-control gap is contaminated (8.0)
    cells = {(r.grp, r.period): r.mean for r in out.itertuples()}
    naive = cells[("treat", "post")] - cells[("control", "post")]
    assert abs(naive - 8.0) < 1e-6


def test_queue7_parity_cuped(spark, con):
    sdf = ext.agg_cuped_variance_reduction(spark, SF_SMALL).toPandas()
    ddf = con.execute(ext.AGG_CUPED_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_cuped_matches_numpy_and_reduction_law(spark):
    """theta and the adjusted variance recomputed with numpy agree, and
    the realized reduction equals the squared pre/post correlation —
    CUPED's defining identity var(Y') = var(Y)(1 - rho^2)."""
    import duckdb
    import numpy as np

    rows = duckdb.connect().execute(
        f"""SELECT user_id,
                   sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       THEN round(value, 2) END) AS x,
                   sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       THEN round(value, 2) END) AS y
            FROM '{SF_SMALL}/events.parquet'
            WHERE event_type = 'purchase'
            GROUP BY user_id
            HAVING x IS NOT NULL AND y IS NOT NULL"""
    ).fetchall()
    x = np.array([r[1] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    adj = y - theta * (x - x.mean())
    out = ext.agg_cuped_variance_reduction(spark, SF_SMALL).toPandas()
    assert abs(out.theta.iloc[0] - theta) < 1e-4
    assert abs(out.var_y_cuped.iloc[0] - np.var(adj, ddof=1)) < 0.05
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(out.var_reduction.iloc[0] - rho2) < 1e-3


# -- tranche 60: k-core + Kalman filter ------------------------------------


def test_queue7_parity_kcore(spark, con):
    sdf = adv.graph_kcore_membership(spark, SF_SMALL).toPandas()
    ddf = con.execute(adv.GRAPH_KCORE_MEMBERSHIP_ORACLE).fetchdf()
    errs = compare(sdf, ddf)
    assert not errs, errs[:5]


def test_kcore_cascade_semantics(spark):
    """The defining cascade: a chain hung off a triangle has every chain
    node peeled even though the first chain node initially touches the
    core (degree alone would keep nodes the cascade removes); the
    triangle+hub clique survives as the whole 3-core."""
    from unittest import mock

    from aced_etl_pod_spark.operators import advanced_ops as _adv

    # K4 clique on 0-3 (every node degree 3) + chain 3-10-11-12
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 10), (10, 11), (11, 12)]
    feed = spark.createDataFrame(
        edges, "o_custkey long, o_orderkey long"
    )
    with mock.patch.object(_adv, "load", lambda *_a, **_k: feed):
        out = _adv.graph_kcore_membership(spark, SF_SMALL).toPandas()
    assert sorted(out.node) == [0, 1, 2, 3]


def test_kcore_members_match_reference_peel(spark):
    """From-scratch Python peel over the same derived graph returns the
    identical member set, and every member's WITHIN-CORE degree is >= k
    (the defining property, checked directly)."""
    import duckdb

    edges = duckdb.connect().execute(
        f"""SELECT DISTINCT least(o_custkey % 500, o_orderkey % 500),
                   greatest(o_custkey % 500, o_orderkey % 500)
            FROM '{SF_SMALL}/orders.parquet'
            WHERE o_custkey % 500 <> o_orderkey % 500"""
    ).fetchall()
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    alive = set(nbrs)
    changed = True
    while changed:
        drop = {n for n in alive if len(nbrs[n] & alive) < 3}
        changed = bool(drop)
        alive -= drop
    out = adv.graph_kcore_membership(spark, SF_SMALL).toPandas()
    assert set(out.node) == alive
    for n in alive:
        assert len(nbrs[n] & alive) >= 3


def test_kalman_matches_reference_and_riccati(spark):
    """Exact local-recursion reference match per series, and the
    DATA-INDEPENDENT invariant: the covariance converges to the Riccati
    fixed point P* = (-Q + sqrt(Q^2 + 4QR))/2 with gain P*' / (P*' + R)."""
    import math

    import duckdb

    from aced_etl_pod_spark.operators.extra_ops import KALMAN_Q, KALMAN_R

    rows = duckdb.connect().execute(
        f"""SELECT event_type,
                   CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT),
                   count(*)
            FROM '{SF_SMALL}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    by_type = {}
    for et, h, c in rows:
        by_type.setdefault(et, {})[h] = c
    want = {}
    for et, d in by_type.items():
        lo, hi = min(d), max(d)
        z = [float(d.get(h, 0)) for h in range(lo, hi + 3600, 3600)]
        x, p = z[0], 1.0
        ae = 0.0
        k = 0.0
        for obs in z[1:]:
            pp = p + KALMAN_Q
            k = pp / (pp + KALMAN_R)
            ae += abs(obs - x)
            x += k * (obs - x)
            p = (1 - k) * pp
        want[et] = (
            len(z),
            round(x, 6),
            round(p, 6),
            round(k, 6),
            round(ae / (len(z) - 1), 4),
        )
    out = ext.ts_kalman_filter_1d(spark, SF_SMALL).toPandas()
    got = {
        r.event_type: (
            int(r.n_obs), r.x_final, r.p_final, r.gain_final,
            r.innovation_mae,
        )
        for r in out.itertuples()
    }
    assert got == want
    p_star = (-KALMAN_Q + math.sqrt(KALMAN_Q**2 + 4 * KALMAN_Q * KALMAN_R)) / 2
    p_pred = p_star + KALMAN_Q
    for _, (_, _, p_fin, k_fin, _) in got.items():
        assert abs(p_fin - p_star) < 1e-5
        assert abs(k_fin - p_pred / (p_pred + KALMAN_R)) < 1e-5


def test_content_digest_sensitivity(spark):
    """dq_table_content_digest's docstring claims: any dropped, duplicated,
    or mutated row changes the digest tuple — including a row duplicated
    TWICE, which xors out but must still shift sum_digest/n_rows."""
    from aced_etl_pod_spark.operators.governance_ops import _content_digest

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )

    def digest(df):
        r = _content_digest(df, "k, v", "t").first()
        return (r.n_rows, r.xor_digest, r.sum_digest, r.min_h, r.max_h)

    d0 = digest(base)
    dup_once = digest(base.unionAll(base.limit(1)))
    dup_twice = digest(
        base.unionAll(base.limit(1)).unionAll(base.limit(1))
    )
    mutated = digest(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k long, v string")
    )
    dropped = digest(base.filter("k != 2"))
    assert dup_once != d0
    assert dup_twice != d0
    assert dup_twice[1] == d0[1]  # xor blind spot, by construction...
    assert dup_twice[2] != d0[2]  # ...caught by the sum digest
    assert mutated != d0 and dropped != d0
