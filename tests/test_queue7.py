"""Round-7 registration queue (geo-spatial + governance families, plus
the later tranches added below as they land): the same differential gate
these ops will face when the driver window rotates to them, plus the
property each one's blocking / privacy guarantee promises."""

from __future__ import annotations

import pytest

from aced_etl_pod_spark.oracle import compare, duck_con
from aced_etl_pod_spark.operators import geo_ops as geo
from aced_etl_pod_spark.operators import governance_ops as gov
from tests.conftest import SF_SMALL

QUEUE = [
    (geo.join_geo_gridded_radius, geo.JOIN_GEO_GRIDDED_RADIUS_ORACLE),
    (geo.agg_geo_grid_density, geo.AGG_GEO_GRID_DENSITY_ORACLE),
    (gov.dq_k_anonymity, gov.DQ_K_ANONYMITY_ORACLE),
    (gov.fn_pseudonymize_consistent, gov.FN_PSEUDONYMIZE_CONSISTENT_ORACLE),
    (gov.fn_ip_cidr_classify, gov.FN_IP_CIDR_CLASSIFY_ORACLE),
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
