"""Data-governance / privacy operators (round-7 registration queue —
finished and locally oracle-verified here; registered when the driver
window next rotates).

The warehouse tier the reference serves is a *governed* one (its whole
job surface is project-scoped authz — etl-job/fhir_import_export.py's
arborist checks, re-expressed in plans/authz.py). This module adds the
data-side governance primitives that sit next to that access-side story:

* **k-anonymity audit** (``dq_k_anonymity``): group sizes over a
  quasi-identifier tuple, flagging equivalence classes below k — the
  re-identification-risk gate run before a governed export. One
  partial-agg pass, O(classes) output.
* **consistent pseudonymization** (``fn_pseudonymize_consistent``):
  key-coherent tokenization — the same subject always maps to the same
  opaque token, so JOINS STILL WORK across pseudonymized tables. Uses the
  house portable multiplicative hash so both engines derive identical
  tokens; the op proves join-coherence by aggregating orders through the
  pseudonym instead of the raw key.
* **CIDR classification** (``fn_ip_cidr_classify``): longest-prefix-match
  of IPv4 addresses against a broadcast CIDR policy table — the log-
  enrichment / egress-audit primitive. Prefix match is pure integer
  division (each CIDR row carries its 2^(32-plen) divisor), so no engine-
  specific shift semantics are involved and the op full-hash-checks.

Scale posture: all three are one-scan shapes — a partial agg (k-anon), a
key-local projection + equi-join (pseudonymize), and a broadcast-dim
theta-light join whose dim is O(policy rows) (CIDR). Nothing here
shuffles more than its group keys at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aced_etl_pod_spark.operators.util import (
    finite,
    finite_sql,
    money,
    money_sql,
    wsum,
    wsum_sql,
    zn,
    zn_sql,
)
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load

_K = 5
_BAL_BUCKET = 2000.0

DQ_K_ANONYMITY_ORACLE = f"""
    SELECT c_mktsegment,
           c_nationkey,
           CAST(floor((CASE WHEN abs(CAST(c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c_acctbal AS DOUBLE) END) / {_BAL_BUCKET}) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS n,
           count(*) >= {_K} AS k_anonymous
    FROM customer
    GROUP BY 1, 2, 3
"""


@op("dq_k_anonymity", oracle=DQ_K_ANONYMITY_ORACLE, tags=('governance', 'extra'))
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class census over the quasi-identifier tuple
    (segment, nation, balance bucket): class size + the k>=5 flag. The
    flag compares an exact integer count, so it cannot split across
    engines. At 100 TB this is one map-side-combining aggregation whose
    output is O(distinct QI tuples); the suppression step a publisher
    would run next is a broadcast semi-join of the flagged classes back
    onto the rows."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.floor(finite(F.col("c_acctbal")) / _BAL_BUCKET).alias("bal_bucket"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "bal_bucket",
            "n",
            (F.col("n") >= _K).alias("k_anonymous"),
        )
        .orderBy("c_mktsegment", "c_nationkey", "bal_bucket")
    )


_PSEUDO = "(c_custkey * 2654435761) % 4294967296"

FN_PSEUDONYMIZE_CONSISTENT_ORACLE = f"""
    WITH p AS (
      SELECT c_custkey,
             'u' || CAST({_PSEUDO} AS VARCHAR) AS pseudonym,
             c_mktsegment
      FROM customer
    )
    SELECT p.pseudonym,
           p.c_mktsegment,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           {money_sql("coalesce(sum(" + finite_sql("o.o_totalprice") + "), 0)", 2, 6)} AS total_spend
    FROM p LEFT JOIN orders o ON o.o_custkey = p.c_custkey
    GROUP BY 1, 2
"""


@op("fn_pseudonymize_consistent", oracle=FN_PSEUDONYMIZE_CONSISTENT_ORACLE, tags=('governance', 'extra'))
def fn_pseudonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subject tokenization that preserves join coherence:
    customers get an opaque `uNNN` token from the portable hash, orders
    are aggregated THROUGH the token (left join keeps order-less
    subjects at zero). Because the hash is keyed arithmetic, re-runs and
    other tables derive the same token — referential integrity survives
    pseudonymization, which is the whole point of consistent (vs salted-
    random) tokens. Production hardening note (documented, not simulated):
    swap the multiplicative hash for a keyed HMAC kept in a secret store;
    the plan shape — key-local projection, no extra shuffle — is
    unchanged."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.lit("u"), F.expr(_PSEUDO).cast("string")).alias("pseudonym"),
        "c_mktsegment",
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("pseudonym", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            # finite() on the SUMMAND: extreme values make the parallel
            # fold order visible past money()'s passthrough bound
            money(
                F.coalesce(F.sum(finite(F.col("o_totalprice"))), F.lit(0.0)),
                2,
                6,
            ).alias("total_spend"),
        )
        .orderBy("pseudonym")
    )


# (label, network-as-uint32, prefix length, 2^(32-plen) divisor).
# Deliberately overlapping so longest-prefix-match is exercised:
# private-10 ⊂ low-half, private-192-168 ⊂ high-quarter, multicast ⊂
# high-quarter, private-172-16 ⊂ high-half.
_CIDRS = (
    ("private-10", 167772160, 8, 16777216),
    ("private-172-16", 2886729728, 12, 1048576),
    ("private-192-168", 3232235520, 16, 65536),
    ("multicast", 3758096384, 4, 268435456),
    ("high-quarter", 3221225472, 2, 1073741824),
    ("low-half", 0, 1, 2147483648),
    ("high-half", 2147483648, 1, 2147483648),
)

_IP = "(event_id * 2654435761) % 4294967296"

_CIDR_VALUES = ", ".join(f"('{l}', {n}, {p}, {d})" for l, n, p, d in _CIDRS)

FN_IP_CIDR_CLASSIFY_ORACLE = f"""
    WITH cidr(label, net, plen, bucket_div) AS (VALUES {_CIDR_VALUES}),
    ips AS (SELECT {_IP} AS ip, user_id FROM events),
    matched AS (
      SELECT ips.ip, ips.user_id, cidr.label, cidr.plen,
             row_number() OVER (
               PARTITION BY ips.ip, ips.user_id
               ORDER BY cidr.plen DESC, cidr.label
             ) AS rk
      FROM ips JOIN cidr ON ips.ip // cidr.bucket_div = cidr.net // cidr.bucket_div
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT ip) AS BIGINT) AS n_ips,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM matched WHERE rk = 1
    GROUP BY label
"""


@op("fn_ip_cidr_classify", oracle=FN_IP_CIDR_CLASSIFY_ORACLE, tags=('governance', 'extra'))
def fn_ip_cidr_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix CIDR classification of (synthetic, hash-derived)
    event IPv4 addresses against a 7-row policy table. The policy rows
    carry their own 2^(32-plen) divisor, so containment is the portable
    integer test `ip div d == net div d` — no shift operators, no
    signedness edge. The policy side is broadcast (O(rules)); each event
    matches every covering rule and the most specific wins via
    max(struct(plen, label)) — the partial-aggregating argmax
    (SCALE.md's argmin-not-window rule: each task reduces its matches
    map-side; a per-ip row_number window would exchange and sort the
    whole match set). Same-length rules are disjoint by construction, so
    plen ties cannot occur and the struct-max winner equals the
    (plen DESC, label ASC) window the oracle states. Real-world swap-in:
    the same plan serves a threat-intel or egress-allowlist table of a
    few thousand rules."""
    e = load(spark, sf_dir, "events").select(
        F.expr(_IP).alias("ip"), "user_id"
    )
    cidr = spark.createDataFrame(
        list(_CIDRS), "label string, net long, plen int, bucket_div long"
    )
    m = e.join(
        F.broadcast(cidr),
        F.expr("ip div bucket_div") == F.expr("net div bucket_div"),
    )
    best = m.groupBy("ip", "user_id").agg(
        F.max(F.struct("plen", "label")).alias("b")
    ).select("ip", "user_id", F.col("b.label").alias("label"))
    return (
        best.groupBy("label")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("ip").alias("n_ips"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# dq_freshness_slo (round-7 registration queue)
# ---------------------------------------------------------------------------

DQ_FRESHNESS_SLO_ORACLE = """
    WITH now_ref AS (SELECT max(ts) AS now_ts FROM events),
    -- floor(epoch(.)) per timestamp BEFORE differencing: Spark's
    -- unix_timestamp truncates each timestamp to whole seconds, DuckDB's
    -- epoch(a - b) keeps the microsecond fraction (same divergence class
    -- as the interval-overlap fix, commit 6fd3690).
    gaps AS (
      SELECT event_type, ts,
             floor(epoch(ts)) - floor(epoch(lag(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id))) AS gap_s
      FROM events
    ),
    per_src AS (
      SELECT event_type,
             max(ts) AS last_ts,
             avg(gap_s) AS avg_gap_s,
             count(*) AS n
      FROM gaps GROUP BY event_type
    )
    SELECT p.event_type,
           strftime(p.last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(p.n AS BIGINT) AS n_events,
           (CASE WHEN abs(CAST(p.avg_gap_s / 60.0 AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST(p.avg_gap_s / 60.0 AS DOUBLE) AS DECIMAL(18,9)), 2) AS DOUBLE) ELSE CAST(p.avg_gap_s / 60.0 AS DOUBLE) END)
             AS avg_gap_min,
           (CASE WHEN abs(CAST((floor(epoch(r.now_ts)) - floor(epoch(p.last_ts)))
                / 60.0 AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST((floor(epoch(r.now_ts)) - floor(epoch(p.last_ts)))
                / 60.0 AS DOUBLE) AS DECIMAL(18,9)), 2) AS DOUBLE) ELSE CAST((floor(epoch(r.now_ts)) - floor(epoch(p.last_ts)))
                / 60.0 AS DOUBLE) END) AS lag_min,
           round(CAST((floor(epoch(r.now_ts)) - floor(epoch(p.last_ts))) / 60.0
                 AS DECIMAL(18,9)), 2)
             > 3 * round(CAST(p.avg_gap_s / 60.0 AS DECIMAL(18,9)), 2)
             AS stale
    FROM per_src p CROSS JOIN now_ref r
"""


@op("dq_freshness_slo", oracle=DQ_FRESHNESS_SLO_ORACLE, tags=('governance', 'extra'))
def dq_freshness_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLO audit per source: last arrival, expected cadence
    (mean inter-arrival gap from a lag window), current lag vs the
    corpus-wide reference 'now' (max ts — deterministic, so the oracle
    can run it; production would inject wall clock), and a stale flag
    when the lag exceeds 3x the learned cadence — both sides of the
    comparison ROUNDED first so the boolean can't split engines. One
    window pass + one group agg + a 1-row broadcast of 'now'. This is
    the monitor a pipeline scheduler polls — O(sources) output at any
    event volume."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        ),
    )
    per_src = gaps.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.avg("gap_s").alias("avg_gap_s"),
        F.count("*").alias("n"),
    )
    now_ref = e.agg(F.max("ts").alias("now_ts"))
    gm = "round(CAST(avg_gap_s / 60.0 AS DECIMAL(18,9)), 2)"
    lm = "round(CAST((unix_timestamp(now_ts) - unix_timestamp(last_ts)) / 60.0 AS DECIMAL(18,9)), 2)"
    return (
        per_src.crossJoin(F.broadcast(now_ref))
        .select(
            "event_type",
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            F.col("n").cast("long").alias("n_events"),
            F.expr(f"CAST({gm} AS DOUBLE)").alias("avg_gap_min"),
            F.expr(f"CAST({lm} AS DOUBLE)").alias("lag_min"),
            F.expr(f"{lm} > 3 * {gm}").alias("stale"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dq_schema_contract (round-7 registration queue)
# ---------------------------------------------------------------------------

# Deterministic bad rows spliced into the scan so every violation class
# has members (the raw table is synthetically clean).
_BAD_PROPS = (
    (-1, "not json at all"),
    (-2, '{"other": 5}'),
    (-3, '{"k": "text"}'),
    (-4, '{"k": 999}'),
)
_BAD_VALUES = ", ".join(f"({i}, '{p}')" for i, p in _BAD_PROPS)

DQ_SCHEMA_CONTRACT_ORACLE = f"""
    WITH raw AS (
      SELECT event_id, props FROM events
      UNION ALL
      SELECT * FROM (VALUES {_BAD_VALUES}) AS bad(event_id, props)
    ),
    checked AS (
      SELECT event_id,
             CASE
               WHEN try_cast(props AS JSON) IS NULL THEN 'unparseable'
               WHEN json_extract(props, '$.k') IS NULL THEN 'missing_key'
               WHEN try_cast(json_extract_string(props, '$.k') AS BIGINT)
                    IS NULL THEN 'wrong_type'
               WHEN try_cast(json_extract_string(props, '$.k') AS BIGINT)
                    NOT BETWEEN 0 AND 99 THEN 'out_of_range'
               ELSE 'ok'
             END AS klass
      FROM raw
    )
    SELECT klass, CAST(count(*) AS BIGINT) AS n,
           CAST(min(event_id) AS BIGINT) AS first_example
    FROM checked GROUP BY klass
"""


@op("dq_schema_contract", oracle=DQ_SCHEMA_CONTRACT_ORACLE, tags=('governance', 'extra'))
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON schema-contract audit over a semi-structured column: every
    row is classified into exactly one violation class (unparseable /
    missing key / wrong type / out of range / ok) with a count and a
    smallest example id per class — the pre-ingest contract gate for an
    event stream. Four deterministic bad rows are spliced in (the
    synthetic table is clean) so every class is exercised on both
    engines. Spark side uses get_json_object + try casts, DuckDB its
    JSON extension — different parsers, same contract, which is the
    point: the CONTRACT, not the parser, defines validity. One
    conditional projection + one partial agg; O(classes) output."""
    e = load(spark, sf_dir, "events").select("event_id", "props")
    bad = spark.createDataFrame(list(_BAD_PROPS), "event_id long, props string")
    raw = e.unionAll(bad)
    k_str = "get_json_object(props, '$.k')"
    klass = F.expr(
        f"""CASE
          WHEN get_json_object(props, '$') IS NULL THEN 'unparseable'
          WHEN {k_str} IS NULL THEN 'missing_key'
          WHEN try_cast({k_str} AS BIGINT) IS NULL THEN 'wrong_type'
          WHEN try_cast({k_str} AS BIGINT) NOT BETWEEN 0 AND 99
            THEN 'out_of_range'
          ELSE 'ok'
        END"""
    )
    return (
        raw.select("event_id", klass.alias("klass"))
        .groupBy("klass")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").cast("long").alias("first_example"),
        )
        .orderBy("klass")
    )


# ---------------------------------------------------------------------------
# dq_k_anonymity_generalize (round-7 registration queue)
# ---------------------------------------------------------------------------

_GEN_LEVELS = (1000, 2000, 4000, 8000, 16000, 1000000000)

DQ_K_ANONYMITY_GENERALIZE_ORACLE = f"""
    WITH levels(width) AS (VALUES {', '.join(f'({w})' for w in _GEN_LEVELS)}),
    classes AS (
      SELECT l.width, c.c_mktsegment,
             CAST(floor(((CASE WHEN abs(CAST(c.c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c.c_acctbal AS DOUBLE) END) + 1000) / l.width) AS BIGINT)
               AS bal_bucket,
             count(*) AS n
      FROM customer c CROSS JOIN levels l
      GROUP BY 1, 2, 3
    ),
    level_ok AS (
      SELECT width, min(n) AS min_class FROM classes GROUP BY width
    ),
    chosen AS (
      SELECT min(width) AS width FROM level_ok WHERE min_class >= {_K}
    )
    SELECT c.width AS chosen_width, c.c_mktsegment, c.bal_bucket,
           CAST(c.n AS BIGINT) AS n
    FROM classes c JOIN chosen ON c.width = chosen.width
"""


@op("dq_k_anonymity_generalize", oracle=DQ_K_ANONYMITY_GENERALIZE_ORACLE, tags=('governance', 'extra'))
def dq_k_anonymity_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remediation half of the k-anonymity story (dq_k_anonymity
    detects; this generalizes): balance buckets widen along a fixed
    generalization ladder (1k, 2k, 4k, 8k, 16k) and the SMALLEST width
    whose every equivalence class reaches k >= 5 is chosen — coarsen as
    little as possible, but enough; the terminal 1e9 level is full
    suppression of the numeric attribute (one bucket), the top every
    generalization hierarchy must have so a valid level always exists
    (balances are shifted by +1000 first so the domain is non-negative —
    otherwise the sign split leaves two terminal buckets and a sparse
    negative class can hold the whole ladder hostage). All ladder levels are evaluated in
    ONE pass (cross join with the 5-row level table, then one partial
    agg), so level selection is set-based and fully oracle-checkable —
    no driver-side trial loop, which is also what makes it cheap at
    100 TB: the ladder evaluation costs one aggregation regardless of
    how many levels it considers. Output = the chosen width's class
    table (the publishable generalized view)."""
    c = load(spark, sf_dir, "customer")
    levels = spark.createDataFrame([(w,) for w in _GEN_LEVELS], "width int")
    classes = (
        c.crossJoin(F.broadcast(levels))
        .groupBy(
            "width",
            "c_mktsegment",
            F.expr(
                "CAST(floor(((CASE WHEN abs(CAST(c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c_acctbal AS DOUBLE) END) + 1000) / width) AS BIGINT)"
            ).alias("bal_bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    level_ok = classes.groupBy("width").agg(F.min("n").alias("min_class"))
    chosen = level_ok.filter(F.col("min_class") >= _K).agg(
        F.min("width").alias("cw")
    )
    return (
        classes.join(F.broadcast(chosen), classes.width == F.col("cw"))
        .select(
            F.col("width").alias("chosen_width"),
            "c_mktsegment",
            "bal_bucket",
            F.col("n").cast("long").alias("n"),
        )
        .orderBy("c_mktsegment", "bal_bucket")
    )


# ---------------------------------------------------------------------------
# dp_noisy_count_laplace (round-7+ registration queue, tranche 38)
# ---------------------------------------------------------------------------

_DP_EPS = 1.0
_DP_TYPE_CODE = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
    " WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 ELSE 5 END"
)

DP_NOISY_COUNT_LAPLACE_ORACLE = f"""
    WITH grp AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             {_DP_TYPE_CODE} AS code,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2, 3
    ), keyed AS (
      SELECT event_type, day, c,
             ((CAST(floor(epoch(day)) AS BIGINT) + code) * 2654435761)
               % 4294967296 AS h
      FROM grp
    ), noise AS (
      SELECT event_type, day, c,
             (h + 0.5) / 4294967296.0 AS u
      FROM keyed
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           (CASE WHEN abs(CAST(c + (-1.0 / {_DP_EPS})
                * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(c + (-1.0 / {_DP_EPS})
                * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)) AS DOUBLE) AS DECIMAL(18,6)), 4) AS DOUBLE) ELSE CAST(c + (-1.0 / {_DP_EPS})
                * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)) AS DOUBLE) END) AS noisy_count,
           {_DP_EPS} AS epsilon
    FROM noise
    ORDER BY event_type, day
"""


@op("dp_noisy_count_laplace", oracle=DP_NOISY_COUNT_LAPLACE_ORACLE, tags=('governance', 'extra'))
def dp_noisy_count_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private count release (Laplace mechanism): daily
    per-event-type counts published with Laplace(Δf/ε) noise, Δf = 1,
    ε = 1 — the governed-export counterpart of dq_k_anonymity: where
    k-anonymity generalizes rows, DP noise protects AGGREGATES against
    differencing attacks. The release carries only (group, noisy_count,
    ε); the true count never leaves the plan.

    The noise is SEEDED, not sampled: u = (knuth_hash(group_key)+0.5)/2³²
    is a deterministic uniform in (0,1) and the inverse-CDF transform
    -b·sign(u-½)·ln(1-2|u-½|) maps it to a Laplace draw — identical on
    both engines, re-run-stable, and auditable (the privacy accountant
    can replay the exact release). A production deployment would swap the
    public group key for a secret per-release seed; the mechanism,
    sensitivity and accounting are unchanged. Plan: one partial agg to
    O(groups), then pure projection — no second shuffle, no RNG state."""
    e = load(spark, sf_dir, "events")
    grp = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").alias("c"))
    keyed = grp.withColumn("code", F.expr(_DP_TYPE_CODE)).withColumn(
        "h",
        (
            (
                F.floor(
                    F.unix_timestamp(F.col("day").cast("timestamp"))
                ).cast("long")
                + F.col("code")
            )
            * F.lit(2654435761)
        )
        % F.lit(4294967296),
    )
    u = (F.col("h") + 0.5) / 4294967296.0
    lap = (
        F.lit(-1.0 / _DP_EPS)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return (
        keyed.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round((F.col("c") + lap).cast("decimal(18,6)"), 4)
            .cast("double")
            .alias("noisy_count"),
            F.lit(_DP_EPS).alias("epsilon"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# dq_observe_metrics (round-6 session-5; windowed in rotation round 9)
# ---------------------------------------------------------------------------

DQ_OBSERVE_METRICS_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           -- engine side coalesces the nullable aggregates to sentinels
           -- (Observation.get can't carry NULL rows on empty scans);
           -- mirror them here so both sides agree on degenerate input
           -- (empty table, or every l_quantity non-finite/extreme)
           CAST(round(coalesce(sum((CASE WHEN abs(CAST(l_quantity AS DOUBLE)) < 1e12 THEN CAST(l_quantity AS DOUBLE) END)), 0), 0) AS BIGINT) AS sum_qty,
           CAST(count(CASE WHEN l_quantity > 25 THEN 1 END) AS BIGINT)
             AS n_gt25,
           CAST(coalesce(min(l_orderkey), -1) AS BIGINT) AS min_ok,
           CAST(coalesce(max(l_orderkey), -1) AS BIGINT) AS max_ok
    FROM lineitem
"""


@op("dq_observe_metrics", oracle=DQ_OBSERVE_METRICS_ORACLE, tags=('governance', 'extra'))
def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit metrics via ``df.observe`` (Spark's Observation API): the
    business query (revenue by return flag over high-quantity lineitems)
    and the pre-filter audit profile (row count, quantity total, filter
    selectivity, key range) are computed in the SAME pass — the
    CollectMetrics node rides the scan, JVM-side, so the audit costs zero
    extra reads. At 100 TB this halves every audited pipeline stage vs
    the run-then-re-aggregate pattern (dq_expectation_checks is the
    one-scan CONDITIONAL-aggregate flavor; this is the one-scan
    piggyback-on-a-real-query flavor — together they cover both audit
    shapes). Streaming twin: the same Observation attaches to a
    writeStream and reports per-micro-batch.

    The observed values are deterministic aggregates (counts, an exact
    integral sum, min/max), so the op full-hash-checks: the oracle
    recomputes the profile directly. l_quantity is integral-valued, so
    sum-then-BIGINT is exact on both engines.
    """
    from pyspark.sql import Observation

    obs = Observation()
    li = load(spark, sf_dir, "lineitem")
    # NULL-valued metrics (sum/min/max over ZERO rows — the empty-daily-
    # partition case) crash Observation.get's row conversion, so the
    # nullable aggregates carry explicit sentinels; on any non-empty
    # table the coalesce never fires and the oracle is unaffected
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.round(F.sum(finite(F.col("l_quantity"))), 0).cast("long"), F.lit(0)).alias("sum_qty"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_gt25"),
        F.coalesce(F.min("l_orderkey"), F.lit(-1)).alias("min_ok"),
        F.coalesce(F.max("l_orderkey"), F.lit(-1)).alias("max_ok"),
    )
    # the action that populates the observation IS the business query
    (
        observed.filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("revenue"))
        .collect()
    )
    try:
        m = obs.get
    except Exception:
        # Spark 4.1 edge: over a ZERO-row scan the CollectMetrics row fails
        # JVM→Python conversion (assertion in toPyRow). Fall back to the
        # run-then-re-aggregate pattern — the one case where the piggyback
        # pass isn't available, and re-scanning an empty table is free.
        row = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.round(F.sum(finite(F.col("l_quantity"))), 0).cast("long"), F.lit(0)).alias(
                "sum_qty"
            ),
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_gt25"),
            F.coalesce(F.min("l_orderkey"), F.lit(-1)).alias("min_ok"),
            F.coalesce(F.max("l_orderkey"), F.lit(-1)).alias("max_ok"),
        ).first()
        m = row.asDict()
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["n_gt25"], m["min_ok"], m["max_ok"])],
        "n_rows long, sum_qty long, n_gt25 long, min_ok long, max_ok long",
    )


# ---------------------------------------------------------------------------
# dq_join_cardinality_audit (round-6 session-7; windowed in rotation round 9)
# ---------------------------------------------------------------------------

DQ_JOIN_CARDINALITY_AUDIT_ORACLE = """
    WITH lo_l AS (SELECT l_orderkey AS k, count(*) AS nl
                  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         lo_r AS (SELECT o_orderkey AS k, count(*) AS nr
                  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
         lo_j AS (SELECT l.k, nl, nr, nl * nr AS prod
                  FROM lo_l l JOIN lo_r r USING (k)),
         lo_top AS (SELECT k, prod FROM lo_j
                    ORDER BY prod DESC, k ASC LIMIT 1),
         ev AS (SELECT user_id AS k, count(*) AS n FROM events
                WHERE user_id IS NOT NULL GROUP BY 1),
         ev_top AS (SELECT k, n * n AS prod FROM ev
                    ORDER BY n * n DESC, k ASC LIMIT 1)
    SELECT 'lineitem_orders' AS join_name,
           CAST((SELECT sum(nl) FROM lo_l) AS BIGINT) AS n_left,
           CAST((SELECT sum(nr) FROM lo_r) AS BIGINT) AS n_right,
           CAST((SELECT count(*) FROM lo_l) AS BIGINT) AS keys_left,
           CAST((SELECT count(*) FROM lo_r) AS BIGINT) AS keys_right,
           CAST((SELECT count(*) FROM lo_j) AS BIGINT) AS keys_shared,
           CAST((SELECT sum(prod) FROM lo_j) AS BIGINT) AS predicted_rows,
           CAST((SELECT prod FROM lo_top) AS BIGINT) AS max_key_product,
           CAST((SELECT k FROM lo_top) AS BIGINT) AS heavy_key
    UNION ALL
    SELECT 'events_self_user',
           CAST((SELECT sum(n) FROM ev) AS BIGINT),
           CAST((SELECT sum(n) FROM ev) AS BIGINT),
           CAST((SELECT count(*) FROM ev) AS BIGINT),
           CAST((SELECT count(*) FROM ev) AS BIGINT),
           CAST((SELECT count(*) FROM ev) AS BIGINT),
           CAST((SELECT sum(n * n) FROM ev) AS BIGINT),
           CAST((SELECT prod FROM ev_top) AS BIGINT),
           CAST((SELECT k FROM ev_top) AS BIGINT)
"""


def _cardinality_audit(
    left: DataFrame, lkey: str, right: DataFrame, rkey: str, name: str
) -> DataFrame:
    """Per-key count histograms on both sides, joined at histogram grain:
    predicted inner-join cardinality = Σ nl·nr, plus the single heaviest
    key (prod desc, key asc). Only aggregates ever shuffle or join."""
    # NULL join keys match NOTHING in an equi-join — a correct
    # cardinality prediction excludes them from both histograms (and the
    # oracle's ev/lo CTEs carry the same filter)
    lc = (
        left.filter(F.col(lkey).isNotNull())
        .groupBy(F.col(lkey).alias("k"))
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    rc = (
        right.filter(F.col(rkey).isNotNull())
        .groupBy(F.col(rkey).alias("k"))
        .agg(F.count(F.lit(1)).alias("nr"))
    )
    j = lc.join(rc, "k").select("k", "nl", "nr", (F.col("nl") * F.col("nr")).alias("prod"))
    totals = (
        j.agg(
            F.count(F.lit(1)).alias("keys_shared"),
            F.sum("prod").alias("predicted_rows"),
        )
        .crossJoin(F.broadcast(lc.agg(F.sum("nl").alias("n_left"), F.count(F.lit(1)).alias("keys_left"))))
        .crossJoin(F.broadcast(rc.agg(F.sum("nr").alias("n_right"), F.count(F.lit(1)).alias("keys_right"))))
    )
    top = j.orderBy(F.desc("prod"), F.asc("k")).limit(1).select(
        F.col("prod").alias("max_key_product"), F.col("k").alias("heavy_key")
    )
    return totals.crossJoin(F.broadcast(top)).select(
        F.lit(name).alias("join_name"),
        F.col("n_left").cast("long"),
        F.col("n_right").cast("long"),
        F.col("keys_left").cast("long"),
        F.col("keys_right").cast("long"),
        F.col("keys_shared").cast("long"),
        F.col("predicted_rows").cast("long"),
        F.col("max_key_product").cast("long"),
        F.col("heavy_key").cast("long"),
    )


@op(
    "dq_join_cardinality_audit",
    oracle=DQ_JOIN_CARDINALITY_AUDIT_ORACLE,
    tags=("governance", "dq", "join", "scale", "extra"),
)
def dq_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join cardinality/skew audit — predict a join's output
    size and its heaviest key WITHOUT executing the join. Each side
    collapses to a per-key count histogram (map-side-combinable, output
    = O(distinct keys)); the histograms join at aggregate grain and
    Σ nl·nr IS the exact inner-join cardinality, while max(nl·nr)
    names the skew key that would dominate a shuffle partition. At
    100 TB this is the difference between discovering a quadratic
    self-join blowup from a kilobyte-sized histogram join and
    discovering it as a 2-hour straggler task: the audit costs two
    scans + tiny-aggregate joins, never materializes a single joined
    row, and its verdict (predicted_rows, max_key_product) feeds the
    salt/broadcast/bucketize decision the scale_ops family implements.

    Two audits ship in one result: the lineitem⋈orders FK join (fanout
    = lines per order, benign) and the events self-join on user_id
    (Σ n² — the classic accidental-blowup shape). Every number is an
    exact integer aggregate, so the op full-hash-checks.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    return _cardinality_audit(li, "l_orderkey", o, "o_orderkey", "lineitem_orders").unionAll(
        _cardinality_audit(ev, "user_id", ev, "user_id", "events_self_user")
    )


# ---------------------------------------------------------------------------
# dq_table_content_digest (round-6 session-7; windowed in rotation round 9)
# ---------------------------------------------------------------------------

DQ_TABLE_CONTENT_DIGEST_ORACLE = """
    WITH li AS (
      SELECT CAST(CAST('0x' || substr(sha256(
               concat_ws('|', l_orderkey, l_linenumber,
                         CAST((CASE WHEN abs(CAST(l_quantity AS DOUBLE)) < 1e12 THEN CAST(l_quantity AS DOUBLE) END) AS BIGINT), l_returnflag)
             ), 1, 8) AS UBIGINT) AS BIGINT) AS h
      FROM lineitem
    ),
    o AS (
      SELECT CAST(CAST('0x' || substr(sha256(
               concat_ws('|', o_orderkey, o_custkey, o_orderstatus)
             ), 1, 8) AS UBIGINT) AS BIGINT) AS h
      FROM orders
    )
    SELECT 'lineitem' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_digest,
           CAST(sum(h) AS BIGINT) AS sum_digest,
           CAST(min(h) AS BIGINT) AS min_h, CAST(max(h) AS BIGINT) AS max_h
    FROM li
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT), CAST(sum(h) AS BIGINT),
           CAST(min(h) AS BIGINT), CAST(max(h) AS BIGINT)
    FROM o
"""


def _content_digest(df: DataFrame, cols_sql: str, name: str) -> DataFrame:
    h = df.select(
        F.expr(
            f"CAST(conv(substr(sha2(concat_ws('|', {cols_sql}), 256), 1, 8),"
            " 16, 10) AS BIGINT)"
        ).alias("h")
    )
    return h.agg(
        F.lit(name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h)").cast("long").alias("xor_digest"),
        F.sum("h").cast("long").alias("sum_digest"),
        F.min("h").cast("long").alias("min_h"),
        F.max("h").cast("long").alias("max_h"),
    )


@op(
    "dq_table_content_digest",
    oracle=DQ_TABLE_CONTENT_DIGEST_ORACLE,
    tags=("governance", "dq", "scale", "extra"),
)
def dq_table_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content fingerprint — the cross-cluster
    reconciliation primitive: per row, a 32-bit slice of
    sha256(canonical column rendering); per table, commutative
    reductions over it (xor, sum, min/max, count). Every aggregate is
    mergeable and order-free, so the digest of a 100 TB table is one
    O(scan) pass with map-side partials, an O(1) result, and NO
    global sort — compare digests from two clusters / two table
    versions / a pre- and post-migration copy and any dropped,
    duplicated, or mutated row flips xor_digest (and sum_digest
    catches xor's even-multiplicity blind spot — a row duplicated
    TWICE xors out but still shifts the sum and count). The same
    portable sha256→int recipe as the dedup family
    (functions/dedup.py:40) keeps both engines bit-identical.

    A governed warehouse runs this as the post-copy acceptance gate
    (the reference's export/import cycle, fhir_import_export.py:334-352,
    re-checked content-wise rather than by row count alone).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return _content_digest(
        li,
        "l_orderkey, l_linenumber, CAST((CASE WHEN abs(CAST(l_quantity AS DOUBLE)) < 1e12 THEN CAST(l_quantity AS DOUBLE) END) AS BIGINT), l_returnflag",
        "lineitem",
    ).unionAll(_content_digest(o, "o_orderkey, o_custkey, o_orderstatus", "orders"))
