"""q6 (JSON extract) kernel A/B at a tiled scale (round-11, post-verdict):
the round-10 A/Bs proved Spark's two JSON PARSE engines (Jackson
from_json, variant shredder) are both ~20x DuckDB's yyjson on this
shape, and the architecture answer (shred at ingest) shipped. This tool
measures the one kernel lever never tried: NOT parsing at all on the
fast path — a strict-shape raw-string extraction whose semantics are
exact by construction because every row the fast path cannot PROVE
matches ``{"k": <strict JSON number>}`` falls back to the real parser.

    python tools/q6_ab.py [--scale 200] [--reps 5]

Variants (honest full re-execution, interleaved, warm medians):

* scan      — count + sum(length(props)): the parquet decode floor
* current   — fn_json (schema-pruned single from_json, the shipped op)
* rx_hybrid — JVM regexp_extract with a strict JSON-number grammar
              (anchored whole-doc match, leading-zero rejecting, so the
              captured text parses to the same double Jackson would
              produce); non-matching rows — nested docs, string values,
              duplicate keys, malformed JSON — take the from_json
              fallback, so divergence is impossible
* arrow_re2 — mapInArrow kernel: pyarrow extract_regex (RE2) + per-batch
              partial aggregation (the q7 partial trick); rows RE2 can't
              prove safe are passed through raw and aggregated via
              from_json on the JVM side, then combined

Exactness of the fast path (both variants share the grammar): the
capture ``-?(0|[1-9]\\d*)(\\.\\d+)?([eE][+-]?\\d+)?`` is exactly the
RFC 8259 number grammar, and the anchor ``^{"k": (num)}$`` admits only
documents where Jackson would visit a single top-level "k" with that
literal — on those, Double.parseDouble == Jackson's getDoubleValue ==
cast(string as double). Everything else (leading zeros, ``1d``/hex/
``Infinity`` strings that cast() would wrongly accept, nested objects,
whitespace variants) fails the anchor and is parsed for real.
tests/test_property.py pins the adversarial set row-for-row.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

# One grammar, one source of truth — the shipped kernel's. A local copy
# here once drifted from the measured grammar; import it instead.
from aced_etl_pod_spark.operators.functions import _JSON_NUM_RX  # noqa: E402

NUM_GRAMMAR = _JSON_NUM_RX
DOC_RX = r'^\{"k": (' + NUM_GRAMMAR + r')\}$'


def _k_int(k):
    return F.when(
        k.between(-2147483648, 2147483647) & (k == F.floor(k)),
        k.cast("int"),
    )


def _final_agg(sel):
    return sel.groupBy("event_type").agg(
        F.round(F.avg("k"), 2).alias("avg_k"),
        F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        F.max("k").alias("max_k"),
        F.sum("k_i").cast("long").alias("sum_k"),
    )


def rx_hybrid_variant(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events")
    x = F.regexp_extract("props", DOC_RX, 1)
    k = F.when(x != "", x.cast("double")).otherwise(
        F.from_json("props", "k DOUBLE").getField("k")
    )
    return _final_agg(
        e.select("event_type", k.alias("k"), _k_int(k).alias("k_i"))
    )


def int_roundtrip_variant(spark, sf_dir):
    """Regex-FREE integer fast tier: candidate = the bytes between
    '{"k": ' and '}'; valid iff cast(candidate AS LONG) re-stringifies
    to exactly the candidate (rejects '007', '1d', '-0', '+5', spaces,
    hex — everything non-canonical — by construction; every canonical
    integer string is a valid JSON number Jackson parses to the same
    value). Non-integer docs (fractions, exponents) fall through to the
    regex tier's from_json fallback here, so semantics stay exact."""
    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events")
    p = F.col("props")
    cand = F.expr("substring(props, 7, length(props) - 7)")
    l = cand.cast("long")
    valid = (
        p.startswith('{"k": ')
        & p.endswith("}")
        & l.isNotNull()
        & (l.cast("string") == cand)
    )
    k = F.when(valid, l.cast("double")).otherwise(
        F.from_json("props", "k DOUBLE").getField("k")
    )
    return _final_agg(
        e.select("event_type", k.alias("k"), _k_int(k).alias("k_i"))
    )


def _re2_partial_kernel(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("raw_props", pa.string()),
            ("s_k", pa.float64()),
            ("c_k", pa.int64()),
            ("n_high", pa.int64()),
            ("max_k", pa.float64()),
            ("s_ki", pa.int64()),
            ("c_ki", pa.int64()),
        ]
    )
    for b in batches:
        if b.num_rows == 0:
            continue
        props = b.column("props")
        # extract_regex needs a NAMED group (RE2 syntax)
        ext = pc.extract_regex(
            props, r'^\{"k": (?P<n>' + NUM_GRAMMAR + r')\}$'
        )
        matched = pc.is_valid(ext)
        n_valid = pc.sum(matched).as_py() or 0
        if n_valid < b.num_rows:
            raw_mask = pc.invert(pc.fill_null(matched, False))
            raw = pa.table(
                {
                    "event_type": pc.filter(b.column("event_type"), raw_mask),
                    "props": pc.filter(props, raw_mask),
                }
            )
            n = raw.num_rows
            yield pa.RecordBatch.from_arrays(
                [
                    raw.column("event_type").combine_chunks(),
                    raw.column("props").combine_chunks(),
                    pa.nulls(n, pa.float64()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.float64()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                ],
                schema=out_schema,
            )
        if n_valid == 0:
            continue
        keep = pc.fill_null(matched, False)
        k = pc.cast(
            pc.struct_field(pc.filter(ext, keep), "n"), pa.float64()
        )
        et = pc.filter(b.column("event_type"), keep)
        integral = pc.and_(
            pc.equal(k, pc.floor(k)),
            pc.and_(
                pc.greater_equal(k, pa.scalar(-2147483648.0)),
                pc.less_equal(k, pa.scalar(2147483647.0)),
            ),
        )
        ki = pc.if_else(integral, pc.cast(k, pa.int64(), safe=False), None)
        high = pc.cast(pc.greater(k, pa.scalar(50.0)), pa.int64())
        t = pa.table(
            {"event_type": et, "k": k, "ki": ki, "high": high}
        )
        g = t.group_by("event_type").aggregate(
            [
                ("k", "sum"),
                ("k", "count"),
                ("high", "sum"),
                ("k", "max"),
                ("ki", "sum"),
                ("ki", "count"),
            ]
        )
        n = g.num_rows
        yield pa.RecordBatch.from_arrays(
            [
                g.column("event_type").combine_chunks(),
                pa.nulls(n, pa.string()),
                g.column("k_sum").cast(pa.float64()).combine_chunks(),
                g.column("k_count").cast(pa.int64()).combine_chunks(),
                g.column("high_sum").cast(pa.int64()).combine_chunks(),
                g.column("k_max").cast(pa.float64()).combine_chunks(),
                g.column("ki_sum").cast(pa.int64()).combine_chunks(),
                g.column("ki_count").cast(pa.int64()).combine_chunks(),
            ],
            schema=out_schema,
        )


def arrow_re2_variant(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events").select("event_type", "props")
    out = e.mapInArrow(
        _re2_partial_kernel,
        "event_type string, raw_props string, s_k double, c_k long,"
        " n_high long, max_k double, s_ki long, c_ki long",
    )
    kf = F.from_json("raw_props", "k DOUBLE").getField("k")
    fallback = (
        out.filter(F.col("raw_props").isNotNull() | F.col("c_k").isNull())
        .select("event_type", kf.alias("k"), _k_int(kf).alias("k_i"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("s_k"),
            F.count("k").alias("c_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
            F.max("k").alias("max_k"),
            F.sum("k_i").cast("long").alias("s_ki"),
            F.count("k_i").alias("c_ki"),
        )
    )
    partials = out.filter(F.col("raw_props").isNull()).drop("raw_props")
    both = partials.unionByName(fallback.select(*partials.columns))
    return both.groupBy("event_type").agg(
        F.round(F.sum("s_k") / F.sum("c_k"), 2).alias("avg_k"),
        F.sum("n_high").cast("long").alias("n_high"),
        F.max("max_k").alias("max_k"),
        F.when(F.sum("c_ki") > 0, F.sum("s_ki")).cast("long").alias("sum_k"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import duckdb

    from tools.bench_ladder import build_scaled
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import load

    sf = build_scaled(args.scale)
    spark = get_spark("q6-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    e = load(spark, sf, "events")
    # fn_json SHIPS the rx_hybrid kernel since this A/B landed — keep a
    # pure-Jackson variant so the comparison stays measurable
    kj = F.from_json("props", "k DOUBLE").getField("k")
    pure = _final_agg(
        e.select("event_type", kj.alias("k"), _k_int(kj).alias("k_i"))
    )
    variants = {
        "scan": e.select(
            F.count("*").alias("n"), F.sum(F.length("props")).alias("b")
        ),
        "pure_from_json": pure,
        "current": reg["fn_json"].fn(spark, sf),
        "rx_hybrid": rx_hybrid_variant(spark, sf),
        "int_roundtrip": int_roundtrip_variant(spark, sf),
        "arrow_re2": arrow_re2_variant(spark, sf),
    }

    vals = {
        n: sorted(tuple(r) for r in variants[n].collect())
        for n in (
            "pure_from_json",
            "current",
            "rx_hybrid",
            "int_roundtrip",
            "arrow_re2",
        )
    }
    assert (
        vals["current"] == vals["rx_hybrid"] == vals["arrow_re2"]
        == vals["pure_from_json"] == vals["int_roundtrip"]
    ), vals
    print("values agree", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    oracle = reg["fn_json"].oracle
    con.execute(oracle).fetchall()

    samples = {n: [] for n in variants}
    duck = []
    for _ in range(args.reps):
        for name, df in variants.items():
            w = rerun(df)
            t0 = time.perf_counter()
            w.collect()
            samples[name].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(oracle).fetchall()
        duck.append(time.perf_counter() - t0)

    med = {n: statistics.median(ts) for n, ts in samples.items()}
    dm = statistics.median(duck)
    print(f"duckdb oracle: {dm:.3f} s")
    for n, m in med.items():
        print(f"{n:12s} {m:7.3f} s  ratio {m / dm:5.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
