r"""A/B for text_line_dedup_c4's round-12 session-3 candidate (guide
SS2.3 "shuffle keys and metadata instead of payloads", taken one step
further than the session-1 digest-window rewrite).

Current plan (session 1): explode -> window PARTITION BY sha2(line)
(strings cross the digest exchange) -> groupBy(doc_id) (strings cross a
second exchange) -> reassemble. Line strings cross TWO hash exchanges
and the window sort has no map-side partial.

Candidate: the first-occurrence set per line is just
``groupBy(digest).agg(min(struct(doc_id, pos)))`` -- a partial-agged
aggregation whose exchange carries ONLY (32-byte digest, doc_id, pos);
regrouping those argmin pairs by doc_id yields each doc's kept-position
array (narrow ints). The reassembly groupBy(doc_id) then joins that
array on doc_id -- both sides already hash(doc_id)-partitioned, so the
join adds sorts but NO new exchange -- and filters the collected
(pos, line) structs by membership. Strings cross ONE exchange.

    python tools/linededup_ab.py [--scales 10 40] [--reps 3]

Values are asserted sorted-equal across current/candidate AND the DuckDB
oracle before any timing (the repo A/B rule).

OUTCOME (round-12 session 3): the candidate measured ~10 % SLOWER at
x40 — the second scan/explode, the SMJ sorts on the kps join, and the
per-row array_contains membership filter cost more than the narrower
digest exchange saved (the "narrow" groupBy leg alone timed as
expensive as the window it replaced). NEGATIVE, closed. Decomposing
the survivor instead showed the span DERIVATION dominated (2.18 s of
4.75 s), which led to the shipped regexp_extract_all + unhex(sha2)
rewrite in text_line_dedup_c4 (x40 4.82 -> 3.54 s, 1.18x vs DuckDB).
This tool now measures candidate-vs-shipped, so re-running it records
the negative's margin against the current operator.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def candidate(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W  # noqa: F401

    from aced_etl_pod_spark.tables import load

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("l"))
    )
    spans = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor((F.size("l") - 1) / 8).cast("int")
                ),
                lambda i: F.array_join(
                    F.slice(
                        F.col("l"),
                        i * 8 + 1,
                        F.least(F.lit(8), F.size("l") - i * 8),
                    ),
                    " ",
                ),
            )
        ).alias("pos", "line"),
    )
    kps = (
        spans.select(
            F.unhex(F.sha2("line", 256)).alias("h"), "doc_id", "pos"
        )
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("f"))
        .groupBy(F.col("f.doc_id").alias("doc_id"))
        .agg(F.collect_list("f.pos").alias("kps"))
    )
    docstats = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("pl"),
    )
    joined = docstats.join(kps, "doc_id", "left").withColumn(
        # ansi=false => legacy sizeOfNull (-1): coalesce BEFORE size
        "kp", F.coalesce(F.col("kps"), F.array().cast("array<int>"))
    )
    return joined.select(
        "doc_id",
        "n_lines",
        (F.col("n_lines") - F.size("kp")).cast("long").alias("n_dropped"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("pl"),
                        lambda x: F.array_contains(F.col("kp"), x["pos"]),
                    ),
                    lambda x: x["line"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("kept_text"),
    ).orderBy("doc_id")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[10, 40])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import duckdb

    from pyspark.sql import functions as F

    from aced_etl_pod_spark.operators import text as txt
    from aced_etl_pod_spark.session import get_spark, pin
    from tools.dedup_ladder import build_perturbed

    spark = get_spark("linededup-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    out = {}
    for scale in args.scales:
        sf = build_perturbed(scale)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        cur = txt.text_line_dedup_c4(spark, sf)
        cand = candidate(spark, sf)
        spark.sparkContext.setJobDescription(f"linededup-ab x{scale} verify")
        rows_cur = sorted(tuple(r) for r in cur.collect())
        rows_cand = sorted(tuple(r) for r in cand.collect())
        orows = sorted(
            tuple(r)
            for r in con.execute(txt.TEXT_LINE_DEDUP_C4_ORACLE).fetchall()
        )
        assert rows_cand == rows_cur, (
            f"x{scale}: candidate != current "
            f"({len(rows_cand)} vs {len(rows_cur)} rows)"
        )
        assert rows_cur == orows, f"x{scale}: current != oracle"
        print(f"x{scale}: values equal across current/candidate/oracle "
              f"({len(orows)} rows)", flush=True)

        timings = {}
        for name, df in (("current", cur), ("candidate", cand)):
            spark.sparkContext.setJobDescription(
                f"linededup-ab x{scale} {name}"
            )
            rerun(df).collect()
            ts = []
            for _ in range(args.reps):
                w = rerun(df)
                t0 = time.perf_counter()
                w.collect()
                ts.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(ts), 3)
        td = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            con.execute(txt.TEXT_LINE_DEDUP_C4_ORACLE).fetchall()
            td.append(time.perf_counter() - t0)
        timings["duckdb"] = round(statistics.median(td), 3)
        out[f"x{scale}"] = timings
        print(f"x{scale}: {timings}", flush=True)
    print(json.dumps({"metric": "linededup_ab", "results": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
