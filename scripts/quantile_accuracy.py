"""Measured rank error of the bottom-k quantile sketch (VERDICT r10 task 6
/ r11 task 4) — the sizing rule for k, the way nprobe got its rule.

The sketch's accuracy claim is analytic ("rank error O(1/sqrt(k))",
operators/sketches.py); this script MEASURES it on the x30 ramp corpus
(150k docs — built by scripts/scale_ramp.py; falls back to building it):

- exact per-probability ranks from the full corpus (DuckDB over the same
  parquet — exact population CDF, no sampling on the truth side);
- sketch estimates at k in (64, 256, 1024), overall and per-language
  (the grouped form, 10 languages -> ~x30/10 = 15k docs per group);
- rank error per (k, p): |F(estimate) - p| where F is the exact empirical
  CDF (midpoint convention for ties), i.e. how far the returned value's
  true rank sits from the requested one — the standard KMV quantile
  error, in units of population fraction.

Prints per-(k, p) rows and a summary (max + mean error per k, overall and
worst-group).  SCALING.md is updated by hand from the output, like
bpe_divergence.py.

Usage: python scripts/quantile_accuracy.py [--scale 30] [--ks 64,256,1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBS = (0.05, 0.25, 0.5, 0.75, 0.95)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=30)
    ap.add_argument("--ks", default="64,256,1024")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    import duckdb

    from cassandra_util_spark.core.session import get_spark
    from cassandra_util_spark.operators.sketches import (
        bottomk_sample,
        bottomk_sample_grouped,
        sample_quantiles,
        sample_quantiles_grouped,
    )

    spark = get_spark("quantile-accuracy")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_ramp import build_ramp
    ramp = build_ramp(spark, args.scale)
    docs_path = os.path.join(ramp, "documents.parquet")
    docs = spark.read.parquet(docs_path)
    n_total = docs.count()
    print(f"corpus: {docs_path} ({n_total} docs)", file=sys.stderr)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT lang, n_chars FROM '{docs_path}/*.parquet'"
    )

    def exact_cdf(value: float, lang: str | None) -> float:
        """Exact empirical CDF with midpoint tie convention."""
        where = "" if lang is None else f"WHERE lang = '{lang}'"
        lt, eq, n = con.execute(
            f"SELECT sum(CASE WHEN n_chars < {value} THEN 1 ELSE 0 END),"
            f" sum(CASE WHEN n_chars = {value} THEN 1 ELSE 0 END), count(*)"
            f" FROM d {where}"
        ).fetchone()
        return (int(lt) + int(eq) / 2.0) / int(n)

    rows = []
    for k in ks:
        # overall
        s = bottomk_sample(docs, "doc_id", k=k, payload=("n_chars",))
        est = {
            float(r["p"]): int(r["estimate"])
            for r in sample_quantiles(s, "n_chars", probs=PROBS).collect()
        }
        for p in PROBS:
            err = abs(exact_cdf(est[p], None) - p)
            rows.append(("overall", k, p, est[p], err))
        # per-language
        sg = bottomk_sample_grouped(docs, "lang", "doc_id", k=k, payload=("n_chars",))
        qg = sample_quantiles_grouped(
            sg, "lang", "n_chars", probs=PROBS, key_col="doc_id"
        ).collect()
        for r in qg:
            err = abs(exact_cdf(int(r["estimate"]), r["lang"]) - float(r["p"]))
            rows.append((r["lang"], k, float(r["p"]), int(r["estimate"]), err))

    print(f"{'group':>8} {'k':>5} {'p':>5} {'estimate':>9} {'rank_err':>9}")
    for g, k, p, est, err in rows:
        print(f"{g:>8} {k:>5} {p:>5} {est:>9} {err:>9.4f}")

    import math

    print("\nsummary (rank error in population-fraction units):")
    for k in ks:
        overall = [e for g, kk, p, _, e in rows if kk == k and g == "overall"]
        grouped = [e for g, kk, p, _, e in rows if kk == k and g != "overall"]
        print(
            f"k={k:>5}: overall mean={sum(overall)/len(overall):.4f} "
            f"max={max(overall):.4f} | per-lang mean={sum(grouped)/len(grouped):.4f} "
            f"max={max(grouped):.4f} | 1/sqrt(k)={1/math.sqrt(k):.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
