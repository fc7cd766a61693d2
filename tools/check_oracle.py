"""Local mirror of the driver's correctness gate: run every catalog query in
Spark AND its DuckDB oracle at sf=0.01, compare row count, schema (sorted
column names) and order-insensitive values.  Run: python tools/check_oracle.py
[name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# --sf PATH overrides the env var; without this, a stray "--sf x" pair
# would silently become two never-matching ENTRY-NAME filters and the
# run would report "0 ok" while checking nothing (round-11 footgun)
if "--sf" in sys.argv:
    i = sys.argv.index("--sf")
    SF_DIR = sys.argv[i + 1]
    del sys.argv[i : i + 2]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv64 = sv.astype("float64")
            dv64 = dv.astype("float64")
            both_nan = np.isnan(sv64) & np.isnan(dv64)
            eq = (sv64 == dv64) | both_nan
            if not eq.all():
                diff = np.abs(sv64 - dv64)
                problems.append(
                    f"col {c}: {(~eq).sum()} value mismatches, max abs diff "
                    f"{np.nanmax(diff[~eq]):.3e}"
                )
        else:
            eq = (sv == dv) | (pd.isna(sv) & pd.isna(dv))
            if not np.asarray(eq).all():
                bad = int((~np.asarray(eq)).sum())
                i = int(np.argmax(~np.asarray(eq)))
                problems.append(
                    f"col {c}: {bad} value mismatches, first: spark={sv[i]!r} duck={dv[i]!r}"
                )
    return problems


# Entries whose result is ONE row by construction — a global aggregate over
# the full table (min/max/counts/estimators folded to a single summary row).
# These carry real value-level evidence despite the row count; everything
# else at ≤1 rows is reported TRIVIAL (threshold/date constants should be
# tuned so the entry is non-trivial at every SF).
TRIVIAL_OK = {
    # one global scalar / summary row over the full table
    "global_minmax",
    "kmv_distinct_users",
    "hll_distinct_users",
    "corpus_stats",
    "triangle_count",
    "key_set_diff",            # two set-difference counts in one row
    "bloom_filter_probe",      # probe/pass/true/fp counts in one row
    "funnel_view_click_error", # stage counts as columns
    "sessionized_funnel",      # session/funnel counts as columns
    # single-scalar by TPC-H spec
    "tpch_q6_forecast_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "small_lot_revenue",       # q17-shaped scalar
    "tpch_q15_top_supplier",   # argmax — one row unless revenue ties
}


def main() -> int:
    from open_bus_siri_etl_spark.plans.catalog import REGISTRY
    from open_bus_siri_etl_spark.session import get_spark

    only = set(sys.argv[1:])
    unknown = only - set(REGISTRY)
    if unknown:
        # a typo'd entry name must not silently shrink the run to nothing
        print(f"unknown entry name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="check-oracle")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
        )

    n_pass = n_fail = n_weak = n_trivial = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.sql is None:
            n_weak += 1
            print(f"weak  {name}: rows={len(spark_pdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(q.sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
        elif len(spark_pdf) <= 1:
            # A 0/1-row match proves almost nothing (an empty result matches
            # an empty result for ANY wrong query) — report it separately so
            # a threshold that zeroes out at one SF can't hide as green.
            # Single-row entries that are non-trivial by construction
            # (global aggregates over the whole table) are allowlisted.
            if name in TRIVIAL_OK:
                n_pass += 1
                print(
                    f"ok    {name}: rows={len(spark_pdf)} (1-row global agg) "
                    f"[{time.time()-t0:.1f}s]"
                )
            else:
                n_trivial += 1
                print(
                    f"TRIVIAL {name}: rows={len(spark_pdf)} — match carries no "
                    f"value-level evidence at this SF [{time.time()-t0:.1f}s]"
                )
        else:
            n_pass += 1
            print(f"ok    {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
    print(
        f"\n{n_pass} ok, {n_weak} weak (rows-only), {n_trivial} TRIVIAL, "
        f"{n_fail} FAIL"
    )
    return 1 if (n_fail or n_trivial) else 0


if __name__ == "__main__":
    sys.exit(main())
