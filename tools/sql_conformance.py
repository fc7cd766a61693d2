"""Measure catalog-wide SQL conformance: try EVERY oracle string through
spark.sql against the same testdata views and compare row-for-row with the
DataFrame plan.  Output: one line per entry (ok / MISMATCH / error class),
plus a summary — the raw material for the conformance test's documented
dialect-gap allowlist.

Run: python tools/sql_conformance.py [sf_dir]
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from open_bus_siri_etl_spark.plans.catalog import REGISTRY  # noqa: E402
from open_bus_siri_etl_spark.plans.sqlapi import register_views, transpile  # noqa: E402
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402


def rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.select(sorted(df.columns)).collect()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="sql-conformance")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)

    ok, mismatch, errs = [], [], {}
    for name, q in REGISTRY.items():
        if q.sql is None:
            continue
        try:
            via_sql = spark.sql(transpile(q.sql))
            r_sql = rows(via_sql)
        except Exception as e:
            first = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            errs[name] = first
            print(f"ERR   {name}: {first}", flush=True)
            continue
        try:
            r_df = rows(q.fn(spark, sf_dir))
        except Exception:
            traceback.print_exc()
            continue
        if r_sql == r_df:
            ok.append(name)
            print(f"ok    {name}: rows={len(r_sql)}", flush=True)
        else:
            mismatch.append(name)
            print(f"MISMATCH {name}: sql={len(r_sql)} df={len(r_df)}", flush=True)

    print(f"\n{len(ok)} ok, {len(mismatch)} mismatch, {len(errs)} errors")
    if errs:
        print("\nerror entries:")
        for n, e in errs.items():
            print(f"  {n}: {e}")
    if mismatch:
        print("mismatch entries:", mismatch)


if __name__ == "__main__":
    main()
