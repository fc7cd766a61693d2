"""CLI — the same command surface as the reference (reference cli.py:11-83),
argparse-based so a reference user can switch 1:1:

    python -m open_bus_siri_etl_spark.cli process-snapshot 2019/05/05/16/00
    python -m open_bus_siri_etl_spark.cli process-new-snapshots
    python -m open_bus_siri_etl_spark.cli start-process-new-snapshots-daemon
    python -m open_bus_siri_etl_spark.cli parallel-process-old-missing-snapshots
    python -m open_bus_siri_etl_spark.cli update-pending-snapshots
    python -m open_bus_siri_etl_spark.cli download-snapshot 2019/05/05/16/00
    python -m open_bus_siri_etl_spark.cli download-latest-snapshots
    python -m open_bus_siri_etl_spark.cli validate-snapshots FROM TO
    python -m open_bus_siri_etl_spark.cli prep-training-data IN.parquet OUT/

Environment: SIRI_ETL_WAREHOUSE (table root), SIRI_ETL_LANDING (snapshot
landing root) replace the reference's Postgres/S3 config.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys


def _ctx():
    from .session import get_spark
    from .sources.tables import Warehouse

    spark = get_spark(app_name="siri-etl-cli")
    wh = Warehouse(spark, os.environ.get("SIRI_ETL_WAREHOUSE", "./warehouse"))
    landing = os.environ.get("SIRI_ETL_LANDING", "./landing")
    return spark, wh, landing


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="open-bus-siri-etl-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("process-snapshot", help="ETL one snapshot (reference cli.py:30-35)")
    sp.add_argument("snapshot_id")
    sp.add_argument("--force-reload", action="store_true")

    sub.add_parser("process-new-snapshots", help="one incremental tick (reference cli.py:57-61)")

    d = sub.add_parser(
        "start-process-new-snapshots-daemon",
        help="60s-cadence daemon (reference cli.py:64-66)",
    )
    d.add_argument("--max-ticks", type=int, default=None)

    b = sub.add_parser(
        "parallel-process-old-missing-snapshots",
        help="drain pending snapshots in batches (reference cli.py:48-54)",
    )
    b.add_argument("--batch-minutes", type=int, default=60)

    sub.add_parser(
        "update-pending-snapshots",
        help="register unseen landed snapshots as pending (reference cli.py:69-76)",
    )

    ds = sub.add_parser(
        "download-snapshot",
        help="fetch one snapshot from remote storage into the landing root "
        "(reference cli.py:23-27)",
    )
    ds.add_argument("snapshot_id")
    ds.add_argument(
        "--url-template",
        default=None,
        help="base URL (any urllib scheme); default $SIRI_ETL_SNAPSHOT_URL",
    )

    dl = sub.add_parser(
        "download-latest-snapshots",
        help="fetch the last ~2h of snapshots into the landing root "
        "(reference cli.py:17-20, local_development_helpers.py:14-18)",
    )
    dl.add_argument("--minutes", type=int, default=120)
    dl.add_argument("--url-template", default=None)

    v = sub.add_parser("validate-snapshots", help="diff warehouse vs raw (reference cli.py:79-83)")
    v.add_argument("snapshot_id_from")
    v.add_argument("snapshot_id_to")
    v.add_argument("--report-path", default=None)

    rq = sub.add_parser(
        "run-query",
        help="beyond-reference: run a named catalog query against a "
        "parquet table directory and print JSON rows",
    )
    rq.add_argument("name", help="catalog entry name (see plans/catalog.py)")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)

    rs = sub.add_parser(
        "run-sql",
        help="beyond-reference: run ANSI SQL against the table directory "
        "via spark.sql (tables registered as views)",
    )
    rs.add_argument("query")
    rs.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rs.add_argument("--limit", type=int, default=20)

    tp = sub.add_parser(
        "prep-training-data",
        help="beyond-reference: quality+language gate and exact-dedup a "
        "documents parquet into a training corpus",
    )
    tp.add_argument("input_parquet")
    tp.add_argument("output_dir")
    tp.add_argument("--min-tokens", type=int, default=20)
    tp.add_argument("--max-tokens", type=int, default=80)

    cc = sub.add_parser(
        "compact-curation-state",
        help="beyond-reference maintenance: rewrite a curation stream's "
        "label/survivor logs to their latest-wins base (run while the "
        "stream is stopped after a clean drain — the daily-maintenance "
        "slot, like the control-table compaction)",
    )
    cc.add_argument("state_root")
    cc.add_argument(
        "--checkpoint",
        default=None,
        help="the stream's checkpointLocation; when given, compaction "
        "REFUSES if any offsets/<n> lacks its commits/<n> twin (an "
        "uncommitted batch that will replay) instead of trusting the "
        "operator's clean-drain claim",
    )

    ci = sub.add_parser(
        "compact-ivf-store",
        help="beyond-reference maintenance: fold a streaming IVF-PQ "
        "or IVF-SQ8 store's per-batch partitions into the "
        "ingest_batch=-1 base (pure relayout — code rows are immutable; "
        "bounds the partition/file count of a long-running indexer "
        "daemon; schema-agnostic, so it serves both index families)",
    )
    ci.add_argument("index_path")
    ci.add_argument(
        "--checkpoint",
        default=None,
        help="the stream's checkpointLocation; when given, refuses on "
        "offsets without commits (an uncommitted batch that will replay)",
    )

    ex = sub.add_parser(
        "export-training-shards",
        help="beyond-reference: materialize a parquet table as N "
        "content-hash-sharded, pre-shuffled training shard files",
    )
    ex.add_argument("input_parquet")
    ex.add_argument("output_dir")
    ex.add_argument("--key", default="doc_id")
    ex.add_argument("--n-shards", type=int, default=16)
    ex.add_argument("--format", default="parquet",
                    choices=["parquet", "orc", "json"])
    ex.add_argument("--max-records-per-file", type=int, default=None)

    args = p.parse_args(argv)

    # download verbs need no SparkSession — handle before _ctx() so they
    # stay instant (the reference's local-dev helpers are plain requests)
    if args.cmd in ("download-snapshot", "download-latest-snapshots"):
        from .sources.snapshots import download_latest_snapshots, download_snapshot

        landing = os.environ.get("SIRI_ETL_LANDING", "./landing")
        url_template = args.url_template or os.environ.get("SIRI_ETL_SNAPSHOT_URL")
        if not url_template:
            p.error("--url-template or $SIRI_ETL_SNAPSHOT_URL is required")
        if args.cmd == "download-snapshot":
            path = download_snapshot(landing, args.snapshot_id, url_template)
            print(json.dumps({"snapshot_id": args.snapshot_id, "path": path}))
            return 0 if path else 1
        landed = download_latest_snapshots(landing, url_template, minutes=args.minutes)
        print(json.dumps({"landed": len(landed), "snapshot_ids": landed}))
        return 0

    if args.cmd == "compact-curation-state":
        from .session import get_spark
        from .streaming.delta_dedup import compact_curation_logs

        spark = get_spark(app_name="siri-etl-compact-curation")
        stats = compact_curation_logs(
            spark, args.state_root, checkpoint_dir=args.checkpoint
        )
        print(json.dumps({"state_root": args.state_root, **stats}))
        return 0

    if args.cmd == "compact-ivf-store":
        from .session import get_spark
        from .streaming.delta_dedup import compact_ivf_pq_store

        spark = get_spark(app_name="siri-etl-compact-ivf")
        stats = compact_ivf_pq_store(
            spark, args.index_path, checkpoint_dir=args.checkpoint
        )
        print(json.dumps({"index_path": args.index_path, **stats}))
        return 0

    if args.cmd == "export-training-shards":
        from .session import get_spark
        from .sources.export import write_training_shards

        spark = get_spark(app_name="siri-etl-export")
        df = spark.read.parquet(args.input_parquet)
        write_training_shards(
            df,
            args.output_dir,
            key=args.key,
            n_shards=args.n_shards,
            max_records_per_file=args.max_records_per_file,
            file_format=args.format,
        )
        n = spark.read.format(args.format).load(args.output_dir).count()
        print(json.dumps({"rows": n, "n_shards": args.n_shards,
                          "format": args.format, "output_dir": args.output_dir}))
        return 0

    # query verbs need a session but no warehouse/landing context
    if args.cmd in ("run-query", "run-sql"):
        from .session import get_spark

        spark = get_spark(app_name="siri-etl-query")
        if args.cmd == "run-query":
            from .plans.catalog import REGISTRY

            if args.name not in REGISTRY:
                p.error(f"unknown query {args.name!r}; see plans/catalog.py")
            df = REGISTRY[args.name].fn(spark, args.sf_dir)
        else:
            from .plans.sqlapi import sql

            df = sql(spark, args.sf_dir, args.query)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    spark, wh, landing = _ctx()

    if args.cmd == "process-snapshot":
        from .pipeline import process_snapshot

        stats = process_snapshot(
            spark, wh, args.snapshot_id, landing, force_reload=args.force_reload
        )
        print(json.dumps(stats, default=str))
    elif args.cmd == "process-new-snapshots":
        from .streaming.incremental import process_new_snapshots

        print(json.dumps(process_new_snapshots(spark, wh, landing)))
    elif args.cmd == "start-process-new-snapshots-daemon":
        from .streaming.incremental import start_daemon

        start_daemon(spark, wh, landing, max_ticks=args.max_ticks)
    elif args.cmd == "parallel-process-old-missing-snapshots":
        from .backfill import run_backfill

        print(json.dumps(run_backfill(spark, wh, landing, args.batch_minutes)))
    elif args.cmd == "update-pending-snapshots":
        from . import control
        from .sources.snapshots import list_snapshot_ids

        n = control.register_pending(wh, list_snapshot_ids(landing))
        print(json.dumps({"registered": n}))
    elif args.cmd == "prep-training-data":
        from .operators.textstats import prep_training_corpus

        docs = spark.read.parquet(args.input_parquet)
        corpus = prep_training_corpus(
            docs, min_tokens=args.min_tokens, max_tokens=args.max_tokens
        )
        corpus.write.mode("overwrite").parquet(args.output_dir)
        print(
            json.dumps(
                {
                    "input_rows": docs.count(),
                    "output_rows": spark.read.parquet(args.output_dir).count(),
                    "output": args.output_dir,
                }
            )
        )
    elif args.cmd == "validate-snapshots":
        from .validate import validate_snapshots

        dt_from = datetime.datetime.strptime(args.snapshot_id_from, "%Y/%m/%d/%H/%M")
        dt_to = datetime.datetime.strptime(args.snapshot_id_to, "%Y/%m/%d/%H/%M")
        ids = []
        cur = dt_from
        while cur <= dt_to:
            ids.append(cur.strftime("%Y/%m/%d/%H/%M"))
            cur += datetime.timedelta(minutes=1)
        report = validate_snapshots(spark, wh, landing, ids, args.report_path)
        for row in report.collect():
            print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
