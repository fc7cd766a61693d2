"""End-to-end test of the CLI surface (the reference's primary API,
reference cli.py:11-83) — commands run in-process via main(argv) against a
temp warehouse/landing pair wired through the same env vars a reference
user would set."""

import pytest

import json

from open_bus_siri_etl_spark.cli import main

from .fixtures import TEST_SNAPSHOT_DATA


@pytest.mark.slow
def test_cli_surface(spark, tmp_path, monkeypatch, capsys):
    from open_bus_siri_etl_spark.sources.snapshots import write_snapshot_fixture

    wh_root = tmp_path / "warehouse"
    landing = tmp_path / "landing"
    monkeypatch.setenv("SIRI_ETL_WAREHOUSE", str(wh_root))
    monkeypatch.setenv("SIRI_ETL_LANDING", str(landing))

    for sid in ["2019/05/05/16/00", "2019/05/05/16/01"]:
        write_snapshot_fixture(str(landing), sid, TEST_SNAPSHOT_DATA)

    # process one snapshot
    assert main(["process-snapshot", "2019/05/05/16/00"]) in (0, None)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["num_successful"] == 3 and stats["num_failed"] == 2

    # register the other landed snapshot as pending, then drain via backfill
    assert main(["update-pending-snapshots"]) in (0, None)
    capsys.readouterr()
    assert main(["parallel-process-old-missing-snapshots"]) in (0, None)
    drained = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert drained.get("processed", 0) >= 1

    # validate what was loaded: zero findings on a clean warehouse
    report = tmp_path / "report.csv"
    assert main(
        [
            "validate-snapshots",
            "2019/05/05/16/00",
            "2019/05/05/16/01",
            "--report-path",
            str(report),
        ]
    ) in (0, None)
    assert report.exists()


def test_cli_prep_training_data(spark, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("SIRI_ETL_WAREHOUSE", str(tmp_path / "wh"))
    monkeypatch.setenv("SIRI_ETL_LANDING", str(tmp_path / "landing"))
    out = tmp_path / "corpus"
    assert main(
        ["prep-training-data", "/root/testdata/sf0.001/documents.parquet", str(out)]
    ) in (0, None)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["input_rows"] > 0
    assert 0 < res["output_rows"] <= res["input_rows"]
    written = spark.read.parquet(str(out))
    assert written.count() == res["output_rows"]
    assert "doc_id" in written.columns


def test_cli_download_verbs(spark, tmp_path, monkeypatch, capsys):
    """download-snapshot / download-latest-snapshots land .br payloads from
    a file:// bucket mirror (reference cli.py:17-27) and the landed snapshot
    processes to the golden result."""
    import datetime
    import json as _json

    from open_bus_siri_etl_spark.sources.snapshots import (
        brotli_compress,
        download_latest_snapshots,
    )

    landing = tmp_path / "landing"
    monkeypatch.setenv("SIRI_ETL_WAREHOUSE", str(tmp_path / "warehouse"))
    monkeypatch.setenv("SIRI_ETL_LANDING", str(landing))

    # remote bucket layout: {url}/{id}.br
    payload = brotli_compress(_json.dumps(TEST_SNAPSHOT_DATA).encode())
    bucket = tmp_path / "bucket"
    for sid in ["2019/05/05/16/00", "2019/05/05/16/01"]:
        p = bucket / f"{sid}.br"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    url = bucket.as_uri()

    # single-snapshot verb, then process the landed file end-to-end
    assert main(["download-snapshot", "2019/05/05/16/00", "--url-template", url]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["path"].endswith("2019/05/05/16/00.json.br")
    assert main(["process-snapshot", "2019/05/05/16/00"]) in (0, None)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["num_successful"] == 3 and stats["num_failed"] == 2

    # missing remote object -> rc 1, nothing landed
    assert main(["download-snapshot", "2019/05/05/16/59", "--url-template", url]) == 1
    capsys.readouterr()
    assert not (landing / "2019/05/05/16/59.json.br").exists()

    # latest-snapshots loop (hermetic 'now' via the library seam): only the
    # two bucket objects inside the window land, oldest first
    now = datetime.datetime(2019, 5, 5, 16, 3, tzinfo=datetime.timezone.utc)
    landed = download_latest_snapshots(str(landing), url, minutes=10, now=now)
    assert landed == ["2019/05/05/16/00", "2019/05/05/16/01"]

    # CLI form of the loop runs (real clock; bucket has nothing current)
    assert main(["download-latest-snapshots", "--minutes", "3", "--url-template", url]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["landed"] == 0


def test_cli_run_query_and_sql(spark, capsys):
    import json

    from open_bus_siri_etl_spark.cli import main

    rc = main(
        ["run-query", "global_minmax", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "min_value" in row or len(row) > 0

    rc = main(
        [
            "run-sql",
            "SELECT count(*) AS n FROM documents",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] > 0


def test_cli_export_training_shards(tmp_path):
    from open_bus_siri_etl_spark.cli import main

    out = str(tmp_path / "shards")
    rc = main(
        [
            "export-training-shards",
            "/root/testdata/sf0.001/documents.parquet",
            out,
            "--n-shards",
            "4",
        ]
    )
    assert rc == 0 or rc is None
    import glob

    assert len(glob.glob(f"{out}/shard=*/*.parquet")) == 4


def test_cli_compact_curation_state(spark, tmp_path, capsys):
    """The maintenance verb wraps compact_curation_logs: logs shrink to
    their base partition and the command reports the row stats."""
    import json as _json

    from pyspark.sql import functions as F

    state = tmp_path / "state"
    for name, rows in (
        ("labels", [(1, 10), (2, 20)]),
        ("labels", [(1, 5), (3, 5)]),
    ):
        df = spark.createDataFrame(rows, "doc_id long, component long")
        batch = len(list((state / name).glob("ingest_batch=*"))) if (
            state / name
        ).exists() else 0
        df.withColumn("ingest_batch", F.lit(batch)).write.mode(
            "append"
        ).partitionBy("ingest_batch").parquet(str(state / name))
    surv = spark.createDataFrame(
        [(10, 1, 100, 2, False), (10, None, None, None, True)],
        "component long, kept_doc_id long, kept_n_chars long, "
        "n_members long, deleted boolean",
    )
    surv.withColumn("ingest_batch", F.expr("case when deleted then 1 else 0 end")).write.partitionBy(
        "ingest_batch"
    ).parquet(str(state / "survivors"))

    rc = main(["compact-curation-state", str(state)])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["labels"]["rows_before"] == 4
    assert out["labels"]["rows_after"] == 3
    assert out["survivors"]["rows_after"] == 0  # tombstoned away
    assert len(list((state / "labels").glob("ingest_batch=*"))) == 1
