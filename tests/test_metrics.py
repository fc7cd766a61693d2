from pyspark.sql import functions as F

from open_bus_siri_etl_spark.metrics import DebugTime, observed, print_debug_time_stats


def test_debug_time_and_observe(spark, capsys):
    with DebugTime("unit-test-phase"):
        pass
    print_debug_time_stats()
    assert "unit-test-phase" in capsys.readouterr().out

    df = spark.range(100)
    df, obs = observed(df, "m", rows=F.count(F.lit(1)), total=F.sum("id"))
    df.count()
    assert obs.get == {"rows": 100, "total": 4950}
