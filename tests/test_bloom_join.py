"""Bloom-prefiltered join: structural no-false-negatives, measured
pruning, and the codegen-only plan shape."""

from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.bloomjoin import (
    bloom_bits,
    bloom_might_contain,
    bloom_prefiltered_join,
)

SF = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    """Every key actually present in the dim passes the probe — the
    structural property the exact-join equivalence rests on."""
    dim = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    bits = bloom_bits(dim, "k")
    missed = dim.filter(~bloom_might_contain(F.col("k"), bits)).count()
    assert missed == 0


def test_bloom_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    dim = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_nationkey") == 7)
        .select("c_custkey", "c_name")
    )
    via_bloom = sorted(
        map(
            tuple,
            bloom_prefiltered_join(
                orders, dim, "o_custkey", "c_custkey"
            ).select("o_orderkey", "c_name").collect(),
        )
    )
    plain = sorted(
        map(
            tuple,
            orders.join(dim, orders.o_custkey == dim.c_custkey)
            .select("o_orderkey", "c_name")
            .collect(),
        )
    )
    assert via_bloom == plain


def test_bloom_filter_prunes_most_nonmatches(spark):
    """The point of the pattern: the pre-filter passes all matches plus
    only a small false-positive fraction of the rest.  At 4096 bits / 3
    hashes over ~60 keys the theoretical fp rate is well under 1%; allow
    10% slack for hash clustering."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey")
    dim = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_nationkey") == 7)
        .select("c_custkey")
    )
    bits = bloom_bits(dim, "c_custkey")
    passed = orders.filter(
        bloom_might_contain(F.col("o_custkey"), bits)
    ).count()
    matches = orders.join(
        dim, orders.o_custkey == dim.c_custkey, "left_semi"
    ).count()
    total = orders.count()
    assert passed >= matches  # no false negatives at row level
    fp = (passed - matches) / max(1, total - matches)
    assert fp < 0.10, (passed, matches, total)


def test_bloom_probe_stays_in_codegen(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey")
    dim = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_nationkey") == 7)
        .select("c_custkey")
    )
    out = bloom_prefiltered_join(orders, dim, "o_custkey", "c_custkey")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "xxhash64" in plan  # the probe is a plain codegen expression
