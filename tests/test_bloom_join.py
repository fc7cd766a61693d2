"""Bloom-prefiltered join: structural no-false-negatives, measured
pruning, the codegen-only plan shape, and FPR-targeted auto-sizing."""

import pytest
from pyspark.sql import functions as F

from open_bus_siri_etl_spark.operators.bloomjoin import (
    bloom_auto_size,
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


def test_bloom_geometry_validated(spark):
    """The ADVICE defect: n_hashes=0 made the probe loop never run and
    return None (an opaque crash inside filter()); n_bits<=0 broke pmod.
    Both must fail loudly at the API boundary."""
    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_bits(dim, "k", n_hashes=0)
    with pytest.raises(ValueError, match="n_bits"):
        bloom_bits(dim, "k", n_bits=0)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_might_contain(F.col("k"), "0101", n_hashes=0)
    with pytest.raises(ValueError, match="target_fpr"):
        bloom_auto_size(dim, "k", target_fpr=0.0)


def _measured_fpr(spark, n_keys, target_fpr, n_probe_misses=20000):
    """Build an auto-sized filter over n_keys disjoint keys, probe it
    with n_probe_misses keys NOT in the set, return the pass fraction."""
    dim = spark.range(0, n_keys).select((F.col("id") * 2).alias("k"))
    n_bits, n_hashes = bloom_auto_size(dim, "k", target_fpr)
    bits = bloom_bits(dim, "k", n_hashes, n_bits)
    misses = spark.range(0, n_probe_misses).select(
        (F.col("id") * 2 + 1).alias("k")  # odd keys: provably absent
    )
    passed = misses.filter(
        bloom_might_contain(F.col("k"), bits, n_hashes)
    ).count()
    return n_bits, n_hashes, passed / n_probe_misses


@pytest.mark.parametrize("n_keys", [500, 50_000])
def test_bloom_auto_size_pins_fpr_across_key_scales(spark, n_keys):
    """The auto-sizer's contract at two key scales two orders apart:
    measured FPR lands within 3x of the 1% target (hash clustering
    slack), where the FIXED 4096-bit default saturates completely at
    the larger scale (~every probe passes)."""
    n_bits, n_hashes, fpr = _measured_fpr(spark, n_keys, target_fpr=0.01)
    assert fpr < 0.03, (n_keys, n_bits, n_hashes, fpr)
    # the auto geometry actually scales with n
    assert n_bits >= n_keys * 4


def test_bloom_fixed_default_saturates_where_auto_holds(spark):
    """Why auto-sizing exists: at 50k keys the 4096-bit default passes
    essentially everything (pruning power gone), while the auto-sized
    set above holds the target."""
    n_keys = 50_000
    dim = spark.range(0, n_keys).select((F.col("id") * 2).alias("k"))
    bits = bloom_bits(dim, "k")  # fixed 4096 / 3
    misses = spark.range(0, 5000).select((F.col("id") * 2 + 1).alias("k"))
    passed = misses.filter(bloom_might_contain(F.col("k"), bits)).count()
    assert passed / 5000 > 0.95


def test_bloom_auto_join_equals_plain_join(spark):
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
                orders, dim, "o_custkey", "c_custkey", target_fpr=0.01
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
