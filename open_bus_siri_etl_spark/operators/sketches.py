"""Mergeable frequency-sketch operators (beyond-reference, training-data
surface): bounded-memory candidate generation for heavy-hitter queries.

The reference never needs sketches (Postgres GROUP BY over ~10^4 keys); a
100 TB corpus with 10^10 distinct keys does — a plain groupBy's hash-agg
state is key-cardinality-sized, while a Misra-Gries pass keeps a constant
``capacity`` counters per partition and never shuffles.  The companion
count-min sketch lives in plans/catalog.py (countmin_user_counts) where its
md5-derived hashes make it oracle-exact.

Design: sketch-prune-then-recount.  The sketch only PRUNES the key space to
a candidate set with a one-sided guarantee (no false negatives above the
frequency threshold); an exact recount over the candidates then produces
exact answers.  The final result is therefore independent of partitioning
and batch order — which is what makes it oracle-comparable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_candidates(
    df: DataFrame,
    key_col: str,
    capacity: int = 256,
    distinct: bool = True,
    emit_part_rows: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries summaries, returned as the distinct union
    of surviving candidate keys.

    ``distinct=False`` (r14, guide §2.4): skip the cross-partition
    ``.distinct()`` — an Exchange + two HashAggregates that consumers
    joining candidates as a broadcast LEFT SEMI build side never needed
    (duplicate build keys cannot change a semi join).  The union-with-
    duplicates still satisfies the no-false-negative guarantee verbatim.

    ``emit_part_rows=True`` (r14, guide §1.2 "don't compute things
    twice"): each non-empty partition additionally reports its row count
    — one leading (key=NULL, _part_rows=n_p) row, candidates carry 0 —
    so the global N = sum(_part_rows) rides the SAME single pass instead
    of a second full scan.  The NULL key is inert in a semi join (NULL
    never equals) and carries no counter semantics.

    Guarantee (mergeable-summaries form, Agarwal et al. 2012): within a
    partition of n_p rows the summary undercounts any key by at most
    n_p/(capacity+1), so every key with partition count > n_p/capacity
    survives with a positive counter.  Summing over partitions, any key
    with GLOBAL count > N/capacity must beat the per-partition threshold in
    at least one partition (pigeonhole over Σ n_p), hence appears in the
    union.  The sketch never decides — callers exact-recount the candidates
    (catalog.heavy_hitters_mg) so the final answer is exact and
    partition-independent.

    Scale: one partition-local Arrow pass (mapInPandas), zero shuffle, at
    most ``capacity`` keys emitted per partition.  Downstream aggregation
    state is candidate-sized instead of key-cardinality-sized.
    """
    field = df.schema[key_col]
    fields = [T.StructField(field.name, field.dataType)]
    if emit_part_rows:
        fields.append(T.StructField("_part_rows", T.LongType()))
    out_schema = T.StructType(fields)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            # merge the batch's exact counts, then shrink back to capacity
            # by subtracting the (capacity+1)-th largest counter from all
            # (the merge step of mergeable MG summaries)
            n_rows += len(pdf)
            for k, c in pdf[key_col].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                sub = vals[capacity]
                counters = {k: v - sub for k, v in counters.items() if v > sub}
        if emit_part_rows:
            # a shrink can legitimately empty the summary (all counters tied
            # at the subtrahend) while n_p > 0, so the row count must not
            # piggyback on a candidate row
            if n_rows:
                yield pd.DataFrame(
                    {
                        key_col: [None] + list(counters.keys()),
                        "_part_rows": [n_rows] + [0] * len(counters),
                    }
                )
        else:
            yield pd.DataFrame({key_col: list(counters.keys())})

    out = df.select(key_col).mapInPandas(summarize, schema=out_schema)
    return out.distinct() if distinct else out


def histogram_bins(
    df: DataFrame, col: str, width: float = 4.0, n_bins: int = 128
) -> DataFrame:
    """Fixed equi-width histogram: the mergeable quantile-sketch structure
    (plans/catalog.py ``histogram_quantile_sketch`` estimates quantiles
    from it).

    Returns (bin, c).  Mergeable by construction: the histogram of a union
    is the element-wise sum of the parts' histograms (``merge_histograms``)
    — shards/executors combine without touching raw rows again, which is
    the property that lets 100 TB of per-file sketches collapse into one
    128-long vector.  Use a power-of-two ``width`` to keep the binning
    division exact in IEEE (engine-identical).
    """
    from pyspark.sql import functions as F

    return df.groupBy(
        F.least(F.floor(F.col(col) / width), F.lit(n_bins - 1))
        .cast("bigint")
        .alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Element-wise add of fixed-bin histograms (the sketch merge)."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(lambda a, b: a.unionAll(b), hists)
    return u.groupBy("bin").agg(F.sum("c").alias("c"))


# -- production sketch APIs (no self-audit columns) -------------------------
#
# The catalog entries that oracle these sketches carry an exact-comparison
# column (true_distinct / true_count) so DuckDB can verify the estimate —
# but computing the exact answer alongside the sketch defeats its purpose at
# 100 TB.  These functions are the production entry points: sketch only.
# The catalog entries delegate here and join the audit column on top, so the
# oracle contract and the library path share one implementation.


def _md5_bigint(col, start: int, length: int):
    """Top ``length`` hex chars of md5 as BIGINT — the deterministic hash
    family every sketch here uses (reproducible in any engine with md5)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), start, length), 16, 10
    ).cast("bigint")


def hll_estimate(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """HyperLogLog distinct-count estimate, p=8 (256 registers), optionally
    per group.  Output: group_cols + (n_filled, est_distinct) — NO exact
    audit column (see module note above).

    Scale shape: groupBy(bucket).max() — map-side partial max, then a
    256-row (x |groups|) shuffle; registers merge across shards by
    element-wise max.  52-bit md5 hash; rho via exact integer string math
    (45 - length(bin(w))); register sum adds multiples of 2^-45 bounded in
    magnitude so the double is order-independent.
    """
    g = list(group_cols or [])
    hv = _md5_bigint(F.col(key_col), 1, 13)
    br = df.select(*g, hv.alias("hv")).select(
        *g,
        (F.col("hv") % 256).alias("bucket"),
        F.when(F.expr("hv div 256") == 0, F.lit(45))
        .otherwise(F.lit(45) - F.length(F.bin(F.expr("hv div 256"))))
        .cast("int")
        .alias("rho"),
    )
    regs = br.groupBy(*g, "bucket").agg(F.max("rho").alias("m_j"))
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
    s = regs.groupBy(*g).agg(
        F.count(F.lit(1)).alias("v_filled"),
        (F.sum(F.pow(F.lit(2.0), -F.col("m_j"))) + (256 - F.count(F.lit(1)))).alias(
            "sum_pow"
        ),
    )
    raw = alpha * F.lit(65536.0) / F.col("sum_pow")
    return s.select(
        *g,
        F.col("v_filled").cast("bigint").alias("n_filled"),
        F.round(raw, 6).alias("raw_est"),
        F.when(
            (raw <= 640.0) & (F.col("v_filled") < 256),
            F.round(F.lit(256.0) * F.log(F.lit(256.0) / (256 - F.col("v_filled"))), 6),
        )
        .otherwise(F.round(raw, 6))
        .alias("est_distinct"),
    )


def countmin_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """(key, est_count) from a depth x width count-min sketch with
    md5-derived hash rows.  The counters are depth*width cells of
    map-side-combinable state — kilobytes across the shuffle regardless of
    input size — then a broadcast lookup; est >= true (one-sided error)."""
    spark = df.sparkSession
    hashed = df.select(key_col).crossJoin(
        spark.range(depth).select(F.col("id").cast("int").alias("d"))
    ).select(
        key_col,
        "d",
        F.pmod(
            _md5_bigint(
                F.concat_ws("-", F.col("d").cast("string"), F.col(key_col)), 1, 8
            ),
            F.lit(width),
        ).alias("b"),
    )
    counters = hashed.groupBy("d", "b").agg(F.count(F.lit(1)).alias("c"))
    keys = hashed.distinct()
    return (
        keys.join(F.broadcast(counters), ["d", "b"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_count"))
    )


def kmv_estimate(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """KMV (k-minimum-values) distinct estimate: keep the k smallest 60-bit
    md5 hashes (TakeOrdered — k values per partition, merged on the
    driver), |D| ~= (k-1) * 2^60 / h_(k).  Mergeable: union the KMV sets,
    take the k smallest.  Output: one row (k, kth_min_hash, est_distinct).
    """
    h = df.select(_md5_bigint(F.col(key_col), 1, 15).alias("hv")).distinct()
    kmin = h.orderBy("hv").limit(k)
    n_ret = F.count(F.lit(1))
    return kmin.agg(
        F.lit(k).cast("int").alias("k"),
        F.max("hv").alias("kth_min_hash"),
        # fewer than k distinct hashes retained -> the sketch HOLDS the
        # whole set, so the exact size is the estimate (the standard KMV
        # small-set rule; the ratio formula would wildly overshoot)
        F.when(n_ret < k, n_ret.cast("double"))
        .otherwise(
            F.round(
                F.lit(float((k - 1) * (1 << 60))) / F.max("hv").cast("double"), 6
            )
        )
        .alias("est_distinct"),
    )


def bloom_prune(
    build: DataFrame, probe: DataFrame, key_col: str, n_bits: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Probe-side keys surviving a hand-built Bloom filter of the build
    side's keys (depth md5-derived positions into n_bits): the ~n_bits/8
    BYTE bitset broadcasts to every probe task and drops most non-matching
    rows BEFORE any shuffle.  One-sided: every build key survives; output
    is the surviving probe keys (production shape — feed it to the join)."""
    spark = build.sparkSession

    def bits(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(spark.range(depth).select(F.col("id").cast("int").alias("d")))
            .select(
                key_col,
                F.pmod(
                    _md5_bigint(
                        F.concat_ws("#", F.col("d").cast("string"), F.col(key_col)),
                        1,
                        8,
                    ),
                    F.lit(n_bits),
                ).alias("bit"),
            )
            .distinct()
        )

    build_bits = bits(build.select(key_col).distinct()).select("bit").distinct()
    probe_bits = bits(probe.select(key_col).distinct())
    need = probe_bits.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_bits"))
    hit = (
        probe_bits.join(F.broadcast(build_bits), "bit")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        need.join(hit, key_col)
        .filter(F.col("n_hit") == F.col("n_bits"))
        .select(key_col)
    )
