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
from pyspark.sql import types as T


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries summaries, returned as the distinct union
    of surviving candidate keys.

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
    out_schema = T.StructType([T.StructField(field.name, field.dataType)])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # merge the batch's exact counts, then shrink back to capacity
            # by subtracting the (capacity+1)-th largest counter from all
            # (the merge step of mergeable MG summaries)
            for k, c in pdf[key_col].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                sub = vals[capacity]
                counters = {k: v - sub for k, v in counters.items() if v > sub}
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(summarize, schema=out_schema).distinct()


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
