"""Skew-mitigation operators: salted joins and two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  These explicit variants
cover the cases AQE can't fix:

- ``salted_join``: a shuffle join where ONE key dominates (a hot stop, a
  null-ish default key).  AQE can split the oversized partition of the big
  side, but every split still needs the same build rows; replicating the
  small side across ``salt`` buckets spreads the hot key over ``salt``
  tasks deterministically.
- ``salted_agg_count``: high-cardinality-skewed groupBy where one group
  overwhelms a task even after partial aggregation (e.g. counting by a key
  with a 99% default value).  Stage 1 aggregates (key, salt), stage 2 merges
  per key — the classic two-stage combine.

Both are result-identical to their unsalted forms (verified against the
plain-SQL oracle in the catalog), so callers can switch them in purely on
skew evidence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    big gains a random-but-deterministic salt bucket per row (hash of the
    whole row modulo ``salt`` — no RNG, so retries/replays stay consistent);
    small is exploded ×salt.  The join key becomes (on..., _salt), spreading
    any hot key across ``salt`` shuffle partitions.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return big_salted.join(small_replicated, on=[*on, "_salt"], how=how).drop("_salt")


def salted_agg_count(
    df: DataFrame, key_cols: list[str], salt: int = 16
) -> DataFrame:
    """groupBy(key).count() as a two-stage salted aggregation.

    Stage 1 shuffles on (key, salt) — the hot key's rows land in ``salt``
    different tasks; stage 2 merges the ``salt`` partial counts per key.
    Output: key_cols + ``n``.
    """
    stage1 = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
        )
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return stage1.groupBy(*key_cols).agg(F.sum("_partial").alias("n"))
