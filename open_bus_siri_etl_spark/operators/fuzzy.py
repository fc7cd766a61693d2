"""Fuzzy (edit-distance) key matching via deletion-neighborhood blocking
(beyond-reference, BASELINE.json north star: entity resolution / key
reconciliation in training-data pipelines).

The naive form is an all-pairs levenshtein — O(|L|·|R|), a non-starter at
scale.  The scalable identity: lev(u, v) <= 1  iff  u == v, or u and v share
a deletion variant at the same position (substitution), or one equals a
deletion variant of the other (insert/delete).  So each side emits its
string plus every single-character-deletion variant tagged with the deleted
position, and candidates come out of a plain hash EQUI-join on the variant
string — input amplification ×(len+1) instead of a cross join, the same
blocking trick the MinHash/SimHash dedups use.  A final exact
``levenshtein() <= 1`` refine guards the (rare) same-variant-different-edit
collisions.  All native expressions — transform/sequence/posexplode and
Spark's built-in levenshtein — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_deletion_variants(df: DataFrame, col: str, prefix: str) -> DataFrame:
    """Explode a string column into (variant, deleted_pos) rows: the string
    itself at pos -1 plus each single-deletion variant at its 0-based
    position."""
    variants = F.expr(
        f"array_union("
        f"  array(struct({col} AS v, -1 AS pos)),"
        f"  transform(sequence(0, length({col}) - 1),"
        f"            i -> struct(concat(substring({col}, 1, i),"
        f"                               substring({col}, i + 2)) AS v,"
        f"                        i AS pos)))"
    )
    return df.select(
        *df.columns, F.explode(variants).alias("_var")
    ).select(
        *df.columns,
        F.col("_var.v").alias(f"{prefix}_v"),
        F.col("_var.pos").alias(f"{prefix}_pos"),
    )


def fuzzy_join_dist1(
    left: DataFrame, right: DataFrame, left_col: str, right_col: str
) -> DataFrame:
    """All (left row, right row) pairs whose key strings are within
    levenshtein distance 1, without ever forming the cross product.

    Candidate rule on the variant join: same deleted position == possible
    substitution; pos -1 on either side == possible insert/delete or exact
    match.  Distinct-ed (one pair can match through several variants) then
    exact-refined.  The equi-join shuffles on variant strings — short keys,
    high cardinality, no skew — and every stage is partial-agg friendly.
    """
    lv = _with_deletion_variants(left, left_col, "l")
    rv = _with_deletion_variants(right, right_col, "r")
    cand = lv.join(
        rv,
        (F.col("l_v") == F.col("r_v"))
        & (
            (F.col("l_pos") == F.col("r_pos"))
            | (F.col("l_pos") == -1)
            | (F.col("r_pos") == -1)
        ),
    )
    pairs = cand.select(*left.columns, *right.columns).distinct()
    return pairs.filter(F.levenshtein(F.col(left_col), F.col(right_col)) <= 1)
