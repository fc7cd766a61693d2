"""Bloom-prefiltered joins — Spark's runtime-filter pattern made
explicit: before a big⋈small join shuffles the big side, probe each big
row against a compact Bloom bitset built from the small side's keys and
drop the rows that cannot possibly match.

Why this matters at 100 TB: the shuffle writes every surviving big-side
row.  A semi-join prunes too, but costs its own shuffle (or a broadcast
of the FULL key set); the Bloom bitset is fixed-size (``n_bits`` bits —
a few KB regardless of key count), rides the task binary like the
kmeans centroid literals, and the probe is ``n_hashes`` O(1) lookups
inside whole-stage codegen.  Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects exactly
this plan shape when statistics allow; this operator is the explicit,
engine-portable form (and works where the optimizer's thresholds or
missing stats keep the automatic one from firing).

Correctness is STRUCTURAL, not probabilistic: a Bloom filter has no
false negatives (every inserted key set its bits; the probe uses the
same hashes), and false positives are dropped by the real join that
follows — so the result is row-identical to the plain join, which is
exactly what the catalog oracle checks.  The hash family is xxhash64
(JVM-native, vectorized); it never needs cross-engine reproduction
because the oracle never sees the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS_DEFAULT = 4096
BLOOM_HASHES_DEFAULT = 3


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(h)), F.lit(n_bits))
        for h in range(n_hashes)
    ]


def bloom_bits(
    dim: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
    n_bits: int = BLOOM_BITS_DEFAULT,
) -> str:
    """Build the bitset from the small side's keys as a '0'/'1' string of
    length ``n_bits`` — the driver collect is bounded by ``n_bits``
    distinct positions (the bitset size, never the key count)."""
    rows = (
        dim.select(
            F.explode(
                F.array(*_positions(F.col(key_col), n_hashes, n_bits))
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    bits = ["0"] * n_bits
    for r in rows:
        bits[int(r["p"])] = "1"
    return "".join(bits)


def bloom_might_contain(
    key: Column,
    bits: str,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
    n_bits: int | None = None,
) -> Column:
    """``n_hashes`` substring probes into the literal bitset, ANDed — all
    bits set means "might match", any clear bit means "provably no
    match".  Stays in whole-stage codegen: no UDF, no join."""
    n_bits = len(bits) if n_bits is None else n_bits
    probe = None
    for pos in _positions(key, n_hashes, n_bits):
        hit = F.substr(F.lit(bits), pos + 1, F.lit(1)) == "1"
        probe = hit if probe is None else (probe & hit)
    return probe


def bloom_prefiltered_join(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
    n_bits: int = BLOOM_BITS_DEFAULT,
) -> DataFrame:
    """Inner-join ``big`` to ``dim`` with a Bloom pre-filter on the big
    side: rows whose key provably misses ``dim`` never reach the join's
    exchange.  Row-identical to ``big.join(dim, ...)`` by construction
    (no false negatives; false positives die in the join)."""
    bits = bloom_bits(dim, dim_key, n_hashes, n_bits)
    pruned = big.filter(
        bloom_might_contain(F.col(big_key), bits, n_hashes, n_bits)
    )
    return pruned.join(dim, pruned[big_key] == dim[dim_key])
