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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS_DEFAULT = 4096
BLOOM_HASHES_DEFAULT = 3

# Auto-sizing cap: the bitset rides the plan as a string literal, so its
# size is paid in every task binary — 2^22 bits is a 512 KiB constant,
# about the broadcast budget of a small dim table and far below the
# point where shipping the literal costs more than the shuffle rows it
# prunes.  Beyond the cap the sizer keeps the cap and re-derives the
# hash count for the degraded bits-per-key ratio (FPR rises smoothly;
# correctness is unaffected — false positives die in the real join).
BLOOM_AUTO_MAX_BITS = 1 << 22


def _validate_bloom_geometry(n_hashes: int, n_bits: int) -> None:
    """Shared guard: a zero-hash probe never runs its AND loop and
    returns None (an opaque crash inside filter()), and a non-positive
    bitset makes pmod misbehave — fail at the API boundary instead."""
    if n_hashes < 1:
        raise ValueError(
            f"bloom filter needs n_hashes >= 1, got {n_hashes} — a "
            "0-hash probe tests nothing and returns NULL inside filter()"
        )
    if n_bits < 1:
        raise ValueError(f"bloom filter needs n_bits >= 1, got {n_bits}")


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(h)), F.lit(n_bits))
        for h in range(n_hashes)
    ]


def bloom_auto_size(
    dim: DataFrame,
    key_col: str,
    target_fpr: float = 0.01,
    max_bits: int = BLOOM_AUTO_MAX_BITS,
) -> tuple[int, int]:
    """Size (n_bits, n_hashes) for a target false-positive rate from a
    cheap ``approx_count_distinct`` of the dim side's keys — the missing
    knob at 100 TB, where "the small side" spans orders of magnitude and
    a fixed 4096-bit set saturates (every probe passes) the moment the
    key count crosses a few thousand.

    Standard Bloom calculus: ``m = -n ln p / (ln 2)^2`` bits and
    ``k = (m / n) ln 2`` hashes minimize FPR at the target; both are
    derived from the approximate distinct count (±~2% — amply good, the
    FPR curve is flat in n around the optimum).  ``m`` is clamped to
    ``max_bits`` (the literal-size budget; see BLOOM_AUTO_MAX_BITS) and
    ``k`` is re-derived AFTER clamping so an over-cap dim side degrades
    to the best achievable FPR at the cap instead of a mis-tuned one.
    Returns geometry only — feed it to ``bloom_prefiltered_join``;
    measured pass-through fractions vs key count are pinned in
    tests/test_bloom_join.py and BENCH_BLOOM_SIZING.json.
    """
    if not (0.0 < target_fpr < 1.0):
        raise ValueError(
            f"bloom_auto_size: target_fpr must be in (0, 1), got {target_fpr}"
        )
    n_keys = max(
        1,
        int(
            dim.agg(
                F.approx_count_distinct(key_col).alias("n")
            ).first()["n"]
        ),
    )
    ln2 = math.log(2.0)
    m = math.ceil(-n_keys * math.log(target_fpr) / (ln2 * ln2))
    n_bits = max(64, min(int(m), int(max_bits)))
    n_hashes = max(1, round((n_bits / n_keys) * ln2))
    return n_bits, n_hashes


def bloom_bits(
    dim: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
    n_bits: int = BLOOM_BITS_DEFAULT,
) -> str:
    """Build the bitset from the small side's keys as a '0'/'1' string of
    length ``n_bits`` — the driver collect is bounded by ``n_bits``
    distinct positions (the bitset size, never the key count)."""
    _validate_bloom_geometry(n_hashes, n_bits)
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
    _validate_bloom_geometry(n_hashes, n_bits)
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
    target_fpr: float | None = None,
) -> DataFrame:
    """Inner-join ``big`` to ``dim`` with a Bloom pre-filter on the big
    side: rows whose key provably misses ``dim`` never reach the join's
    exchange.  Row-identical to ``big.join(dim, ...)`` by construction
    (no false negatives; false positives die in the join).

    Pass ``target_fpr`` to AUTO-SIZE the bitset from an
    ``approx_count_distinct`` of the dim keys (``bloom_auto_size``)
    instead of the fixed defaults — the right call whenever the dim
    side's key count is not known to sit near the few-hundred-key regime
    the 4096-bit default is tuned for.

    Output columns: ``big``'s columns then ``dim``'s minus ``dim_key``
    (on an inner equi-join the dim key duplicates ``big_key``
    value-for-value — the r11 both-keys wart, fixed r12)."""
    if target_fpr is not None:
        n_bits, n_hashes = bloom_auto_size(dim, dim_key, target_fpr)
    bits = bloom_bits(dim, dim_key, n_hashes, n_bits)
    pruned = big.filter(
        bloom_might_contain(F.col(big_key), bits, n_hashes, n_bits)
    )
    return pruned.join(dim, pruned[big_key] == dim[dim_key]).drop(
        dim[dim_key]
    )
