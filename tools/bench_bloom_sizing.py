"""Bloom auto-sizing evidence (round-12 item 7): measured pass-through
fraction vs dim-side key count, fixed default geometry vs the
FPR-targeted auto-sizer.

The operational claim: ``bloom_prefiltered_join``'s fixed 4096-bit /
3-hash default is tuned for a few hundred keys — at 100 TB the dim
side's key count varies by orders of magnitude, and past a few thousand
keys the fixed bitset saturates (every big-side row passes, the
pre-filter prunes nothing and the shuffle pays full freight).
``bloom_auto_size`` derives (n_bits, n_hashes) from an
``approx_count_distinct`` of the keys at a target FPR, clamped to the
literal-size budget (BLOOM_AUTO_MAX_BITS) with the hash count re-derived
at the clamp.

Per key-count row: the fixed default's measured false-positive rate, the
auto geometry, its measured FPR, and the bitset's literal size in KiB
(what every task binary carries).  Probes are disjoint-by-construction
keys (evens in the set, odds probed), so every pass is a false positive.

Writes one JSON line (and BENCH_BLOOM_SIZING.json with --write).
Run: python tools/bench_bloom_sizing.py [--write]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from open_bus_siri_etl_spark.operators.bloomjoin import (  # noqa: E402
    BLOOM_AUTO_MAX_BITS,
    bloom_auto_size,
    bloom_bits,
    bloom_might_contain,
)
from open_bus_siri_etl_spark.session import get_spark  # noqa: E402

KEY_COUNTS = [500, 5_000, 50_000, 500_000]
N_PROBES = 50_000
TARGET_FPR = 0.01


def main() -> None:
    spark = get_spark(app_name="siri-etl-bench-bloom-sizing")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n_keys in KEY_COUNTS:
        dim = spark.range(0, n_keys).select((F.col("id") * 2).alias("k"))
        misses = spark.range(0, N_PROBES).select(
            (F.col("id") * 2 + 1).alias("k")
        )

        def fpr(bits: str, n_hashes: int) -> float:
            passed = misses.filter(
                bloom_might_contain(F.col("k"), bits, n_hashes)
            ).count()
            return round(passed / N_PROBES, 4)

        fixed_fpr = fpr(bloom_bits(dim, "k"), 3)
        n_bits, n_hashes = bloom_auto_size(dim, "k", TARGET_FPR)
        auto_fpr = fpr(bloom_bits(dim, "k", n_hashes, n_bits), n_hashes)
        rows.append(
            {
                "n_keys": n_keys,
                "fixed_4096_fpr": fixed_fpr,
                "auto_n_bits": n_bits,
                "auto_n_hashes": n_hashes,
                "auto_bitset_kib": round(n_bits / 8192, 1),
                "auto_fpr": auto_fpr,
                "auto_clamped": n_bits == BLOOM_AUTO_MAX_BITS,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    out = {
        "metric": "bloom_auto_size_fpr_vs_fixed_default",
        "value": rows[-1]["auto_fpr"],
        "unit": "false_positive_rate",
        "target_fpr": TARGET_FPR,
        "n_probes": N_PROBES,
        "max_bits": BLOOM_AUTO_MAX_BITS,
        "rows": rows,
    }
    print(json.dumps(out))
    if "--write" in sys.argv:
        (ROOT / "BENCH_BLOOM_SIZING.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )


if __name__ == "__main__":
    main()
