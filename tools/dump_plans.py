"""Regenerate PLANS.md: the formatted physical plans of the scale-critical
catalog queries, with the property each plan is expected to exhibit.

The plan-quality tests (tests/test_plan_quality.py) assert these properties
mechanically; this artifact exists so a reviewer can read the actual plans
without running Spark.  Run: python tools/dump_plans.py  (writes PLANS.md
at the repo root; sf0.001 inputs — plan shape, not timing).
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF = "/root/testdata/sf0.001"
MAX_LINES = 90

# query → the property a reviewer should check in the plan
SHOWCASE = {
    "flagship_snowflake": "filters pushed to the parquet scans; nation/region"
    " broadcast; lineitem scan pruned to 3 columns; one shuffle for the agg",
    "pricing_summary": "partial_sum before the exchange (map-side combine);"
    " shipdate filter in PushedFilters",
    "dim_upsert_novelty": "get-or-create as LEFT ANTI join on the 8-byte"
    " surrogate id",
    "asof_join_prior_view": "as-of join with NO nested-loop/cartesian —"
    " union + carry-forward window, one shuffle",
    "revenue_deciles_distributed": "global ntile with ONE balanced range"
    " exchange on the data; the only SinglePartition exchange feeds the"
    " P-row offsets window",
    "cube_orders": "4 grains from one scan via Expand, partial agg after"
    " the expand",
    "session_window_agg": "native session_window: one shuffle on user_id,"
    " per-key linear merge",
    "minhash_lsh_dedup": "signature explode repartitioned before the"
    " amplification; band buckets become an equi-join",
    "embedding_ivf_ann": "probe join is a hash join against the bucketed"
    " corpus, not a cross join",
    "salted_skew_join": "hot key spread over salt buckets; small side"
    " replicated via explode before the join",
    "forward_fill_value": "one hash exchange on user_id; the running"
    " last(ignorenulls) frame is a single sorted pass per partition —"
    " no per-row re-scan, no single-partition exchange",
    "hopping_window_agg": "Expand doubles rows BEFORE the shuffle, but"
    " partial_count/partial_sum fold them to per-(window,type) state, so"
    " the exchange carries aggregated state, not 2x the events",
    "top_customers_per_nation": "orders aggregated BEFORE the dim joins"
    " (shuffle carries one row per customer); nation broadcast; the rank"
    " window partitions by nation — no single-partition exchange",
    "late_shipment_priority": "correlated EXISTS as LeftSemi with the"
    " non-equi date residual riding the orderkey equi pair; tiny-domain"
    " agg is map-side partial",
    "sequence_packing": "concat-chunk packing is ONE window shuffle on"
    " stream; tokenization fused into the scan projection, no Python",
    "sequence_packing_greedy": "one hash shuffle to streams feeding the"
    " per-stream Arrow group processor (FlatMapGroupsInPandas) — the only"
    " non-window-expressible step, parallel across streams",
    "pii_scrub": "ZERO exchanges: seeding, redaction, counting and the md5"
    " signature all fuse into the scan projection",
    "bm25_rank": "corpus stats (N, avgdl, dfs) are one 1-row aggregate"
    " broadcast back via BroadcastNestedLoopJoin; the document set never"
    " hash-shuffles; TopK is TakeOrderedAndProject",
    "fuzzy_join_dist1": "deletion-neighborhood blocking: candidates come"
    " from an EQUI-join on variant strings (never CartesianProduct /"
    " BroadcastNestedLoopJoin), exact levenshtein refine on candidates only",
    "tpch_q18_large_customers": "HAVING subquery planned as LeftSemi join"
    " of the tiny survivor set; both lineitem passes map-side partial-agg",
    "tpch_q6_forecast_revenue": "ALL three predicates (shipdate range,"
    " discount band, quantity cap) in PushedFilters; scan reads exactly 4"
    " columns; no join, one partial+final agg pair",
    "tpch_q19_disjunctive_revenue": "the cross-table OR-of-ANDs can't push"
    " whole, but Catalyst derives the per-table implications: quantity"
    " Or-range into the lineitem scan, brand/size Or-tree into the part"
    " scan, residual evaluated after the broadcast join",
    "tpch_q22_dormant_customers": "above-average-balance threshold stays"
    " in-plan as a one-row broadcast; dormancy is LeftAnti against the"
    " date-pruned orders scan",
    "gopher_quality_filter": "quality rules are ONE tokenization +"
    " higher-order array ops: zero exchanges, whole-stage codegen, no"
    " Python",
    "repeated_ngram_spans": "the 8-gram explode (Generate) sits directly"
    " over the scan — no shuffle until the gram groupBy, whose key is tens"
    " of bytes regardless of document size",
    "embedding_quantize_int8": "int8 quantization fuses into the scan:"
    " zero exchanges, no Python — parquet-scan-speed at any SF",
    "tpch_q21_waiting_suppliers": "the EXISTS/NOT-EXISTS pair is ONE"
    " per-order distinct-count aggregate rejoined to the late lines:"
    " lineitem appears at most twice, no nested-loop join",
    "tpch_q2_min_cost_supplier": "correlated min-per-part as a window over"
    " the broadcast-joined eligible set; the supply aggregation runs once",
    "hll_distinct_users": "registers via a 256-group partial_max aggregate"
    " — NO distinct shuffle of the raw keys (the point of the sketch)",
    "triangle_count": "degree-oriented wedges closed with LeftSemi against"
    " the canonical edge set; no cartesian product anywhere",
    "pagerank_error_graph": "3 BSP iterations: edges join ranks on the"
    " vertex key, partial_sum before each vertex shuffle; degree rides the"
    " edge list, joined once",
    "zorder_layout_tiles": "Morton index is pure projection arithmetic:"
    " one scan, one combined aggregate, zero joins",
    "bpe_pair_counts": "pair explode collapsed map-side (partial_count on"
    " the bigram key); top-50 is TakeOrderedAndProject",
    "cohort_retention": "cohort derivation and rejoin share the user_id"
    " shuffle key; count-distinct expands to a two-level aggregate",
    "embedding_lsh_candidates": "integer-quantized LSH bucketing fused into"
    " one scan; candidates from an equi-join on (tbl, bucket), no cartesian",
    "embedding_lsh_ann": "full ANN pipeline UDF-free: quantized bucketing"
    " per side, (tbl, bucket) equi-join with the query side broadcast,"
    " vectors re-attached by id, per-query top-k window — no cartesian",
    "join_key_skew_report": "hot-key diagnostic: map-combinable per-key agg,"
    " top-5 via TakeOrderedAndProject, 1-row total broadcast — no global"
    " sort, no single-partition exchange",
    "windowed_event_dedup": "suppression window partitioned by the dedup key"
    " (high-cardinality lag), filter fused after — one shuffle total",
    "semantic_dedup_pairs": "centroid assignment against the broadcast"
    " codebook; pair search is an equi-join on cluster, never corpus x corpus",
    "ann_recall_eval": "two deterministic neighbor lists joined per query;"
    " nothing wider than the k-row lists crosses a shuffle",
    "vocab_coverage": "top-64 vocab via TakeOrdered, broadcast to the"
    " coverage join; per-doc work map-only",
    "funnel_conversion": "one conditional-min pass over events (single scan),"
    " 3-row stacked output",
    "pq_codes": "subspace distances against the broadcast codebook; per-"
    "subspace argmin windows keyed by vec_id, no cartesian",
    "pq_adc_topk": "corpus as PQ codes joined to the broadcast per-query"
    " distance table; approximate distance is table lookups, no per-pair"
    " vector math",
    "paragraph_dedup": "paragraph explode + md5-keyed frequency aggregate,"
    " map-side combined; rejoin on the hash",
    "linear_interpolate_value": "two frames over ONE user_id exchange"
    " (running last + reversed running first), streaming scalar state",
    "time_weighted_average": "keyed lead() window then map-side-combinable"
    " sum-of-products — one exchange total",
    "neardup_survivors": "argmax per dup-cluster: per-component max +"
    " equi-rejoin, both map-side combinable; no window over raw docs",
    "jaccard_delta_pairs": "per-ingest pair generation: delta postings"
    " BROADCAST against one streaming pass of the persisted posting index"
    " (params/NULL/disjointness guards ride the scan); within-delta pairs"
    " from the tiny broadcast self-join — history never re-shingled",
    "neardup_components_delta": "incremental clustering: the contraction's"
    " label map is semi-shrunk to the delta-pair endpoint id set BEFORE"
    " broadcasting (labels stream through a LeftSemi, never a full-corpus"
    " BroadcastExchange); min-label CC runs on the delta-sized contracted"
    " graph only",
    "neardup_survivors_delta": "incremental survivor selection: untouched"
    " components pass through a broadcast LeftAnti with NO exchange; the"
    " only shuffle is the delta-plus-touched-sized merge-argmax (survivor"
    " rows are a sufficient statistic — history docs never rescanned)",
    "ivf_pq_topk": "IVF-PQ serving: probe and ADC lookups are broadcast"
    " hash joins (query-sized sides); the only nested-loop joins are"
    " against the tiny codebook; scored candidates are code rows, never"
    " per-pair vector math",
    "ivf_pq_residual_topk": "residual IVF-PQ (trained quantizers): the"
    " per-cluster re-centered ADC table broadcasts; the lookup join"
    " carries (query, cluster, m, code); still no per-pair vector math —"
    " vector folds appear only against codebook-sized frames",
    "ivf_pq_refine_topk": "exact-refine stage: the shortlist (|Q| x 20"
    " ids) reaches the corpus through a broadcast hash join — one pruned"
    " corpus scan, never a corpus shuffle or cross join",
    "sq8_ivf_topk": "IVF-SQ8: the index arm carries (id, cluster, codes)"
    " ONLY — no float vector column past the encode; probe side"
    " broadcast; decode + distance are transform/zip_with expressions in"
    " codegen, no Python anywhere",
    "bloom_prefiltered_join": "the Bloom probe (3 xxhash64 substring"
    " lookups, a literal bitset) sits as a Filter BELOW the join's"
    " exchange — non-candidate rows never shuffle; no UDF, no extra"
    " join for the filter",
    "sq8_refine_topk": "SQ8 + exact refine: everything upstream of the"
    " refine is the codes-only SQ8 serve (no corpus floats); the refine"
    " is ONE broadcast of the |Q| x 20 shortlist ids against a"
    " pruned-column corpus scan — never a corpus shuffle",
    "ivf_pq_balanced_residual_topk": "balanced+residual+refine stack:"
    " coarse probe on UNPERMUTED vectors (broadcast), permuted-residual"
    " codes joined to the broadcast per-(query,cluster) distance table,"
    " refine as one broadcast float read; the permutation is a map-only"
    " array gather — no extra shuffle anywhere",
    "chunk_then_pack": "fused chunk->pack: map-only chunking (split +"
    " sequence + slice + one posexplode, NO shuffle) then exactly one"
    " Exchange — (doc_id, chunk_id, n_tokens) triples hashed to stream"
    " tasks for the applyInPandas pack; chunk_text never enters the"
    " exchange",
    "pack_with_text": "chunk_then_pack + text re-materialization: the"
    " packed INT-TRIPLE side broadcasts into a map-side hash join"
    " against the map-only re-derived chunk relation — still exactly one"
    " (int-only) Exchange; the heavy text column never shuffles",
    "contamination_lsh": "banded contamination screen: train side signed"
    " to 8 band keys/doc, eval band-key index + eval postings BROADCAST,"
    " candidates restricted via LeftSemi before the exact-overlap count"
    " — no shingle-keyed shuffle of the train corpus anywhere",
}


def main() -> None:
    from open_bus_siri_etl_spark.plans.catalog import REGISTRY
    from open_bus_siri_etl_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    out = [
        "# PLANS — physical plans of the scale-critical queries",
        "",
        "Auto-generated by `tools/dump_plans.py` (sf0.001 inputs; plan shape,",
        "not timings).  Each section states the property the plan must",
        "exhibit; `tests/test_plan_quality.py` asserts the same properties",
        "mechanically on every run.",
        "",
    ]
    for name, prop in SHOWCASE.items():
        df = REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # giant literal operands (the bloom bitset, broadcast centroid
        # arrays) are noise for a human plan review — elide mid-line
        lines = [
            ln if len(ln) <= 400 else ln[:400] + " ... [literal elided]"
            for ln in plan.rstrip().splitlines()
        ]
        if len(lines) > MAX_LINES:
            lines = lines[:MAX_LINES] + [
                f"... ({len(plan.splitlines()) - MAX_LINES} detail lines omitted)"
            ]
        out += [f"## {name}", "", f"**Expected:** {prop}", "", "```"]
        out += lines
        out += ["```", ""]
    (ROOT / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
