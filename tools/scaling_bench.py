"""Round-7 scaling proof (r6 verdict item 1): run the most
expensive registered queries at THREE scale points —
sf0.01 / sf0.1 (driver testdata) / sf~1 (tools/make_scale_data.py,
10x sf0.1 by key-remapped replication) — and publish per-query
wall times plus the measured log-log scaling exponent over the
top decade (exp = log10(t_sf1 / t_sf0.1); 1.0 = linear, the
sf0.01→sf0.1 exponent is reported too but is fixed-cost-dominated
at these sizes).

Conventions match bench.py: one Spark session, queries forced
end-to-end through the noop sink, gate-map materializations
amortize across the suite in a FIXED query order (cold index/gate
builds land on the first query that touches them — the same
amortization position the bench documents; keep-list cold cost is
carried separately there).

Two extra non-registry arms measure the documented nlist scale
path: the KNN-graph build with the FIXED 16-seed quantizer
(in-cell candidate work grows ~quadratically when nlist is pinned
— the honest cost of freezing index constants across a 100x
corpus) vs nlist scaled ∝ corpus (the production rule
ops_scale_sizing_plan encodes), which restores ~linear cost.

Writes SCALING_r7.json. Usage:
  python tools/make_scale_data.py           # once
  python tools/scaling_bench.py [out.json]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

SF_POINTS = [
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf1", "/root/repo/scale_data/sf1", 1.0),
]

# the bench's most expensive queries + the round-7 rewrites, in a
# fixed order (gate-map amortization position is stable)
SCALING_QUERIES = [
    # TPC-H / relational
    "q1_pricing_summary",
    "q9_product_profit",
    "q18_large_volume_customers",
    "supplier_revenue_pareto",
    "part_edit_distance_join",
    # CDC
    "cdc_latest_state",
    "cdc_sessionize",
    "cdc_dedup_exactly_once",
    "asof_order_event",
    # events
    "events_funnel",
    "events_markov_attribution",
    # customer marts (r7 band-prefix rewrites)
    "customer_rfm_segments",
    "customer_segment_migration",
    # text quality
    "text_c4_filters",
    "text_gopher_rules",
    "text_bm25_topk",
    "pack_sequences",
    # text dedup: LSH deployment path vs exact oracle twins
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_ppjoin_exact",
    "dedup_lsh_tuning",
    "corpus_keep_list_v4_lsh",
    "corpus_keep_list_v7_lsh",
    # embeddings / ANN
    "embed_near_dup_lsh",
    "embed_keep_list",
    "semdedup_cells",
    "ann_ivf_kmeans",
    "embed_pq_codes",
    "ann_pq_rerank_topk",
    "ann_ivfpq_residual_topk",
    "graph_pagerank_knn",
    "embed_lof_outliers",
    # multimodal
    "mm_phash_near_dup",
    "mm_cdc_chunk_dedup",
    # intentionally-quadratic exact oracle twin, LAST so its cost
    # sits at the end of each point's pass (the LSH-vs-exact
    # crossover measurement)
    "corpus_keep_list_v4",
]


def _extra_arms():
    import math as _m

    from aurora_cdc_demo_spark.operators import similarity as _sim

    def fixed_nlist(spark, sf_dir):
        return _sim.knn_graph(spark, sf_dir, n_seeds=_sim.N_SEEDS)

    def scaled_nlist(spark, sf_dir, sf):
        n = max(_sim.N_SEEDS, int(round(_sim.N_SEEDS * sf / 0.1)))
        return _sim.knn_graph(spark, sf_dir, n_seeds=n)

    def scaled_bits(spark, sf_dir, sf):
        # hold band-bucket occupancy constant: += log2(growth) bits
        bits = _sim.R_BITS + max(0, round(_m.log2(max(sf / 0.1, 1))))
        return _sim._run(
            spark, sf_dir, _sim.near_dup_lsh_sql("spark", r_bits=bits)
        )

    return fixed_nlist, scaled_nlist, scaled_bits


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r7.json"
    from aurora_cdc_demo_spark.registry import QUERIES

    spark = get_spark("scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    fixed_nlist, scaled_nlist, scaled_bits = _extra_arms()

    results: dict[str, dict[str, float]] = {}

    errors: dict[str, dict[str, str]] = {}

    def timed(label, point, fn):
        t0 = time.time()
        try:
            fn().write.format("noop").mode("overwrite").save()
        except Exception as e:  # record, keep sweeping
            msg = str(e).split("\n")[0][:160]
            errors.setdefault(label, {})[point] = msg
            print(f"{point:7s} {label:32s} ERROR {msg}", flush=True)
            return
        dt = round(time.time() - t0, 3)
        results.setdefault(label, {})[point] = dt
        print(f"{point:7s} {label:32s} {dt:8.2f}s", flush=True)

    for point, sf_dir, sf in SF_POINTS:
        for name in SCALING_QUERIES:
            timed(name, point, lambda: QUERIES[name](spark, sf_dir))
        timed(
            "ann_knn_graph_fixed_nlist", point,
            lambda: fixed_nlist(spark, sf_dir),
        )
        timed(
            "ann_knn_graph_scaled_nlist", point,
            lambda: scaled_nlist(spark, sf_dir, sf),
        )
        timed(
            "embed_near_dup_lsh_scaled_bits", point,
            lambda: scaled_bits(spark, sf_dir, sf),
        )

    queries = {}
    for name, pts in results.items():
        row = dict(pts)
        if "sf0.1" in pts and "sf1" in pts and pts["sf0.1"] > 0:
            row["exp_01_to_1"] = round(
                math.log10(pts["sf1"] / pts["sf0.1"]), 3
            )
        if "sf0.01" in pts and "sf0.1" in pts and pts["sf0.01"] > 0:
            row["exp_001_to_01"] = round(
                math.log10(pts["sf0.1"] / pts["sf0.01"]), 3
            )
        queries[name] = row

    doc = {
        "metric": "scaling_exponents",
        "unit": "sec per point; exp = log10 time ratio per 10x data",
        "points": {p: sf for p, _, sf in SF_POINTS},
        "construction": "sf1 = key-remapped 10x replication of "
        "sf0.1 (tools/make_scale_data.py): strided keys, per-replica"
        " name tags, 30% token substitution, per-replica embedding "
        "isometries - no synthetic R^2 duplicate families",
        "queries": queries,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scaling_done", "n": len(queries)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
