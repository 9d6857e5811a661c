"""Round-9 scaling bench: the r8 arm set on the NEW graph-family
default (banded-LSH edges + hamming-capped exact re-rank), the
banded-vs-flat KNN-build CROSSOVER CURVE, the name-grain
edit-distance twin, and a LOCAL-CLUSTER column.

Modes:
  python tools/scaling_bench_r9.py                     # full local[32] sweep
  python tools/scaling_bench_r9.py --only=a,b          # subset, merge into out
  python tools/scaling_bench_r9.py --lc [out.json]     # local-cluster column:
      re-runs LC_QUERIES under SPARK_GRAFT_MASTER=local-cluster[2,16,4096]
      (real executor JVMs: serialized shuffle files, per-executor memory —
      the behavior class local[N] structurally hides) and merges a
      "local_cluster" section into the record.

Corpora: /root/testdata/sf0.01, sf0.1 + tools/make_scale_data.py
replicas at scale_data/sf1 (10x) and sf10 (100x).

Writes SCALING_r9.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

# sf10 is a 100x corpus: size the single-JVM heap to the SF (the
# spill-aware sizing a cluster submit does via --executor-memory).
os.environ.setdefault("SPARK_DRIVER_MEM", "64g")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

SF_POINTS = [
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf1", "/root/repo/scale_data/sf1", 1.0),
    ("sf10", "/root/repo/scale_data/sf10", 10.0),
]

SCALING_QUERIES = [
    # self-sized blocking dials
    "embed_near_dup_lsh",
    # the crossover pair: flat Voronoi (Θ(n^1.5) by construction)
    # vs banded+hamming-capped (the registered graph edge builder
    # since r9) — these two rows ARE the crossover curve
    "ann_knn_graph",
    "ann_knn_graph_lsh",
    # the graph family on banded edges (r8 verdict item 2's "done")
    "graph_pagerank_knn",
    "semdedup_cells",
    "embed_keep_list",
    # output-bound contrast pair (r8 verdict item 4)
    "part_edit_distance_join",
    "part_edit_distance_names",
    # family context arms
    "corpus_keep_list_v7_lsh",
    "dedup_lsh_tuning",
    "dedup_containment",
    "ann_ivf_kmeans",
    "dedup_minhash_lsh",
    "corpus_keep_list_v4_lsh",
    "embed_pq_codes",
]

# local-cluster column: the heaviest shuffle/scale arms + the
# throughput trio (bench.py's streaming numbers) under a real
# executor split. sf1 point (sf10 under 2x4096MB executors would
# mostly measure spill, not the exchange behavior we want pinned).
LC_QUERIES = [
    "embed_near_dup_lsh",
    "ann_knn_graph",
    "ann_knn_graph_lsh",
    "graph_pagerank_knn",
    "semdedup_cells",
    "embed_keep_list",
    "part_edit_distance_join",
    "dedup_minhash_lsh",
    "dedup_containment",
    "corpus_keep_list_v7_lsh",
]
LC_MASTER = "local-cluster[2,16,4096]"
LC_POINT = ("sf1", "/root/repo/scale_data/sf1", 1.0)


def _merge(out_path: str, patch: dict) -> dict:
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(doc.get(k), dict):
            doc[k].update(v)
        else:
            doc[k] = v
    return doc


def run_local_cluster(out_path: str) -> int:
    """The local-cluster column. MUST be invoked with
    SPARK_GRAFT_MASTER unset — this function re-execs itself with
    the env set so the session factory picks it up cleanly."""
    if os.environ.get("SPARK_GRAFT_MASTER") != LC_MASTER:
        env = dict(os.environ)
        env["SPARK_GRAFT_MASTER"] = LC_MASTER
        # executor memory must match the worker allocation
        env["SPARK_EXECUTOR_MEM"] = "3g"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    from pyspark.sql import SparkSession

    from aurora_cdc_demo_spark.registry import QUERIES

    point, sf_dir, _ = LC_POINT
    spark = (
        SparkSession.builder.master(LC_MASTER)
        .appName("scaling-lc-r9")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.executor.memory", "3g")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    lc: dict[str, float] = {}
    lc_err: dict[str, str] = {}
    for name in LC_QUERIES:
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            lc[name] = round(time.time() - t0, 3)
            print(f"LC {point} {name:32s} {lc[name]:8.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            lc_err[name] = str(e).split("\n")[0][:160]
            print(f"LC {point} {name:32s} ERROR {lc_err[name]}", flush=True)
    doc = _merge(
        out_path,
        {
            "local_cluster": {
                "master": LC_MASTER,
                "point": point,
                "note": "2 executor JVMs x 16 cores x 4096MB worker"
                " (3g executor heap): real serialized exchanges and"
                " per-executor memory pressure vs the local[32]"
                " single-JVM fast path",
                "queries": lc,
                "errors": lc_err,
            }
        },
    )
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scaling_lc_done", "n": len(lc)}))
    return 0


def main() -> int:
    argv = list(sys.argv[1:])
    lc = "--lc" in argv
    if lc:
        argv.remove("--lc")
    only: set[str] = set()
    for a in list(argv):
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
            argv.remove(a)
    out_path = argv[0] if argv else "SCALING_r9.json"
    if lc:
        return run_local_cluster(out_path)

    from aurora_cdc_demo_spark.registry import QUERIES

    spark = get_spark("scaling-bench-r9")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    errors: dict[str, dict[str, str]] = {}

    def timed(label, point, fn):
        t0 = time.time()
        try:
            fn().write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            errors.setdefault(label, {})[point] = msg
            print(f"{point:7s} {label:34s} ERROR {msg}", flush=True)
            return
        dt = round(time.time() - t0, 3)
        results.setdefault(label, {})[point] = dt
        print(f"{point:7s} {label:34s} {dt:8.2f}s", flush=True)

    for point, sf_dir, _sf in SF_POINTS:
        for name in SCALING_QUERIES:
            if only and name not in only:
                continue
            timed(name, point, lambda: QUERIES[name](spark, sf_dir))

    queries = {}
    for name, pts in results.items():
        row = dict(pts)
        for a, b, key in (
            ("sf0.01", "sf0.1", "exp_001_to_01"),
            ("sf0.1", "sf1", "exp_01_to_1"),
            ("sf1", "sf10", "exp_1_to_10"),
        ):
            if a in pts and b in pts and pts[a] > 0:
                row[key] = round(math.log10(pts[b] / pts[a]), 3)
        queries[name] = row

    # the crossover record: banded-vs-flat wall at every point
    crossover = {}
    flat = queries.get("ann_knn_graph", {})
    band = queries.get("ann_knn_graph_lsh", {})
    for point, _, _ in SF_POINTS:
        if point in flat and point in band:
            crossover[point] = {
                "flat_ivf_sec": flat[point],
                "banded_hamming_sec": band[point],
                "banded_over_flat": round(band[point] / flat[point], 3),
            }

    patch = {
        "metric": "scaling_exponents_r9",
        "unit": "sec per point; exp = log10 time ratio per 10x data",
        "points": {p: sf for p, _, sf in SF_POINTS},
        "construction": "sf1/sf10 = key-remapped 10x/100x replication"
        " of sf0.1 (tools/make_scale_data.py): strided keys, infix"
        " per-replica name tags, 30% token substitution, per-replica"
        " embedding isometries",
        "graph_edge_builder": "banded-LSH + 192-bit-signature"
        " hamming-top-64 exact re-rank (similarity.py:"
        " GRAPH_EDGE_BUILDER='lsh') — the registered default for"
        " every graph-family query since r9; ann_knn_graph is the"
        " flat Voronoi contrast twin",
        "queries": queries,
        "crossover_flat_vs_banded": crossover,
        "errors": errors,
    }
    doc = _merge(out_path, patch) if only else patch
    if only and "local_cluster" not in doc and os.path.exists(out_path):
        pass
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scaling_done", "n": len(queries)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
