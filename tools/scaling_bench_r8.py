"""Round-8 scaling proof: re-measure the arms the r7 verdict flagged
now that the blocking dials SELF-SIZE inside the registered queries
(operators/similarity.py: _lsh_band_ctes_auto / _knn_ctes), extend
the worst arms to a FOURTH scale point (sf10, ~100x the driver's
sf0.1 — the second measured decade), and add the skew-stress pair
(r7 verdict item 6).

Key difference from tools/scaling_bench.py (r7): the REGISTERED arm
IS the scaled arm — there is no frozen/scaled twin split for
embed_near_dup_lsh or the KNN family anymore; the frozen-dial arm is
kept only as the explicit contrast (`*_frozen_dial`).

Points:
  sf0.01 / sf0.1  — driver testdata
  sf1             — tools/make_scale_data.py (10x, infix name tags —
                    the r8 construction that discharges the
                    part_edit_distance_join prefix-stacking artifact)
  sf10            — tools/make_scale_data.py 100 (100x), WORST ARMS
                    ONLY (labeled-quadratic oracle twins excluded by
                    design — their cost is the documented contrast)

Skew arms (sf1skew, events-only corpus with one ~50%-mass hot
user by default — pmod(xxhash64(event_id, r), 100) < hot_pct): the hot-key JOIN triple — raw sort-merge join with AQE off
(the cliff), the same join with AQE skew handling on (Spark's
runtime split), and the registered per-row-salt pattern (#136,
operators/skew.salted_join) — all forced into the shuffle-join
regime (broadcast disabled), all producing the same checksum.

Writes SCALING_r8.json. Usage:
  python tools/make_scale_data.py                  # sf1 (10x)
  python tools/make_scale_data.py 100 /root/repo/scale_data/sf10
  python tools/make_scale_data.py --skew 100       # sf1skew events
  python tools/scaling_bench_r8.py [--skew-only] [out.json]
(--skew-only re-measures just the skew arms and merges them into
the existing record.)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

# sf10 is a 100x corpus: size the local-mode JVM heap to the SF (the
# same spill-aware sizing a cluster submit would do via
# --executor-memory; the 8g default OOMs on the ~150M-candidate
# verify shuffle). Overridable, like everywhere else.
os.environ.setdefault("SPARK_DRIVER_MEM", "64g")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

SF_POINTS = [
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf1", "/root/repo/scale_data/sf1", 1.0),
    ("sf10", "/root/repo/scale_data/sf10", 10.0),
]

# The r7 verdict's worst/flagged arms plus their family mates, in a
# fixed order (gate-map amortization position is stable). Every name
# here runs at ALL FOUR points unless listed in SF1_MAX below.
SCALING_QUERIES = [
    # self-sized blocking dials (r7 verdict item 1 — the point)
    "embed_near_dup_lsh",
    "ann_knn_graph",
    "ann_knn_graph_lsh",
    "graph_pagerank_knn",
    "semdedup_cells",
    "embed_keep_list",
    # artifact-claim discharge (r7 verdict item 2): infix-tag corpus
    "part_edit_distance_join",
    # at-threshold and family context arms
    "corpus_keep_list_v7_lsh",
    "dedup_lsh_tuning",
    "dedup_containment",
    "ann_ivf_kmeans",
    "dedup_minhash_lsh",
    "corpus_keep_list_v4_lsh",
    "embed_pq_codes",
]

# arms capped at sf1: the labeled-quadratic exact oracle twin (its
# superlinear cost is the documented LSH-vs-exact contrast, not a
# defect) — excluded from sf10 by design, and logged as such.
SF1_MAX = {"corpus_keep_list_v4"}
SCALING_QUERIES_SF1_ONLY = ["corpus_keep_list_v4"]

SKEW_DIR = "/root/repo/scale_data/sf1skew"


def _frozen_dial_arms():
    """The explicit frozen-constant contrast arms (r7's defaults)."""
    from aurora_cdc_demo_spark.operators import similarity as _sim

    def frozen_bits(spark, sf_dir):
        return _sim._run(
            spark, sf_dir,
            _sim.near_dup_lsh_sql("spark", r_bits=_sim.R_BITS),
        )

    def frozen_nlist(spark, sf_dir):
        return _sim.knn_graph(spark, sf_dir, n_seeds=_sim.N_SEEDS)

    return frozen_bits, frozen_nlist


def _skew_arms(spark):
    """Hot-key JOIN stress over the skewed events corpus — the
    pattern the registered #136 skew_salted_join exists for. (A
    first attempt measured a salted AGGREGATE: pointless — COUNT/
    SUM are algebraic, map-side partial aggregation absorbs any hot
    key before the shuffle, and the naive agg wins. Joins have no
    map-side combine: every hot-key row must meet the dim row on
    ONE reducer unless something splits it.)

    Three arms, same answer (a count+checksum aggregate forces full
    join execution): sort-merge join with AQE skew handling OFF
    (the raw cliff), the same join with AQE ON (Spark's runtime
    mitigation — the reason the session default enables it), and
    the registered per-row-salt pattern (operators/skew.salted_join
    — the engine-independent fix, needed where AQE can't reach:
    non-shuffle boundaries, AQE-less engines). Broadcast is
    disabled for the dim (the whole point is the shuffle-join
    regime; at 100 TB the user dim doesn't broadcast)."""
    from pyspark.sql import functions as F

    from aurora_cdc_demo_spark.operators import skew as _skew

    def ev():
        # read inside each arm so a failure lands in timed()'s
        # error record instead of killing the whole bench
        return spark.read.parquet(f"{SKEW_DIR}/events.parquet").select(
            "event_id", "user_id", "value"
        )

    def dim():
        # distinct key name: salted_join's condition references both
        # key columns unqualified
        return (
            ev()
            .groupBy("user_id")
            .agg(F.max("value").alias("u_payload"))
            .select(F.col("user_id").alias("u_key"), "u_payload")
        )

    def _checksum(joined):
        # decimal-widened: a BIGINT sum of 10M xxhash64 values
        # overflows under ANSI
        return joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.xxhash64("event_id", "u_payload").cast("decimal(38,0)")
            ).alias("chk"),
        )

    def _with_confs(fn, **confs):
        saved = {}
        for k, v in confs.items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def naive_no_aqe():
        return _with_confs(
            lambda: _checksum(
                ev().join(
                    dim(), F.col("user_id") == F.col("u_key")
                )
            ).localCheckpoint(),
            **{
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )

    def naive_aqe():
        return _with_confs(
            lambda: _checksum(
                ev().join(
                    dim(), F.col("user_id") == F.col("u_key")
                )
            ).localCheckpoint(),
            **{
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )

    def salted():
        # row_id_col=None -> the operator's xxhash64 row-salt path
        # (the md5 variant exists for oracle-exactness in the
        # registered #136; the xxhash path is the throughput choice
        # and salts identically in distribution)
        return _with_confs(
            lambda: _checksum(
                _skew.salted_join(
                    ev(), dim(), "user_id", "u_key",
                    row_id_col=None,
                )
            ).localCheckpoint(),
            **{
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )

    return naive_no_aqe, naive_aqe, salted


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    skew_only = "--skew-only" in argv
    if skew_only:
        argv.remove("--skew-only")
    only: set[str] = set()
    for a in list(argv):
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
            argv.remove(a)
    out_path = argv[0] if argv else "SCALING_r8.json"
    from aurora_cdc_demo_spark.registry import QUERIES

    spark = get_spark("scaling-bench-r8")
    spark.sparkContext.setLogLevel("ERROR")
    frozen_bits, frozen_nlist = _frozen_dial_arms()

    results: dict[str, dict[str, float]] = {}
    errors: dict[str, dict[str, str]] = {}

    def timed(label, point, fn):
        t0 = time.time()
        try:
            fn().write.format("noop").mode("overwrite").save()
        except Exception as e:  # record, keep sweeping
            msg = str(e).split("\n")[0][:160]
            errors.setdefault(label, {})[point] = msg
            print(f"{point:7s} {label:34s} ERROR {msg}", flush=True)
            return
        dt = round(time.time() - t0, 3)
        results.setdefault(label, {})[point] = dt
        print(f"{point:7s} {label:34s} {dt:8.2f}s", flush=True)

    for point, sf_dir, _sf in [] if skew_only else SF_POINTS:
        for name in SCALING_QUERIES:
            if only and name not in only:
                continue
            timed(name, point, lambda: QUERIES[name](spark, sf_dir))
        if point != "sf10":
            for name in SCALING_QUERIES_SF1_ONLY:
                if only and name not in only:
                    continue
                timed(name, point, lambda: QUERIES[name](spark, sf_dir))
        # frozen-dial contrast arms: sf1 only (the r7 comparison
        # point; at sf10 the frozen dials are the documented
        # blow-up, not worth the wall time)
        if point in ("sf0.1", "sf1") and not only:
            timed(
                "embed_near_dup_lsh_frozen_dial", point,
                lambda: frozen_bits(spark, sf_dir),
            )
            timed(
                "ann_knn_graph_frozen_dial", point,
                lambda: frozen_nlist(spark, sf_dir),
            )

    # skew-stress arms (r7 verdict item 6): raw SMJ cliff vs AQE
    # skew-split vs the registered per-row-salt pattern
    if skew_only or not only:
        naive_no_aqe, naive_aqe, salted = _skew_arms(spark)
        timed("skew_hot_join_naive_no_aqe", "sf1skew", naive_no_aqe)
        timed("skew_hot_join_naive_aqe", "sf1skew", naive_aqe)
        timed("skew_hot_join_salted", "sf1skew", salted)

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

    if (skew_only or only) and os.path.exists(out_path):
        # merge re-measured arms into the existing record (never
        # clobber full-run rows of arms not re-run here)
        with open(out_path) as f:
            prior = json.load(f)
        merged = {
            k: v
            for k, v in prior.get("queries", {}).items()
            if k not in queries
        }
        merged.update(queries)
        queries = merged
        errors = {**prior.get("errors", {}), **errors}

    doc = {
        "metric": "scaling_exponents_r8",
        "unit": "sec per point; exp = log10 time ratio per 10x data",
        "points": {p: sf for p, _, sf in SF_POINTS},
        "construction": "sf1/sf10 = key-remapped 10x/100x replication"
        " of sf0.1 (tools/make_scale_data.py): strided keys, INFIX"
        " per-replica name tags (r8 - kills the prefix-segment"
        " stacking artifact), 30% token substitution, per-replica"
        " embedding isometries; sf1skew = events-only corpus with a"
        " ~50%-mass hot user (default hot_pct=50)",
        "self_sizing": "embed_near_dup_lsh r_bits and the KNN-chain"
        " nlist derive from the corpus count INSIDE the registered"
        " SQL (operators/similarity.py) - the registered arm IS the"
        " scaled arm; *_frozen_dial rows are the explicit contrast",
        "queries": queries,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scaling_done", "n": len(queries)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
