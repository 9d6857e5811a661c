"""Synthesize an sf~1 corpus (10x /root/testdata/sf0.1) for the
round-7 scaling proof — the third measurement point the 100 TB
plan-shape arguments lacked (r6 verdict item 1).

Construction: key-remapped replication of the driver's sf0.1 tables
(replica 0 is the original, so fixed-id structures — ANN query set
vec_id < N_QUERIES, IVF seeds, BPE doc gates — keep their meaning
while the corpus grows around them, exactly how a production corpus
grows around a fixed serving config). Per table:

- region/nation: fixed dimensions, copied.
- customer/supplier/part/orders/lineitem: keys shifted by a
  per-replica stride chosen above each key domain, so referential
  integrity holds within every replica; name columns get a short
  per-replica tag so edit-distance/fuzzy joins don't see R identical
  copies of every name (which would inflate match families ~R^2 and
  poison the exponent).
- events: event_id/user_id strided — 10x users over the same time
  window (event density grows, per-user behavior unchanged).
- documents: doc_id strided; for r>0 ~30% of tokens are replaced by
  replica-salted pseudo-words, dropping replica-vs-base Jaccard to
  ~0.5 (below the 0.8 dedup threshold) so MinHash/LSH candidate
  volume scales like a real corpus instead of R-sized exact-dup
  families.
- embeddings: vec_id strided; each replica applies ONE fixed
  dimension-permutation + sign-flip isometry (seeded per replica) —
  within-replica geometry (clusters, pair-cosine distribution) is
  exactly the original's, while cross-replica cosines are
  random-centered (<< the 0.4 near-dup threshold), again avoiding
  synthetic R^2 dup families. Labels preserved.

All perturbations are deterministic (md5/xxhash of (replica, id)),
so the corpus is reproducible bit-for-bit.

Usage: python tools/make_scale_data.py [R] [out_dir]
  (default R=10, out=/root/repo/scale_data/sf1)
       python tools/make_scale_data.py --skew [R] [out_dir]
  (r8, verdict item 6: writes the EVENTS table only, with a
  deliberately skewed user_id — by default 50% of all rows land on
  ONE hot user (pmod(xxhash64(event_id, r), 100) < hot_pct → user
  0; the third positional arg sets hot_pct) — the skew-stress
  corpus for timing the salted agg/join patterns (#38/#136)
  against their naive twins; default out=scale_data/sf1skew)
"""

from __future__ import annotations

import random
import sys
from functools import reduce

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DIMS = 64


def replicate(df, r_transform, R):
    parts = [r_transform(df, r) for r in range(R)]
    return reduce(lambda a, b: a.unionByName(b), parts)


def tag(col, r):
    """Short per-replica name tag, inserted at a deterministic
    pseudo-random POSITION inside the name (r8, discharging the r7
    part_edit_distance_join artifact claim): a TRAILING tag leaves
    every replica's PREFIX segments verbatim-identical to the
    base's, so PassJoin segment buckets stack ~R near-identical
    names — a construction artifact no natural name distribution
    exhibits. An infix tag at hash(name, replica) % (len+1) keeps
    the edit distance from the base (and between replicas) at
    ≥ len(tag) > any fuzzy-join radius, while breaking verbatim
    segment alignment the way distinct real-world names do."""
    if not r:
        return F.col(col)
    pos = f"pmod(xxhash64({col}, {r}), length({col}) + 1)"
    return F.expr(
        f"concat(substring({col}, 1, CAST({pos} AS INT)), '~r{r}', "
        f"substring({col}, CAST({pos} AS INT) + 1))"
    )


def perturb_text(r):
    """Replace ~30% of tokens with replica-salted pseudo-words."""
    if r == 0:
        return F.col("text")
    return F.expr(
        "array_join(transform(split(text, ' '), (x, i) -> "
        f"CASE WHEN pmod(xxhash64(x, i, doc_id, {r}), 10) < 3 "
        f"THEN concat('w', conv(substring(md5(concat(x, '_', "
        f"CAST(i AS STRING), '_', CAST(doc_id AS STRING), '_{r}')), "
        "1, 7), 16, 10)) ELSE x END), ' ')"
    )


def isometry(r):
    """Fixed per-replica dimension permutation + sign flips."""
    if r == 0:
        return F.col("embedding")
    rng = random.Random(1000 + r)
    perm = list(range(DIMS))
    rng.shuffle(perm)
    signs = [rng.choice((1.0, -1.0)) for _ in range(DIMS)]
    return F.array(
        *[
            (F.col("embedding")[perm[i]] * F.lit(signs[i])).cast("float")
            for i in range(DIMS)
        ]
    )


def main() -> int:
    argv = sys.argv[1:]
    skew = argv and argv[0] == "--skew"
    if skew:
        argv = argv[1:]
    R = int(argv[0]) if len(argv) > 0 else 10
    out = (
        argv[1]
        if len(argv) > 1
        else (
            "/root/repo/scale_data/sf1skew"
            if skew
            else "/root/repo/scale_data/sf1"
        )
    )
    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")  # noqa: E731

    if skew:
        # hot-key remap AFTER striding: hot_pct% of events
        # (deterministic on event_id) collapse onto user 0 — a
        # power-law head at any R, the regime the salted patterns
        # exist for. Third positional arg sets the share
        # (default 50: the single-hot-partition cliff is what the
        # bench contrasts; 20% barely straggles at local[32]).
        hot_pct = int(argv[2]) if len(argv) > 2 else 50

        def ev(df, r):
            return df.select(
                (F.col("event_id") + r * 10_000_000).alias("event_id"),
                "ts",
                F.expr(
                    f"CASE WHEN pmod(xxhash64(event_id, {r}), 100)"
                    f" < {hot_pct} THEN CAST(0 AS BIGINT) "
                    f"ELSE user_id + {r} * 1000000 END"
                ).alias("user_id"),
                "event_type", "value", "props",
            )

        replicate(rd("events"), ev, R).coalesce(8).write.mode(
            "overwrite"
        ).parquet(f"{out}/events.parquet")
        print("wrote events (skewed)")
        return 0

    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    specs = {
        "customer": lambda df, r: df.select(
            (F.col("c_custkey") + r * 1_000_000).alias("c_custkey"),
            tag("c_name", r).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "supplier": lambda df, r: df.select(
            (F.col("s_suppkey") + r * 1_000_000).alias("s_suppkey"),
            tag("s_name", r).alias("s_name"),
            "s_nationkey", "s_acctbal",
        ),
        "part": lambda df, r: df.select(
            (F.col("p_partkey") + r * 1_000_000).alias("p_partkey"),
            tag("p_name", r).alias("p_name"),
            "p_brand", "p_type", "p_size", "p_retailprice",
        ),
        "orders": lambda df, r: df.select(
            (F.col("o_orderkey") + r * 100_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + r * 1_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        ),
        "lineitem": lambda df, r: df.select(
            (F.col("l_orderkey") + r * 100_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + r * 1_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + r * 1_000_000).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate",
        ),
        "events": lambda df, r: df.select(
            (F.col("event_id") + r * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 1_000_000).alias("user_id"),
            "event_type", "value", "props",
        ),
        "documents": lambda df, r: df.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            perturb_text(r).alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text").cast("long")),
        "embeddings": lambda df, r: df.select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
            isometry(r).alias("embedding"),
            "label",
        ),
    }
    for t, fn in specs.items():
        replicate(rd(t), fn, R).coalesce(8).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print("wrote", t)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
