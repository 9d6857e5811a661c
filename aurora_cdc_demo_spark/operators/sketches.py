"""Probabilistic sketches with fully deterministic, cross-engine
semantics: count-min frequency estimation and Bloom-filter
membership.

Both sketches matter at 100 TB because their state is bounded by
CONSTANTS (depth x width counters; m filter bits), not by the data:
a count-min table summarizing a 100 TB event stream is still
DEPTH*WIDTH rows, and a Bloom filter over an eval suite is still m
bits however large the training corpus grows. That is exactly the
shape Spark wants — the sketch is a tiny aggregate you broadcast,
and the corpus-sized side streams past it without shuffling.

Determinism: the only hash primitive is md5 (bit-exact in Spark and
DuckDB); the d/k hash family is Kirsch-Mitzenmacher double hashing
(h_i = a + i*b mod width) over the two 32-bit halves of one md5 —
the same construction operators/dedup.py uses for MinHash, so the
oracle runs the identical arithmetic. No RNG, no floats.

Reference parity: the reference repo has no sketch operators; these
extend the monitoring surface (reference
src/aurora_cdc/monitoring/cdc_monitor.py's exact counts) with the
constant-memory variants a 1000-executor deployment would actually
run, mirroring how events_distinct_users_hll extends its distinct
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Count-min geometry: 4 rows x 256 buckets = 1024 counters total.
CM_DEPTH = 4
CM_WIDTH = 256

# Bloom geometry: k=3 probes into 2^16 bit positions.
BLOOM_K = 3
BLOOM_M = 65536


def _ab(col):
    """The two 32-bit halves of md5(col) as longs — the K-M base
    pair (identical to the MinHash construction in dedup.py)."""
    h = F.md5(col.cast("string"))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return a, b


def _ab_sql(expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`_ab` (the '0x' cast parses hex)."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    return (
        f"CAST('0x' || substr({h}, 1, 8) AS BIGINT)",
        f"CAST('0x' || substr({h}, 9, 8) AS BIGINT)",
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def count_min_sketch(rows: DataFrame, key: str) -> DataFrame:
    """The sketch table itself: (d, bucket, counter), at most
    DEPTH*WIDTH rows. Counters are ADDITIVE, so sketches of disjoint
    row sets merge by summing matching counters — the property that
    makes count-min streaming-friendly (per-micro-batch sketches sum
    to the batch sketch; pinned in tests/test_streaming.py)."""
    a, b = _ab(F.col(key))
    d = F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("d")
    hashed = rows.select(F.col(key), a.alias("a"), b.alias("b")).select(
        key, "a", "b", d
    )
    bucketed = hashed.select(
        key,
        "d",
        ((F.col("a") + F.col("d") * F.col("b")) % F.lit(CM_WIDTH)).alias(
            "bucket"
        ),
    )
    return bucketed.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("counter")
    )


def count_min_estimates(rows: DataFrame, key: str) -> DataFrame:
    """Count-min frequency estimation for every distinct ``key``.

    Build: each input row increments one counter per depth row —
    expressed as an explode over d in [0, DEPTH) and ONE map-side-
    combined groupBy on (d, bucket). The sketch is at most
    DEPTH*WIDTH rows regardless of input size, so the probe join
    broadcasts it.

    Probe: a key's estimate is min over d of its counter — the
    classic one-sided guarantee: est >= true count always (every
    occurrence of the key incremented all d of its counters; other
    keys can only ADD to them), with overestimate bounded by
    collisions. tests/test_round4.py pins the one-sided law on every
    key.

    Returns (key, est_count, exact_count, overestimate). The exact
    count is joined in for observability; a production probe of a
    100 TB stream would keep only the sketch.
    """
    sketch = count_min_sketch(rows, key)
    exact = rows.groupBy(key).agg(F.count(F.lit(1)).alias("exact_count"))
    ea, eb = _ab(F.col(key))
    d = F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("d")
    probe = (
        exact.select(key, "exact_count", ea.alias("a"), eb.alias("b"))
        .select(key, "exact_count", "a", "b", d)
        .select(
            key,
            "exact_count",
            "d",
            ((F.col("a") + F.col("d") * F.col("b")) % F.lit(CM_WIDTH)).alias(
                "bucket"
            ),
        )
    )
    est = (
        probe.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(key, "exact_count")
        .agg(F.min("counter").alias("est_count"))
    )
    return est.select(
        key,
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
    )


def count_min_sql(source: str, key: str) -> str:
    a, b = _ab_sql(key)
    # qualified variants for the probe CTE — built from the same
    # generator, never by substring-replacing `key` into the
    # unqualified SQL (a key name occurring inside md5/substr would
    # corrupt the expression)
    ea, eb = _ab_sql(f"e.{key}")
    return f"""
        WITH hashed AS (
            SELECT {key}, {a} AS a, {b} AS b FROM {source})
        , bucketed AS (
            SELECT {key}, d, (a + d * b) % {CM_WIDTH} AS bucket
            FROM hashed CROSS JOIN (
                SELECT unnest(range({CM_DEPTH})) AS d))
        , sketch AS (
            SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS counter
            FROM bucketed GROUP BY d, bucket)
        , exact AS (
            SELECT {key}, CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM {source} GROUP BY {key})
        , probe AS (
            SELECT e.{key}, e.exact_count, d.d,
                   ({ea} + d.d * {eb}) % {CM_WIDTH} AS bucket
            FROM exact e CROSS JOIN (
                SELECT unnest(range({CM_DEPTH})) AS d) d)
        SELECT p.{key},
               CAST(MIN(s.counter) AS BIGINT) AS est_count,
               p.exact_count,
               CAST(MIN(s.counter) - p.exact_count AS BIGINT)
                   AS overestimate
        FROM probe p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
        GROUP BY p.{key}, p.exact_count
    """


# ---------------------------------------------------------------------------
# Bloom filter membership
# ---------------------------------------------------------------------------


def bloom_bits(members: DataFrame, col: str) -> DataFrame:
    """The set-bit positions of a Bloom filter over ``members[col]``
    — represented relationally as a distinct-position table (at most
    min(k*|members|, m) rows, bounded by the MEMBER set, not the
    probing corpus). Equivalent to the bitmap: a value is
    'maybe-present' iff all k of its positions appear here."""
    a, b = _ab(F.col(col))
    j = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j")
    return (
        members.select(a.alias("a"), b.alias("b"))
        .select("a", "b", j)
        .select(((F.col("a") + F.col("j") * F.col("b")) % F.lit(BLOOM_M)).alias("pos"))
        .distinct()
    )


def bloom_probe(probes: DataFrame, col: str, bits: DataFrame) -> DataFrame:
    """Probe: a value passes iff ALL of its (distinct) bit positions
    are set. No false negatives ever — a true member's positions are
    all in `bits` by construction; false positives happen when
    unrelated members covered all k positions (rate ~ (1-e^(-kn/m))^k,
    documented, measured in pytest)."""
    a, b = _ab(F.col(col))
    j = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j")
    pos = (
        probes.select(F.col(col), a.alias("a"), b.alias("b"))
        .select(col, "a", "b", j)
        .select(
            col,
            ((F.col("a") + F.col("j") * F.col("b")) % F.lit(BLOOM_M)).alias(
                "pos"
            ),
        )
        .distinct()
    )
    hit = pos.join(F.broadcast(bits), "pos", "left_semi")
    n_pos = pos.groupBy(col).agg(F.count(F.lit(1)).alias("n_pos"))
    n_hit = hit.groupBy(col).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_pos.join(n_hit, col, "left")
        .select(
            col,
            (F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_pos")).alias(
                "maybe_member"
            ),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers — EXPLICIT register table (unlike the opaque
# approx_count_distinct sketch, these are plain rows: cross-engine
# exact, mergeable by MAX, and maintainable by foreachBatch with
# constant state). Geometry: 256 buckets; rank = trailing-zero count
# of the remaining 44 hash bits + 1 (Flajolet's rho under the
# trailing-zero convention; either convention is a valid geometric
# observable as long as both engines share it).
# ---------------------------------------------------------------------------

HLL_BUCKETS = 256
_HLL_XBITS = 44  # 52-bit hash minus 8 bucket bits
HLL_RHO_CAP = _HLL_XBITS + 1


def _hll_cols(a: str, b: str, div: str) -> tuple[str, str]:
    """(bucket, rho) SQL from the K-M base pair columns: a 52-bit
    hash h = (a mod 2^20)*2^32 + b stays inside signed-64 exactly;
    trailing zeros via the two's-complement trick
    bit_count((x & -x) - 1) — both engines' bit_count/& agree on
    BIGINT."""
    h = f"(({a} % 1048576) * 4294967296 + {b})"
    x = f"({h} {div} {HLL_BUCKETS})"
    rho = (
        f"CASE WHEN {x} = 0 THEN {HLL_RHO_CAP} "
        f"ELSE bit_count(({x} & -{x}) - 1) + 1 END"
    )
    return f"({h} % {HLL_BUCKETS})", rho


def hll_registers(rows: DataFrame, key: str) -> DataFrame:
    """(bucket, rho) register table: rho = max rank observed per
    bucket. Additive-merge law: max of per-partition (or per-micro-
    batch) registers equals the global registers — the mergeability
    that makes HLL the 100 TB distinct counter (constant 256-row
    state per group however large the stream)."""
    a, b = _ab(F.col(key))
    h = (a % 1048576) * F.lit(4294967296) + b
    df = rows.select(
        (h % HLL_BUCKETS).cast("long").alias("bucket"),
        (h - h % HLL_BUCKETS).alias("_num"),
    ).withColumn("x_", (F.col("_num") / HLL_BUCKETS).cast("long"))
    return (
        df.select(
            "bucket",
            F.when(F.col("x_") == 0, F.lit(HLL_RHO_CAP))
            .otherwise(F.expr("bit_count((x_ & -x_) - 1) + 1").cast("long"))
            .cast("long")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_sql(source: str, key: str, dialect: str, group: str = "") -> str:
    """Dual-dialect register SQL, optionally grouped (e.g. per
    event_type): identical integer algebra to :func:`hll_registers`."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        a = (
            f"CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        )
        b = (
            f"CAST(conv(substring(md5(CAST({key} AS STRING)), 9, 8), 16, 10)"
            " AS BIGINT)"
        )
    else:
        a, b = _ab_sql(key)
    bucket, rho = _hll_cols(a, b, div)
    gcols = f"{group}, " if group else ""
    gby = f"{group}, bucket" if group else "bucket"
    return f"""
        WITH h AS (
            SELECT {gcols}{bucket} AS bucket,
                   CAST({rho} AS BIGINT) AS rho
            FROM {source})
        SELECT {gcols}bucket, MAX(rho) AS rho
        FROM h GROUP BY {gby}
    """


# ---------------------------------------------------------------------------
# KMV / theta sketch (K minimum hash values)
# ---------------------------------------------------------------------------

KMV_K = 64


def kmv_sketch(rows: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """The K smallest 32-bit md5 hash values of ``key`` — the KMV /
    theta sketch sample (registry events_theta_sketch_ops runs the
    estimator algebra over it). MERGEABLE by construction: the K
    smallest of a union of per-partition K-smallest sets equals the
    K smallest of the union (any globally-kept value is necessarily
    kept by its own partition), so per-micro-batch sketches re-trim
    to the batch sketch — pinned in tests/test_streaming.py.

    Scale: distinct-project then sort-limit — Spark executes
    TakeOrderedAndProject (per-partition partial top-k), no global
    sort, output bounded at K rows."""
    h = (
        F.conv(F.md5(F.col(key).cast("string")).substr(1, 8), 16, 10)
        .cast("long")
        + 1
    ).alias("h")
    return (
        rows.select(h).distinct().orderBy("h").limit(k)
    )


def kmv_merge(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Re-trim a union of KMV sketch rows to the K smallest distinct
    values — the streaming merge step (same TakeOrdered shape)."""
    return sketches.select("h").distinct().orderBy("h").limit(k)


# ---------------------------------------------------------------------------
# Leveled MRL quantile sketch (streaming-maintainable buffers)
# ---------------------------------------------------------------------------

MRL_CAP = 128  # per-(group, level) buffer capacity


def mrl_level0(rows: DataFrame, group: str, value: str, ident: str) -> DataFrame:
    """Lift raw rows into the sketch's level-0 buffer shape:
    (group, lvl=0, v, w=1, id). `value` must already be an exact
    integer expression (cents)."""
    return rows.select(
        F.col(group).alias("grp"),
        F.lit(0).cast("long").alias("lvl"),
        F.expr(value).cast("long").alias("v"),
        F.lit(1).cast("long").alias("w"),
        F.col(ident).cast("long").alias("id"),
    )


def mrl_compact(sketch: DataFrame, cap: int = MRL_CAP) -> DataFrame:
    """Compact the leveled buffers until every (group, level) holds
    <= cap items: any over-capacity buffer sorts by (v, id), keeps
    its odd ranks at level+1 with doubled weight, and drops the
    evens — the Munro-Paterson collapse, applied level-wise so
    merged states of UNEQUAL weights stay correct (items of weight
    2^l only ever compact against items of the same level). Driver
    loop with one bounded scalar action per round (the Pregel/BPE
    discipline); rounds are bounded by the final level count
    log2(n/cap).

    Mergeability: union two sketches' buffers and compact — level
    buffers concatenate (same weight), overflow cascades upward; the
    rank error adds at most one cap-weight displacement per level
    per merge, the classic MRL bound."""
    from pyspark.sql import Window

    cur = sketch.localCheckpoint()
    wo = Window.partitionBy("grp", "lvl").orderBy(
        F.col("v").asc(), F.col("id").asc()
    )
    wc = Window.partitionBy("grp", "lvl")
    while True:
        over = cur.groupBy("grp", "lvl").count().where(
            F.col("count") > cap
        )
        if not over.take(1):
            return cur
        ranked = cur.withColumn(
            "rnk", F.row_number().over(wo)
        ).withColumn("cnt", F.count(F.lit(1)).over(wc))
        keep = ranked.where(F.col("cnt") <= cap).drop("rnk", "cnt")
        promoted = (
            ranked.where(
                (F.col("cnt") > cap) & (F.col("rnk") % 2 == 1)
            )
            .select(
                "grp",
                (F.col("lvl") + 1).alias("lvl"),
                "v",
                (F.col("w") * 2).alias("w"),
                "id",
            )
        )
        cur = keep.unionByName(promoted).localCheckpoint()


def mrl_quantiles(
    sketch: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Read quantile estimates off the leveled sketch: weighted
    cumulative rank over (v, id), pick the first item whose
    cumulative weight reaches ceil(q * W / 100)."""
    from pyspark.sql import Window

    wo = Window.partitionBy("grp").orderBy(
        F.col("v").asc(), F.col("id").asc()
    )
    wa = Window.partitionBy("grp")
    cum = sketch.withColumn(
        "cw", F.sum("w").over(wo).cast("long")
    ).withColumn("tw", F.sum("w").over(wa).cast("long"))
    arms = []
    for q in pcts:
        target = F.floor((F.lit(q) * F.col("tw") + 99) / 100).cast(
            "long"
        )
        first = (
            cum.where(F.col("cw") >= F.greatest(F.lit(1), target))
            .groupBy("grp")
            .agg(F.min_by("v", F.struct("cw", "v", "id")).alias("v"))
            .select(
                "grp",
                F.lit(q).cast("long").alias("pct"),
                F.col("v").alias("est_cents"),
            )
        )
        arms.append(first)
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out
