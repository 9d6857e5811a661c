"""Round-13 additions (r4 verdict items 1/2/6/7): fused text
keep-list chain (gate-map materialization + late-gate
short-circuiting), gate-map cache hygiene, one-job referential
integrity, SURVEY §2 <-> registry zero-drift law."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_cdc_demo_spark.registry import QUERIES


def test_keep_list_v7_lsh_plan_materialized(spark, sf_dir):
    """r4 verdict item 1: the deployment artifact's ONE optimized
    plan contained 21 parquet relations and 13 Generates (every gate
    re-read and re-tokenized the corpus). Fused form: every gate's
    per-doc verdict map is checkpointed before the joins, so the
    composed plan joins LogicalRDD maps only — no Generate, ZERO
    parquet scans (well under the <=4 target)."""
    df = QUERIES["corpus_keep_list_v7_lsh"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan
    assert "parquet" not in plan
    assert "LogicalRDD" in plan


def test_keep_list_v4_and_v5_plans_materialized(spark, sf_dir):
    """Same pin for the two-SF bench contrast pair (v4/v4_lsh) and
    the first short-circuited level: the returned artifact is a
    materialized map (or a join of materialized maps), never a
    corpus-scan chain."""
    for name in (
        "corpus_keep_list_v4",
        "corpus_keep_list_v4_lsh",
        "corpus_keep_list_v5_lsh",
    ):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Generate" not in plan, name
        assert "parquet" not in plan, name


def test_gate_map_no_cache_outside_testdata(spark, tmp_path):
    """The gate-map cache must never serve stale verdicts for
    ad-hoc sf_dirs (unit tests rewrite tmpdir corpora): only the
    immutable /root/testdata trees are cached."""
    from aurora_cdc_demo_spark.registry import _gate_map

    calls = []

    def builder():
        calls.append(1)
        return spark.range(1).select(F.col("id").alias("doc_id"))

    for _ in range(2):
        _gate_map(spark, str(tmp_path), "kl_test_gate", builder)
    assert len(calls) == 2  # rebuilt every call: not cached

    # and the immutable tree IS cached (second call hits)
    calls.clear()
    for _ in range(2):
        _gate_map(
            spark, "/root/testdata/__cache_probe__", "kl_test_gate", builder
        )
    assert len(calls) == 1


def test_keep_list_short_circuit_scope(spark, sf_dir):
    """Decision priority makes late-gate short-circuiting
    answer-preserving: gopher_repetitive may only ever appear on
    docs whose v4 decision was in the scored tail, model_reject only
    on docs whose v6 decision was sampled_out/keep. Cross-check the
    fused artifacts level to level."""
    v4 = {
        r["doc_id"]: r["decision"]
        for r in QUERIES["corpus_keep_list_v4_lsh"](spark, sf_dir).collect()
    }
    v5 = {
        r["doc_id"]: r["decision"]
        for r in QUERIES["corpus_keep_list_v5_lsh"](spark, sf_dir).collect()
    }
    v6 = {
        r["doc_id"]: r["decision"]
        for r in QUERIES["corpus_keep_list_v6_lsh"](spark, sf_dir).collect()
    }
    v7 = {
        r["doc_id"]: r["decision"]
        for r in QUERIES["corpus_keep_list_v7_lsh"](spark, sf_dir).collect()
    }
    assert set(v4) == set(v5) == set(v6) == set(v7)
    for d, dec in v5.items():
        if dec == "gopher_repetitive":
            assert v4[d] in (
                "low_quality",
                "off_target",
                "sampled_out",
                "keep",
            )
    for d, dec in v7.items():
        if dec == "model_reject":
            assert v6[d] in ("sampled_out", "keep")
        elif v6[d] not in ("sampled_out", "keep"):
            # non-adjudicated docs keep their higher-priority reason
            assert dec == v6[d]


def test_gopher_repetition_sql_table_param(spark, sf_dir):
    """gopher_repetition_sql(table=...) must score exactly the view
    it is pointed at — restricting the view restricts the rows, and
    the per-doc report is identical to the full-corpus run on the
    docs both cover (the gate is purely per-doc)."""
    from aurora_cdc_demo_spark.operators import text as _text
    from aurora_cdc_demo_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    full = {
        r["doc_id"]: r["keep"]
        for r in spark.sql(_text.gopher_repetition_sql("spark")).collect()
    }
    docs.filter(F.col("doc_id") % 3 == 0).createOrReplaceTempView(
        "__grep_probe"
    )
    sub = {
        r["doc_id"]: r["keep"]
        for r in spark.sql(
            _text.gopher_repetition_sql("spark", table="__grep_probe")
        ).collect()
    }
    assert set(sub) == {d for d in full if d % 3 == 0}
    assert all(full[d] == v for d, v in sub.items())


def test_bpe_train_k32_prefix_equals_k3_oracle(spark, sf_dir):
    """The driver-loop trainer's first BPE_ROUNDS rows equal the
    unrolled K=3 chain's output exactly (same winners, counts, and
    post-round token totals)."""
    k3 = sorted(
        tuple(r)
        for r in QUERIES["bpe_merge_rounds"](spark, sf_dir).collect()
    )
    k32 = sorted(
        tuple(r)
        for r in QUERIES["bpe_train_k32"](spark, sf_dir).collect()
        if r["round"] <= len(k3)
    )
    assert k32 == k3


def test_bpe_train_k32_conservation_laws(spark, sf_dir):
    """Across all 32 rounds: rounds are dense from 1, corpus tokens
    strictly decrease while merges fire, and each round's token
    reduction never exceeds its winning count (greedy non-overlap
    merges fewer than it counts)."""
    rows = sorted(
        (r["round"], r["n_occurrences"], r["corpus_tokens_after"])
        for r in QUERIES["bpe_train_k32"](spark, sf_dir).collect()
    )
    assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 16  # the corpus sustains a deep vocab
    for (_, _, t1), (_, n2, t2) in zip(rows, rows[1:]):
        assert t2 < t1
        assert t1 - t2 <= n2


def test_bpe_fertility_k32_vocab_application_law(spark, sf_dir):
    """Applying the trained vocab must conserve word counts and
    reproduce the symbol table's totals: sum over langs of
    n_tokens_bpe for multi-char words == corpus_tokens_after of the
    final round (every >=2-char word tokenizes to its trained symbol
    count), and fertility is never below 10000 bp / 1 token-per-word."""
    from pyspark.sql import functions as F
    from aurora_cdc_demo_spark.tables import load_table

    fert = QUERIES["bpe_fertility_k32"](spark, sf_dir).collect()
    rep = sorted(
        (r["round"], r["corpus_tokens_after"])
        for r in QUERIES["bpe_train_k32"](spark, sf_dir).collect()
    )
    final_tokens = rep[-1][1]
    docs = load_table(spark, sf_dir, "documents")
    n_single = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .where(F.length("w") < 2)
        .count()
    )
    assert sum(r["n_tokens_bpe"] for r in fert) == final_tokens + n_single
    for r in fert:
        assert r["fertility_bp"] >= 10000 // 1  # >= 1 token per word


def test_bpe_train_hand_case(spark):
    """'aaaa' x3 through the driver-loop trainer: round 1 counts 9
    'aa' but merges 2 per word, round 2 merges to 'aaaa', then the
    pair supply is exhausted and rounds vanish — identical to the
    unrolled chain's hand case."""
    from aurora_cdc_demo_spark.operators import bpe as _bpe

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    report, syms = _bpe.train(spark, docs, 32)
    out = sorted(
        (r["round"], r["pair"], r["n_occurrences"],
         r["corpus_tokens_after"])
        for r in report.collect()
    )
    assert out == [(1, "aa", 9, 6), (2, "aaaa", 3, 3)]
    assert syms.count() == 1  # one word type, one symbol


def test_bpe_train_deeper_k_extends_prefix_and_improves_fertility(
    spark, sf_dir
):
    """r5 verdict item 5 (scaling law): a K=64 run's first 32 rows
    equal the registered K=32 run exactly (training is a pure
    prefix-extension — deeper K never rewrites earlier merges), the
    token curve keeps strictly decreasing through the extra rounds,
    per-round wall cost stays flat (second half vs first half — the
    constant-depth property; an unrolled chain would grow), and the
    bigger vocabulary never worsens per-language fertility."""
    from aurora_cdc_demo_spark.operators import bpe as _bpe
    from aurora_cdc_demo_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    walls: list = []
    rep64, sym64 = _bpe.train(spark, docs, 64, round_walls=walls)
    rows64 = sorted(
        tuple(r) for r in rep64.collect()
    )
    rows32 = sorted(
        tuple(r)
        for r in QUERIES["bpe_train_k32"](spark, sf_dir).collect()
    )
    assert [r for r in rows64 if r[0] <= 32] == rows32
    toks = [r[4] for r in rows64]
    assert all(b < a for a, b in zip(toks, toks[1:]))
    if len(walls) >= 32:
        half = len(walls) // 2
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        assert med(walls[half:]) < 2.5 * med(walls[:half])
    fert64 = {
        r["lang"]: r["fertility_bp"]
        for r in _bpe.fertility_by_lang(docs, sym64).collect()
    }
    fert32 = {
        r["lang"]: r["fertility_bp"]
        for r in QUERIES["bpe_fertility_k32"](spark, sf_dir).collect()
    }
    assert set(fert64) == set(fert32)
    for lang in fert64:
        assert fert64[lang] <= fert32[lang]
