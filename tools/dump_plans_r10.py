"""Write plans/r10/<query>_{before,after}.txt for every query the
r10 round touched, using the committed code's own A/B toggles so the
'before' text is the exact r9 plan. Where the change lives in
construction-time jobs (gate-map builds), the dump includes the
BUILD-stage plans too (the r9 verdict's honesty item #5).

Usage: python tools/dump_plans_r10.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

OUT = "plans/r10"


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans-r10")
    spark.sparkContext.setLogLevel("ERROR")

    from aurora_cdc_demo_spark.operators import similarity as _sim
    from aurora_cdc_demo_spark.registry import QUERIES
    from aurora_cdc_demo_spark.registry import p02_text_gopher_rules as p02
    from aurora_cdc_demo_spark.tables import load_table

    def dump(fname: str, text: str):
        with open(f"{OUT}/{fname}", "w") as f:
            f.write(text)
        print("wrote", fname, flush=True)

    def composed(name: str, env: dict[str, str]) -> str:
        for k, v in env.items():
            os.environ[k] = v
        p02._GATE_CACHE.clear()
        df = QUERIES[name](spark, sf_dir)
        return _fmt(df)

    # --- dedup_minhash_lsh: postings verify -> array_intersect ----
    dump(
        "dedup_minhash_lsh_before.txt",
        composed(
            "dedup_minhash_lsh", {"SPARK_GRAFT_MINHASH_VERIFY": "postings"}
        ),
    )
    dump(
        "dedup_minhash_lsh_after.txt",
        composed(
            "dedup_minhash_lsh", {"SPARK_GRAFT_MINHASH_VERIFY": "arrays"}
        ),
    )

    # --- dedup_ppjoin_exact: scale-picked verify tail --------------
    # before = r9 unconditional arrays (shown at sf0.01, the SF whose
    # driver tail regressed); after = the auto pick at the same SF
    small = "/root/testdata/sf0.01"

    def ppjoin(env_val: str) -> str:
        os.environ["SPARK_GRAFT_PPJOIN_VERIFY"] = env_val
        p02._GATE_CACHE.clear()
        return _fmt(QUERIES["dedup_ppjoin_exact"](spark, small))

    dump("dedup_ppjoin_exact_before.txt", ppjoin("arrays"))
    dump("dedup_ppjoin_exact_after.txt", ppjoin("auto"))
    os.environ.pop("SPARK_GRAFT_PPJOIN_VERIFY", None)

    # --- semdedup family: single-statement -> shared cells/bmax ----
    # the composed (serve) plan AND the build-stage plans, since the
    # change lives in construction-time jobs
    dump(
        "semdedup_cells_before.txt",
        composed("semdedup_cells", {"SPARK_GRAFT_SEMDEDUP": "single"}),
    )
    dump(
        "semdedup_cells_after.txt",
        composed("semdedup_cells", {"SPARK_GRAFT_SEMDEDUP": "staged"}),
    )
    dump(
        "semdedup_tau_sweep_before.txt",
        composed("semdedup_tau_sweep", {"SPARK_GRAFT_SEMDEDUP": "single"}),
    )
    dump(
        "semdedup_tau_sweep_after.txt",
        composed("semdedup_tau_sweep", {"SPARK_GRAFT_SEMDEDUP": "staged"}),
    )
    # build stages (after only — before's build IS the single
    # statement above)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    cells_df = spark.sql(_sim.sem_cells_build_sql())
    cells_df.localCheckpoint().createOrReplaceTempView("sem_cells_mat")
    bmax_df = spark.sql(_sim.sem_bmax_build_sql("sem_cells_mat"))
    dump(
        "semdedup_build_stages_after.txt",
        "== sem_cells build (min-struct argmin) ==\n"
        + _fmt(cells_df)
        + "\n\n== sem_bmax build (within-cell max-cos) ==\n"
        + _fmt(bmax_df),
    )
    os.environ.pop("SPARK_GRAFT_SEMDEDUP", None)
    os.environ.pop("SPARK_GRAFT_MINHASH_VERIFY", None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
