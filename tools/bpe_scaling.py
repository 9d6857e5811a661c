"""One-time BPE scaling run (r5 verdict item 5): train K merge
rounds with the driver-loop trainer (operators/bpe.py) and publish
the curve — tokens-after-merge and wall-per-round — plus fertility
under the bigger vocabulary, proving the per-round cost stays
CONSTANT as K grows (the property the unrolled-chain form lacks).

Usage: python tools/bpe_scaling.py [K] [sf_dir] [out.json]
Defaults: K=256, sf_dir=/root/testdata/sf0.01, out=BPE_SCALING.json

The output JSON carries:
 - rounds: every round's (pair, n_occurrences, corpus_tokens_after)
 - wall_per_round p50/p90 for each quarter of the run — flat
   quarters == constant per-round cost
 - fertility_by_lang at K and at the registered K=32 baseline
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def _pctl(xs, q):
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(q * len(xs)))], 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BPE_SCALING.json"

    from aurora_cdc_demo_spark.operators import bpe
    from aurora_cdc_demo_spark.session import get_spark
    from aurora_cdc_demo_spark.tables import load_table

    spark = get_spark("bpe-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    walls: list[float] = []
    t0 = time.perf_counter()
    report, symbols = bpe.train(spark, docs, k, round_walls=walls)
    rounds = [
        {
            "round": r["round"],
            "pair": r["pair"],
            "n_occurrences": r["n_occurrences"],
            "corpus_tokens_after": r["corpus_tokens_after"],
        }
        for r in report.orderBy("round").collect()
    ]
    train_wall = round(time.perf_counter() - t0, 2)

    fert = {
        r["lang"]: r["fertility_bp"]
        for r in bpe.fertility_by_lang(docs, symbols).collect()
    }
    base_report, base_symbols = bpe.train(spark, docs, 32)
    fert32 = {
        r["lang"]: r["fertility_bp"]
        for r in bpe.fertility_by_lang(docs, base_symbols).collect()
    }

    nq = max(1, len(walls) // 4)
    quarters = [
        {
            "rounds": f"{i * nq + 1}-{min((i + 1) * nq, len(walls))}",
            "p50_s": _pctl(walls[i * nq:(i + 1) * nq], 0.5),
            "p90_s": _pctl(walls[i * nq:(i + 1) * nq], 0.9),
        }
        for i in range(4)
        if walls[i * nq:(i + 1) * nq]
    ]

    out = {
        "k": k,
        "sf_dir": sf_dir,
        "n_productive_rounds": len(rounds),
        "train_wall_seconds": train_wall,
        "wall_per_round_quarters": quarters,
        "tokens_after_round1": rounds[0]["corpus_tokens_after"]
        if rounds
        else None,
        "tokens_after_k": rounds[-1]["corpus_tokens_after"]
        if rounds
        else None,
        "fertility_bp_by_lang": fert,
        "fertility_bp_by_lang_k32": fert32,
        "rounds": rounds,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {kk: vv for kk, vv in out.items() if kk != "rounds"},
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
