"""Round-10 interleaved A/B harness (guide §1): alternate two
variants of the same registered query inside ONE SparkSession so
host-load drift cancels out, timing each run with the noop sink.

Variants are selected by an env-style toggle the code under test
reads AT CALL TIME (os.environ, set per round here — same-process,
so the toggle must not be read at import time).

Usage:
  python tools/ab_r10.py QUERY TOGGLE_VAR A_VAL B_VAL [rounds] [sf_dir]
    [--cold]    clear the _gate_map cache before every run (cold
                composed-artifact timing; default warm)

Prints per-round times and min/median per variant.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--cold"]
    cold = "--cold" in sys.argv
    name, var, aval, bval = args[:4]
    rounds = int(args[4]) if len(args) > 4 else 5
    sf_dir = args[5] if len(args) > 5 else "/root/testdata/sf0.1"

    from aurora_cdc_demo_spark.registry import QUERIES
    from aurora_cdc_demo_spark.registry import p02_text_gopher_rules as p02

    spark = get_spark("ab-r10")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, list[float]] = {aval: [], bval: []}
    # warm-up pass (JVM/codegen caches) under A, not recorded
    os.environ[var] = aval
    if cold:
        p02._GATE_CACHE.clear()
    QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for r in range(rounds):
        for val in (aval, bval) if r % 2 == 0 else (bval, aval):
            os.environ[var] = val
            if cold:
                p02._GATE_CACHE.clear()
            spark.sparkContext.setJobDescription(f"ab {name} {var}={val}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times[val].append(dt)
            print(f"round {r} {var}={val:12s} {dt:7.3f}s", flush=True)
    for val, ts in times.items():
        print(
            f"{var}={val}: min {min(ts):.3f}  median"
            f" {statistics.median(ts):.3f}  n {len(ts)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
