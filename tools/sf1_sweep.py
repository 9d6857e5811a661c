"""Empirical 10x-scale audit: execute EVERY registered query
end-to-end at the synthesized sf~1 corpus (tools/make_scale_data.py)
and record wall time or the first-line error. This is the overflow /
scale-fragility detector the supplier_revenue_pareto BIGINT overflow
proved necessary: ANSI mode turns silent wraparound into a caught
ArithmeticException, and any operator whose constants or frames
break at 10x fails here instead of on a cluster.

Writes SF1_SWEEP_r8.json {query: seconds | "ERROR: ..."}. Queries
are run in sorted order; pass names to restrict, or
--skip name1,name2 to exclude — either restriction routes output to
/tmp/sf1_subset.json so the canonical full-sweep record is never
clobbered by a partial run.

Usage: python tools/sf1_sweep.py [--skip a,b] [name ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

SF1 = "/root/repo/scale_data/sf1"
CANONICAL = "SF1_SWEEP_r8.json"


def main() -> int:
    args = sys.argv[1:]
    skip: set[str] = set()
    if args and args[0] == "--skip":
        skip = set(args[1].split(","))
        args = args[2:]
    from aurora_cdc_demo_spark.registry import QUERIES

    names = args or sorted(QUERIES)
    spark = get_spark("sf1-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {}
    for name in names:
        if name in skip:
            continue
        t0 = time.time()
        try:
            QUERIES[name](spark, SF1).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.time() - t0, 2)
            print(f"OK   {name} {out[name]}s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            out[name] = f"ERROR: {msg}"
            print(f"FAIL {name}: {msg}", flush=True)
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    # subset runs must never clobber the full-sweep record: ANY
    # restriction — positional names OR --skip (ADVICE r7) — routes
    # to the scratch path; only a truly-full sweep writes canonical.
    path = (
        CANONICAL if not args and not skip else "/tmp/sf1_subset.json"
    )
    with open(path, "w") as f:
        json.dump(
            {
                "sf_dir": SF1,
                "n_ok": len(out) - len(errs),
                "n_error": len(errs),
                "results": out,
            },
            f,
            indent=1,
        )
    print(json.dumps({"n_ok": len(out) - len(errs), "n_error": len(errs)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
