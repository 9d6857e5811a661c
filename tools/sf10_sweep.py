"""Empirical 100x-scale audit (r9, the SF1_SWEEP discipline one
decade up): execute the bench subset (bench.py HEADLINE — the ~98
timed queries) end-to-end at the synthesized sf~10 corpus under
ANSI (Spark 4 default), recording wall time or the first-line
error. The r7/r8 sf1 sweeps caught three real overflow classes;
the next decade is where the next one hides.

Writes SF10_SWEEP_r9.json. Usage:
  python tools/sf10_sweep.py [--skip a,b] [name ...]
(any restriction routes to /tmp/sf10_subset.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("SPARK_DRIVER_MEM", "64g")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402

SF10 = "/root/repo/scale_data/sf10"
CANONICAL = "SF10_SWEEP_r10.json"

# arms whose sf10 cost is the DOCUMENTED quadratic contrast (labeled
# exact oracle twins), excluded by design like the r8 scaling bench
EXCLUDED_BY_DESIGN = {
    "corpus_keep_list_v4",  # intentionally-quadratic exact twin
    "embed_near_dup",  # all-pairs exact oracle baseline
    "embed_dedup_clusters",  # consumes the all-pairs graph
    "part_edit_distance_join",  # 312M-row clone expansion (measured r8)
}


def main() -> int:
    args = sys.argv[1:]
    skip: set[str] = set()
    if args and args[0] == "--skip":
        skip = set(args[1].split(","))
        args = args[2:]
    import bench

    from aurora_cdc_demo_spark.registry import QUERIES

    names = args or [
        q
        for q in bench.HEADLINE
        if q in QUERIES and q not in EXCLUDED_BY_DESIGN
    ]
    spark = get_spark("sf10-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {}
    for name in names:
        if name in skip:
            continue
        t0 = time.time()
        try:
            QUERIES[name](spark, SF10).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.time() - t0, 2)
            print(f"OK   {name} {out[name]}s", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            out[name] = f"ERROR: {msg}"
            print(f"FAIL {name}: {msg}", flush=True)
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    path = CANONICAL if not args and not skip else "/tmp/sf10_subset.json"
    with open(path, "w") as f:
        json.dump(
            {
                "sf_dir": SF10,
                "excluded_by_design": sorted(EXCLUDED_BY_DESIGN),
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
