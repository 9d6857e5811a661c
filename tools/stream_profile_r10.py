"""Round-10 streaming per-batch cost profile (verdict item 6): run
the bench's exact availableNow sessionize setup and print EVERY
micro-batch's durationMs breakdown (triggerExecution components:
addBatch / getBatch / queryPlanning / walCommit / commitOffsets /
latestOffset) so the per-batch fixed cost is attributed before any
change is attempted. Untimed staging, same 32-file layout, same
maxFilesPerTrigger points as bench.py.

Usage: python tools/stream_profile_r10.py [sf_dir] [mfpt ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from aurora_cdc_demo_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mfpts = [int(a) for a in sys.argv[2:]] or [4, 16, 32]
    from aurora_cdc_demo_spark.sources.cdc_log import cdc_operation_log
    from aurora_cdc_demo_spark.streaming.stateful import sessionize_stream

    spark = get_spark("stream-profile-r10")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="streamprof_")
    try:
        log = cdc_operation_log(spark, sf_dir)
        n_events = log.count()
        log.repartition(32).write.mode("overwrite").parquet(
            f"{workdir}/in"
        )
        for mfpt in mfpts:
            t0 = time.perf_counter()
            q = (
                sessionize_stream(
                    spark.readStream.schema(
                        "key_id long, seq long, operation string, "
                        "event_type string, ts timestamp, value double"
                    )
                    .option("maxFilesPerTrigger", mfpt)
                    .parquet(f"{workdir}/in")
                )
                .writeStream.format("noop")
                .option("checkpointLocation", f"{workdir}/ckpt_{mfpt}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            wall = time.perf_counter() - t0
            print(f"\n== mfpt={mfpt} wall={wall:.3f}s "
                  f"({n_events} events) ==", flush=True)
            for p in q.recentProgress:
                d = p if isinstance(p, dict) else json.loads(p.json)
                dur = d.get("durationMs", {})
                print(
                    f"  batch {d.get('batchId')} rows="
                    f"{d.get('numInputRows', 0):6d} "
                    + " ".join(
                        f"{k}={v}" for k, v in sorted(dur.items())
                    ),
                    flush=True,
                )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
