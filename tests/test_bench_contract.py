"""bench.py output contract: the final JSON line must survive the
driver's ~2000-char stdout tail capture with the FIXED headline
subset complete — no silent truncation (r3 bench dropped per-query
entries once the suite passed 50 timed queries)."""

from __future__ import annotations

import json

import bench


def _worst_case_inputs():
    # every headline query timed, worst-plausible magnitudes
    timings = {name: 9999.999 for name in bench.HEADLINE}
    timings.update(
        {
            "streaming_sessionize": 9999.999,
            "streaming_cdc_ingest": 9999.999,
            "streaming_curation": 9999.999,
        }
    )
    extras = {
        "streaming_events_per_sec": 99_999_999,
        "streaming_batch_latency": {
            "n_batches": 9999,
            "p50_ms": 9_999_999,
            "max_ms": 9_999_999,
        },
        "cdc_ingest_events_per_sec": 99_999_999,
        "datasource_replay_events_per_sec": 99_999_999,
        "native_replay_events_per_sec": 99_999_999,
        "replay_native_ratio_pct": 10000,
        "replay_floor_ok": False,
        "ingest_native_ratio_pct": 10000,
        "ingest_floor_ok": False,
        "sessionize_native_ratio_pct": 10000,
        "sessionize_floor_ok": False,
        "curation_docs_per_sec": 99_999_999,
        "keep_list_cold_seconds": 9999.999,
        "sf": 0.1,
        "sf_secondary": 0.01,
    }
    return timings, extras


def test_final_line_fits_tail_capture():
    timings, extras = _worst_case_inputs()
    line = bench.build_final(timings, extras)
    assert len(line) < 1900, len(line)


def test_final_line_subset_complete_and_stable():
    timings, extras = _worst_case_inputs()
    out = json.loads(bench.build_final(timings, extras))
    assert out["queries_subset"] is True
    # every FINAL_SUBSET key that was timed appears — nothing dropped
    present = [k for k in bench.FINAL_SUBSET if k in timings]
    assert list(out["queries"]) == present
    assert out["n_queries_timed"] == len(timings)
    # the subset stays a subset of the timed suite (catches a key
    # renamed in HEADLINE but not here)
    streaming = {
        "streaming_sessionize",
        "streaming_cdc_ingest",
        "streaming_curation",
    }
    for k in bench.FINAL_SUBSET:
        assert k in bench.HEADLINE or k in streaming, k


def test_every_headline_query_is_registered():
    from aurora_cdc_demo_spark.registry import QUERIES

    for name in bench.HEADLINE:
        assert name in QUERIES, name
