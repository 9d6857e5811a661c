"""Custom Python DataSource V2: replay a CDC change log directory as
a batch table or an offset-tracked stream.

Re-expression of the reference's Aurora CDC DataSource (reference:
src/aurora_cdc/datasource/aurora_cdc_datasource_v2.py): same unified
CDC event schema (operation, before/after maps, primary keys, error
flags), same offset/checkpoint contract
(initialOffset/latestOffset-read/commit), but the "binlog" is a local
JSON-lines directory instead of a MySQL socket — deterministic and
testable. The reference's JSON offset {binlog_file, binlog_position}
maps to our {"file_idx": i, "row": r}.

Batch read partitions per file (parallel scan); the stream reader is
a SimpleDataSourceStreamReader emitting bounded micro-batches with
exactly-once replay via readBetweenOffsets.

Scale note: per-file partitions parallelize the scan across
executors; `batch_size` bounds per-trigger work exactly like the
reference's `batch_size` option (reference: line 121).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CDC_EVENT_SCHEMA = StructType(
    [
        StructField("database", StringType(), False),
        StructField("table", StringType(), False),
        StructField("operation", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("seq", LongType(), False),
        StructField("before", MapType(StringType(), StringType()), True),
        StructField("after", MapType(StringType(), StringType()), True),
        StructField("primary_keys", MapType(StringType(), StringType()), True),
        StructField("is_snapshot", BooleanType(), True),
        StructField("error_flag", BooleanType(), True),
        StructField("error_message", StringType(), True),
    ]
)


def _log_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".jsonl")
    )


def _parse_line(line: str) -> tuple:
    rec = json.loads(line)
    # integer split keeps exact microseconds (float seconds would
    # lose precision at 2024-era epochs)
    us = rec["ts_us"]
    ts = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc).replace(
        tzinfo=None
    ) + timedelta(microseconds=us % 1_000_000)
    return (
        rec.get("database", "replay"),
        rec["table"],
        rec["operation"],
        ts,
        rec["seq"],
        rec.get("before"),
        rec.get("after"),
        rec.get("primary_keys"),
        rec.get("is_snapshot", False),
        rec.get("error_flag", False),
        rec.get("error_message"),
    )


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class CDCReplayBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        return [_FilePartition(f) for f in _log_files(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.file_path) as fh:
            for line in fh:
                if line.strip():
                    yield _parse_line(line)


class CDCReplayStreamReader(SimpleDataSourceStreamReader):
    """Offsets are {"file_idx": i, "row": r}: global position in the
    ordered log directory — the local analog of the reference's
    {binlog_file, binlog_position} (reference: lines 20-41)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_size = int(options.get("batch_size", "1000"))

    def initialOffset(self) -> dict:
        return {"file_idx": 0, "row": 0}

    def _read_range(self, start: dict, limit: int | None) -> tuple[list, dict]:
        files = _log_files(self.path)
        out: list[tuple] = []
        fi, row = start["file_idx"], start["row"]
        while fi < len(files):
            with open(files[fi]) as fh:
                lines = [ln for ln in fh if ln.strip()]
            while row < len(lines):
                if limit is not None and len(out) >= limit:
                    return out, {"file_idx": fi, "row": row}
                out.append(_parse_line(lines[row]))
                row += 1
            fi, row = fi + 1, 0
        return out, {"file_idx": fi, "row": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows, end = self._read_range(start, self.batch_size)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # exactly-once replay on recovery: re-read [start, end)
        rows, _ = self._read_range(start, None)
        n = self._count_between(start, end)
        return iter(rows[:n])

    def _count_between(self, start: dict, end: dict) -> int:
        files = _log_files(self.path)
        total = 0
        for fi in range(start["file_idx"], min(end["file_idx"] + 1, len(files))):
            with open(files[fi]) as fh:
                n_lines = sum(1 for ln in fh if ln.strip())
            lo = start["row"] if fi == start["file_idx"] else 0
            hi = end["row"] if fi == end["file_idx"] else n_lines
            total += max(0, hi - lo)
        return total

    def commit(self, end: dict) -> None:
        # Checkpoint the committed offset (reference: lines 479-489)
        marker = os.path.join(self.path, "_committed_offset.json")
        with open(marker, "w") as fh:
            json.dump(end, fh)


class CDCReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_replay"

    def schema(self) -> StructType:
        return CDC_EVENT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return CDCReplayBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return CDCReplayStreamReader(self.options)


def write_binlog_from_events(
    events_parquet: str, out_dir: str, rows_per_file: int = 2500
) -> int:
    """Materialize a deterministic CDC 'binlog' (JSON-lines files)
    from the events table — the local analog of the reference's
    workload generator (reference: scripts/cdc_data_generator.py).
    Returns number of events written."""
    import pyarrow.parquet as pq

    import pyarrow as pa

    table = pq.read_table(events_parquet).sort_by("event_id")
    os.makedirs(out_dir, exist_ok=True)
    ops = {"signup": "INSERT", "error": "DELETE"}
    n = table.num_rows
    eid = table.column("event_id").to_pylist()
    # pyarrow's timestamp→int64 cast yields the column's OWN unit, so
    # normalize to a known unit (ns) first — otherwise a us-unit parquet
    # column (Spark's default writer unit) would come out 1000x off.
    ts_ns = (
        table.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()).to_pylist()
    )
    uid = table.column("user_id").to_pylist()
    etype = table.column("event_type").to_pylist()
    value = table.column("value").to_pylist()
    fh = None
    for i in range(n):
        if i % rows_per_file == 0:
            if fh:
                fh.close()
            fh = open(os.path.join(out_dir, f"binlog.{i // rows_per_file:06d}.jsonl"), "w")
        ts_us = ts_ns[i] // 1000
        op = ops.get(etype[i], "UPDATE")
        after = None if op == "DELETE" else {"value": str(value[i]), "event_type": etype[i]}
        rec = {
            "database": "replay",
            # deterministic multi-table routing: exercises the
            # many-table CDC path (reference handles 500+ tables)
            "table": f"users_{uid[i] % 4}",
            "operation": op,
            "ts_us": ts_us,
            "seq": eid[i],
            "before": None,
            "after": after,
            "primary_keys": {"key_id": str(uid[i])},
        }
        fh.write(json.dumps(rec) + "\n")
    if fh:
        fh.close()
    return n
