"""Table registry + priority scheduler for many-table CDC — the
reference's TableManager re-expressed (reference:
src/aurora_cdc/config/table_manager.py:13-378): register tables with
volume/recency metadata, score them, hand out the next processing
batch, mark results, persist the registry.

This is scheduler METADATA (hundreds of rows, driver-side by
nature); the DATA path it schedules stays fully distributed — stats
come from one DataFrame aggregation over the change log, and the
per-batch apply is the single composite-key merge in
streaming/pipelines.py, never a per-table loop.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mirror of the reference's scoring constants
# (reference: table_manager.py:157-204)
VOLUME_CAP = 100
RECENT_HOURS_BONUS = 50
DAY_HOURS_BONUS = 20


@dataclass
class TableMetadata:
    name: str
    row_count: int = 0
    data_size: int = 0
    last_update: str | None = None  # ISO timestamp
    priority: int = 0
    last_processed: str | None = None
    error_count: int = 0
    last_error: str | None = None

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> TableMetadata:
        return cls(**d)


@dataclass
class TableManager:
    batch_size: int = 50
    anchor: str = "2024-01-31T00:00:00"
    registry: dict[str, TableMetadata] = field(default_factory=dict)

    def register_table(self, meta: TableMetadata) -> None:
        self._score(meta)
        self.registry[meta.name] = meta

    def register_tables_from_log(self, log: DataFrame) -> int:
        """Discover tables from a CDC change log with a `table`
        column (analog of information_schema discovery, reference:
        table_manager.py:97-156) — ONE distributed aggregation."""
        stats = (
            log.groupBy("table")
            .agg(
                F.count(F.lit(1)).alias("row_count"),
                F.max("ts").alias("last_update"),
            )
            .collect()
        )
        for row in stats:
            self.register_table(
                TableMetadata(
                    name=row["table"],
                    row_count=row["row_count"],
                    last_update=row["last_update"].isoformat()
                    if row["last_update"]
                    else None,
                )
            )
        return len(stats)

    def _score(self, meta: TableMetadata) -> None:
        priority = min(meta.row_count, VOLUME_CAP)
        if meta.last_update:
            anchor = datetime.fromisoformat(self.anchor)
            hours = (anchor - datetime.fromisoformat(meta.last_update)).total_seconds()
            hours //= 3600
            if hours < 1:
                priority += RECENT_HOURS_BONUS
            elif hours < 24:
                priority += DAY_HOURS_BONUS
        meta.priority = priority

    def get_next_batch(self, max_tables: int | None = None) -> list[TableMetadata]:
        """Highest-priority tables not yet processed this round
        (reference: table_manager.py:206-240)."""
        n = max_tables or self.batch_size
        pending = [m for m in self.registry.values() if m.last_processed is None]
        pending.sort(key=lambda m: (-m.priority, m.name))
        return pending[:n]

    def mark_processed(
        self, name: str, success: bool = True, error: str | None = None
    ) -> None:
        meta = self.registry[name]
        meta.last_processed = datetime.now().isoformat()
        if not success:
            meta.error_count += 1
            meta.last_error = error

    def get_statistics(self) -> dict:
        return {
            "total_tables": len(self.registry),
            "processed": sum(
                1 for m in self.registry.values() if m.last_processed
            ),
            "errors": sum(m.error_count for m in self.registry.values()),
            "total_rows": sum(m.row_count for m in self.registry.values()),
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump({n: m.to_dict() for n, m in self.registry.items()}, fh)

    @classmethod
    def load(cls, path: str, **kwargs) -> TableManager:
        mgr = cls(**kwargs)
        with open(path) as fh:
            for name, d in json.load(fh).items():
                mgr.registry[name] = TableMetadata.from_dict(d)
        return mgr
