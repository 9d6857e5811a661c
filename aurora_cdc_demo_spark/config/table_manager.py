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
    data_size: int = 0  # bytes
    last_update: str | None = None  # ISO timestamp
    priority: int = 0
    last_processed: str | None = None
    error_count: int = 0
    last_error: str | None = None
    update_frequency: int = 0  # updates/hour

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

    def get_next_batch(
        self,
        max_tables: int | None = None,
        group: str | None = None,
    ) -> list[TableMetadata]:
        """Highest-priority tables not yet processed this round
        (reference: table_manager.py:206-240). With ``group``, the
        round is restricted to one logical table group (coordinated
        processing: e.g. drain all `order_*` tables together so
        cross-table FK consistency holds at the snapshot point)."""
        n = max_tables or self.batch_size
        pending = [m for m in self.registry.values() if m.last_processed is None]
        if group is not None:
            members = set(self.get_table_groups().get(group, []))
            pending = [m for m in pending if m.name in members]
        pending.sort(key=lambda m: (-m.priority, m.name))
        return pending[:n]

    # -- logical table groups (reference: table_manager.py:264-319) ----

    _SIZE_LARGE = 1_000 * 1024 * 1024  # > 1 GB
    _SIZE_MEDIUM = 100 * 1024 * 1024  # 100 MB - 1 GB
    _FREQ_HIGH = 50  # updates/hour
    _FREQ_MEDIUM = 10

    def get_table_groups(self) -> dict[str, list[str]]:
        """Logical table groupings for coordinated processing —
        exactly the reference's three views of the registry:
        common name prefix (`order` from `order_items`; single-token
        names have no prefix group), size class (size_large/medium/
        small on data_size), and update-frequency class
        (freq_high/medium/low_frequency on updates per hour).
        Recomputed on demand (the registry is driver-side metadata;
        no caching-vs-staleness tradeoff worth carrying)."""
        prefix_groups: dict[str, list[str]] = {}
        size_groups: dict[str, list[str]] = {
            "size_large": [],
            "size_medium": [],
            "size_small": [],
        }
        freq_groups: dict[str, list[str]] = {
            "freq_high_frequency": [],
            "freq_medium_frequency": [],
            "freq_low_frequency": [],
        }
        for name in sorted(self.registry):
            meta = self.registry[name]
            parts = name.split("_")
            if len(parts) > 1:
                prefix_groups.setdefault(parts[0], []).append(name)
            if meta.data_size > self._SIZE_LARGE:
                size_groups["size_large"].append(name)
            elif meta.data_size > self._SIZE_MEDIUM:
                size_groups["size_medium"].append(name)
            else:
                size_groups["size_small"].append(name)
            if meta.update_frequency > self._FREQ_HIGH:
                freq_groups["freq_high_frequency"].append(name)
            elif meta.update_frequency > self._FREQ_MEDIUM:
                freq_groups["freq_medium_frequency"].append(name)
            else:
                freq_groups["freq_low_frequency"].append(name)
        return {**prefix_groups, **size_groups, **freq_groups}

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
