"""Streaming corpus-ingest curation: exact dedup ACROSS micro-batches
plus the row-local quality gate, with the stage-and-swap exactly-once
commit discipline of the CDC state store (pipelines.ParquetStateStore).

This is the ingest half of the keep-list pipeline run as documents
ARRIVE instead of as a batch sweep: each micro-batch drops rows whose
normalized-text digest was already admitted (first-arrival-wins — the
arrival-order canonical a real ingest produces; the batch keep-list's
min-doc_id canonical coincides with it when arrival order follows
doc_id) and rows failing the quality floor, then commits the admitted
set atomically.

Scale: the only cross-batch state is the admitted table, and the
dedup probe is an anti-join on its digest column — state is bounded
by DISTINCT content, not deliveries. The quality gate is a stateless
codegen projection (operators/text.quality_score — no Python worker).
Like ParquetStateStore, each commit rewrites the state dir (the
no-Delta transactional analog); at 100 TB the same logic lands on a
table format with appends + the digest column bucketed so the
anti-join is shuffle-free on the state side.

The stream-equals-batch law is pinned in tests/test_streaming.py:
end state == batch dedup_exact canonical ∩ quality floor, for a
doc_id-ordered batch split, with duplicate batch delivery replayed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import quality_score

KEEP_QUALITY_BP = 5000


def _digest() -> F.Column:
    # identical normalization to operators/dedup.dedup_exact
    return F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    )


class CurationStore:
    """foreachBatch sink maintaining the ADMITTED documents table:
    per batch — in-batch exact dedup (min doc_id per digest), anti-
    join against already-admitted digests, quality floor, atomic
    stage-and-swap commit with batch-id replay idempotence."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        quality_bp: int = KEEP_QUALITY_BP,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.quality_bp = quality_bp

    # -- state plumbing (same contract as ParquetStateStore) --------

    def _read_state(self) -> DataFrame | None:
        from pathlib import Path

        state, old = Path(self.state_dir), Path(self.state_dir + ".old")
        if not state.exists() and old.exists():
            old.rename(state)
        if not state.exists():
            return None
        return self.spark.read.parquet(self.state_dir)

    def _is_replay(self, batch_id: int) -> bool:
        from pathlib import Path

        marker = Path(self.state_dir + ".last_batch")
        return marker.exists() and marker.read_text() == str(batch_id)

    def _commit(self, admitted: DataFrame, batch_id: int) -> None:
        import shutil
        from pathlib import Path

        staging = self.state_dir + ".staging"
        admitted.write.mode("overwrite").parquet(staging)
        old = self.state_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if Path(self.state_dir).exists():
            Path(self.state_dir).rename(old)
        Path(staging).rename(self.state_dir)
        shutil.rmtree(old, ignore_errors=True)
        Path(self.state_dir + ".last_batch").write_text(str(batch_id))

    # -- the curation step ------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._is_replay(batch_id):
            return
        from pyspark.sql import Window

        with_digest = batch_df.withColumn("digest", _digest())
        # in-batch first-wins: min doc_id per digest
        w = Window.partitionBy("digest")
        batch_canonical = (
            with_digest.withColumn("_m", F.min("doc_id").over(w))
            .where(F.col("doc_id") == F.col("_m"))
            .drop("_m")
        )
        # cross-batch dedup: digest not yet admitted
        state = self._read_state()
        if state is not None:
            fresh = batch_canonical.join(
                state.select("digest"), "digest", "left_anti"
            )
        else:
            fresh = batch_canonical
        # quality floor (row-local, codegen)
        q = quality_score(fresh).select("doc_id", "quality_bp")
        kept = (
            fresh.join(q, "doc_id")
            .where(F.col("quality_bp") >= self.quality_bp)
            .drop("quality_bp")
        )
        merged = kept if state is None else state.unionByName(kept)
        # localCheckpoint cuts lineage before the overwrite (the new
        # state must not lazily re-read the dir it replaces)
        self._commit(merged.localCheckpoint(), batch_id)

    def start(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
