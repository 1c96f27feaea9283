"""SnapshotStore — an ordered sequence of immutable parquet snapshots.

The Spark re-expression of snapflow's DataBlock stream (SURVEY §1.1):
each ``append`` writes one immutable snapshot dir; readers union any
subset. Parquet dirs written by executors scale to any size — the
store itself is only naming + listing, so the metadata cost is O(#
snapshots), never O(rows).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)

    def snapshot_ids(self) -> list[str]:
        """Only COMMITTED snapshots: Spark's parquet committer drops a
        _SUCCESS marker at job commit, so a dir Spark is still writing
        (e.g. a live stream epoch) is invisible to readers — without
        this, a concurrent batch tick could consume a partial snapshot
        and mark it done, silently losing the rest of its rows."""
        return sorted(
            p.name for p in self.path.iterdir()
            if p.is_dir()
            and p.name.startswith("snapshot-")
            and (p / "_SUCCESS").exists()
        )

    def _next_id(self) -> str:
        ids = self.snapshot_ids()
        n = int(ids[-1].split("-")[1]) + 1 if ids else 0
        return f"snapshot-{n:06d}"

    def _write_snapshot(self, df: DataFrame, sid: str) -> None:
        """Commit protocol shared by append/compact: write to a
        dot-prefixed temp dir (never listed, never claims an id), then
        os.rename into place. A crashed write leaves only a temp dir —
        reclaimed by the next writer of the same id — and the rename
        fails LOUDLY if the target exists (a concurrent writer already
        committed this id), instead of destroying anyone's output."""
        import shutil

        target = self.path / sid
        tmp = self.path / f".{sid}.tmp"
        if tmp.exists():  # crashed earlier write of this id
            shutil.rmtree(tmp)
        df.write.mode("errorifexists").parquet(str(tmp))
        os.rename(tmp, target)

    def append(self, df: DataFrame) -> str:
        """Write one immutable snapshot; returns its id."""
        sid = self._next_id()
        self._write_snapshot(df, sid)
        return sid

    def read(self, spark: SparkSession, ids: list[str] | None = None) -> DataFrame | None:
        """Union of the given snapshots (default: all). None if empty —
        a node with no unconsumed input simply does not run, mirroring
        snapflow's reactive fixed point."""
        ids = self.snapshot_ids() if ids is None else ids
        if not ids:
            return None
        return spark.read.parquet(*[str(self.path / sid) for sid in ids])

    def read_latest(self, spark: SparkSession) -> DataFrame | None:
        """Stream op ``latest`` (SURVEY §2.A A7): most recent snapshot only."""
        ids = self.snapshot_ids()
        return self.read(spark, ids[-1:]) if ids else None

    def compact(self, spark: SparkSession) -> tuple[str | None, list[str]]:
        """Merge all snapshots into one (returns (new_id, retired_ids)).

        A long-lived accumulator store grows one dir per tick; readers
        then pay per-snapshot listing + many small files — the classic
        small-files problem. Compaction rewrites history, so consumers'
        ledgers must be fixed up atomically with it: use
        ``Pipeline.compact_store`` rather than calling this directly
        inside a pipeline (it marks the new snapshot consumed for every
        node that had consumed ALL retired ones)."""
        import shutil

        old = self.snapshot_ids()
        if len(old) <= 1:
            return None, []
        merged = self.read(spark, old)
        sid = self._next_id()
        self._write_snapshot(merged, sid)
        for o in old:
            shutil.rmtree(self.path / o)
        return sid, old
