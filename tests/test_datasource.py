"""Spark 4 Python DataSource form of the paged-API connector
(sources/datasource.py): batch read, micro-batch streaming where
Spark's offset log IS the cursor checkpoint, and restart-resume.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from snapflow_spark.sources import PagedApiDataSource

SCHEMA = "id bigint, v string"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(PagedApiDataSource)


def test_batch_read_all_pages(spark):
    df = (
        spark.read.format("paged_api")
        .schema(SCHEMA)
        .options(pager="synthetic", pages="4", page_size="6")
        .load()
    )
    rows = df.orderBy("id").collect()
    assert [r.id for r in rows] == list(range(24))
    assert rows[7].v == "rec7"
    # start_cursor resumes mid-stream (the batch analogue of resume)
    resumed = (
        spark.read.format("paged_api")
        .schema(SCHEMA)
        .options(pager="synthetic", pages="4", page_size="6", start_cursor="18")
        .load()
    )
    assert sorted(r.id for r in resumed.collect()) == list(range(18, 24))


def test_schema_required(spark):
    with pytest.raises(Exception, match="schema"):
        spark.read.format("paged_api").options(pager="synthetic").load().collect()


def _run_stream_until(spark, checkpoint, out_path, seconds=30, want=None):
    """Run the paged_api stream into a parquet sink until `want` rows
    (or timeout); returns collected rows. Micro-batches: one page each."""
    stream = (
        spark.readStream.format("paged_api")
        .schema(SCHEMA)
        .options(pager="synthetic", pages="3", page_size="5")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + seconds
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out_path).count()
            except Exception:
                n = 0
            if want is not None and n >= want:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    return spark.read.parquet(out_path).collect()


def test_stream_offsets_are_the_cursor(spark, tmp_path):
    """The streaming form of A11/A12: Spark's offset log carries the
    pager cursor; all pages arrive exactly once across micro-batches,
    and a RESTART from the same checkpoint does not re-emit committed
    pages (resume-from-cursor with zero connector-side state)."""
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    rows = _run_stream_until(spark, ckpt, out, want=15)
    assert sorted(r.id for r in rows) == list(range(15))  # exactly once

    # restart from the same checkpoint: pager is caught up, offset log
    # says cursor=15 — nothing is re-imported
    rows2 = _run_stream_until(spark, ckpt, out, seconds=4, want=None)
    assert sorted(r.id for r in rows2) == list(range(15))


def test_import_path_pager_resolution():
    """'module:callable' pagers resolve via the same import-path
    convention the YAML config uses."""
    from snapflow_spark.sources.datasource import _resolve_pager

    fetch = _resolve_pager(
        {"pager": "snapflow_spark.sources.datasource:synthetic_pager"}
    )
    records, cur = fetch(None)
    assert [r["id"] for r in records] == [0, 1, 2, 3, 4] and cur == 5
    with pytest.raises(ValueError, match="module:callable"):
        _resolve_pager({"pager": "no-colon"})
