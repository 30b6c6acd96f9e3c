"""Structured-Streaming surface: watermarked tumbling-window cell counts
over an append-only pages directory (SURVEY.md §2.11; round-2 fix — the
stream must use the watermark it is given, in append mode, with event time
carried through extraction)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.operators.extract import extract_objects
from geospatial_object_matching_spark.sources.pages import (
    generate_pages_pdf,
    page_row,
)
from geospatial_object_matching_spark.streaming.incremental import (
    stream_pages_cell_counts,
)

ZOOM = 12


def _write_pages(path: str, rows: list[dict]) -> None:
    pdf = pd.DataFrame(rows)[["url", "warc_ts", "html", "text", "lang"]]
    # Spark rejects pandas' default TIMESTAMP(NANOS)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
    )


def _rows_with_ts(n0: int, n1: int, day: str, seed: int = 42) -> list[dict]:
    rows = []
    for i in range(n0, n1):
        r = page_row(f"ent{i:07d}", "cands", seed)
        r["warc_ts"] = pd.Timestamp(day)
        rows.append(r)
    return rows


@pytest.mark.parametrize("late_case", [False, True])
def test_stream_counts_equal_batch_and_drop_late(spark, tmp_path, late_case):
    pages_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    day1 = _rows_with_ts(0, 12, "2024-01-01 10:00:00")
    day2 = _rows_with_ts(12, 20, "2024-01-02 09:00:00")
    # sentinel far in the future: advances the watermark past day1+day2 so
    # append mode emits their windows
    sentinel = _rows_with_ts(20, 21, "2024-02-01 00:00:00")
    _write_pages(f"{pages_dir}/a.parquet", day1)
    _write_pages(f"{pages_dir}/b.parquet", day2 + sentinel)

    writer = stream_pages_cell_counts(
        spark, pages_dir, ckpt, watermark="1 day", window="1 day", zoom=ZOOM
    )
    q = writer.queryName(f"cells_{late_case}").start()
    try:
        q.processAllAvailable()
        if late_case:
            # a page 30 days behind the watermark must be dropped
            _write_pages(
                f"{pages_dir}/late.parquet",
                _rows_with_ts(30, 33, "2024-01-01 11:00:00"),
            )
            q.processAllAvailable()
        got = (
            spark.table(f"cells_{late_case}")
            .toPandas()
            .sort_values(["window_start", "cell_id", "source"])
            .reset_index(drop=True)
        )
    finally:
        q.stop()

    # batch reference over the SAME (non-late, non-sentinel-window) pages
    batch_pages = spark.createDataFrame(
        pd.DataFrame(day1 + day2 + sentinel)[
            ["url", "warc_ts", "html", "text", "lang"]
        ]
    )
    objects = extract_objects(batch_pages, zoom=ZOOM, keep_ts=True)
    expected = (
        objects.withColumn("window_start", F.date_trunc("day", "warc_ts"))
        .groupBy("window_start", "cell_id", "source")
        .agg(F.count("*").alias("n_objects"))
        .filter(F.col("window_start") < F.lit("2024-02-01"))  # unemitted sentinel window
        .toPandas()
        .sort_values(["window_start", "cell_id", "source"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_objects": "int64"}), expected.astype({"n_objects": "int64"})
    )


def test_stream_plan_is_watermarked(spark, tmp_path):
    """The streaming plan must carry an EventTimeWatermark node — the
    round-1 regression was a silently ignored watermark parameter."""
    pages_dir = str(tmp_path / "p")
    os.makedirs(pages_dir)
    _write_pages(f"{pages_dir}/a.parquet", _rows_with_ts(0, 3, "2024-01-01"))
    writer = stream_pages_cell_counts(
        spark, pages_dir, str(tmp_path / "c"), watermark="2 hours", zoom=ZOOM
    )
    q = writer.queryName("wm_probe").start()
    try:
        q.processAllAvailable()
        # once a batch ran, a watermarked query reports event-time state
        assert q.lastProgress is not None
        et = q.lastProgress["eventTime"]
        assert "watermark" in et, et
    finally:
        q.stop()
