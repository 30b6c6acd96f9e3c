"""Custom stateful streaming operators (applyInPandasWithState) —
stream==batch equivalence under arbitrary micro-batch chunking, and
TTL-bounded state (SURVEY.md §2.11 extension)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from geospatial_object_matching_spark.streaming.stateful import (
    stream_cell_topk,
    stream_dedup_first_seen,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
    ]
)
OBJ_SCHEMA = T.StructType(
    [
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _write(path, pdf):
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
    )


def test_stream_dedup_first_seen_matches_batch(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    # 30 docs over 10 fingerprints, split across two micro-batches; the
    # first-seen winner per fingerprint is the globally smallest doc_id
    # because chunk A holds the low ids
    rows = pd.DataFrame(
        {
            "doc_id": list(range(30)),
            "fingerprint": [i % 10 for i in range(30)],
        }
    )
    _write(f"{docs_dir}/a.parquet", rows.iloc[:18])

    # two availableNow runs sharing one checkpoint: the second run must
    # restore the first's state (cross-restart continuity); parquet sink —
    # the memory sink cannot recover from a checkpoint; no TTL in the
    # replay harness (see stateful.py on processing-time timeouts)
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
        q = (
            stream_dedup_first_seen(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()

    run_once()
    _write(f"{docs_dir}/b.parquet", rows.iloc[18:])
    run_once()
    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values("fingerprint")
        .reset_index(drop=True)
    )
    # batch truth: min doc_id per fingerprint, each emitted exactly once
    want = (
        rows.groupby("fingerprint", as_index=False)["doc_id"]
        .min()
        .sort_values("fingerprint")
        .reset_index(drop=True)
    )
    assert len(got) == 10
    assert got["fingerprint"].tolist() == want["fingerprint"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_stream_cell_topk_matches_batch(spark, tmp_path):
    objs_dir = str(tmp_path / "objs")
    os.makedirs(objs_dir)
    rows = pd.DataFrame(
        {
            "cell_id": [1] * 8 + [2] * 6,
            "obj_id": [f"o{i:02d}" for i in range(14)],
            "score": [3.0, 9.0, 1.0, 7.0, 5.0, 8.0, 2.0, 6.0, 4.0, 4.0, 9.5, 0.5, 7.5, 2.5],
        }
    )
    _write(f"{objs_dir}/a.parquet", rows.iloc[:7])

    stream = spark.readStream.schema(OBJ_SCHEMA).parquet(objs_dir)
    out = stream_cell_topk(stream, k=3)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("topk_t")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(f"{objs_dir}/b.parquet", rows.iloc[7:])
        q.processAllAvailable()
        emitted = spark.table("topk_t").toPandas()
    finally:
        q.stop()
    # final leaderboard = the LAST emission per cell; batch truth = global
    # top-3 by (score desc, id asc)
    final = {}
    # emissions arrive in batch order; reconstruct per-cell latest by the
    # fact that a later emission for a cell contains its refreshed list —
    # dedupe by keeping the longest-suffix rows: re-derive from state by
    # taking rows whose (cell, rank) pair appeared LAST
    emitted["ord"] = range(len(emitted))
    last = emitted.sort_values("ord").groupby(["cell_id", "rank"]).tail(1)
    for cell, grp in last.groupby("cell_id"):
        final[cell] = (
            grp.sort_values("rank")[["obj_id", "score"]].values.tolist()
        )
    for cell in (1, 2):
        sub = rows[rows["cell_id"] == cell].sort_values(
            ["score", "obj_id"], ascending=[False, True]
        )
        want = sub.head(3)[["obj_id", "score"]].values.tolist()
        assert final[cell] == want, (cell, final[cell], want)
