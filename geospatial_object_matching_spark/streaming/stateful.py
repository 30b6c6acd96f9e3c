"""Custom stateful streaming operators via ``applyInPandasWithState``.

Spark's built-in streaming surface covers windowed aggregation and
``dropDuplicates``; a training-data ingest pipeline needs two stateful
shapes Spark lacks as built-ins (SURVEY.md §2.11 extension; the brief's
``applyInPandasWithState`` path):

- ``stream_dedup_first_seen``: keep only the FIRST document per
  fingerprint across micro-batches, with a processing-time state TTL so
  state stays bounded on an unbounded crawl (Spark's streaming
  ``dropDuplicates`` holds state forever unless watermarked on event
  time; this variant is keyed on a content fingerprint with explicit
  timeout — the shape a continuous crawl dedup actually needs).
- ``stream_cell_topk``: an incremental per-cell running top-k (W1's
  streaming analog): state holds the current top-k (score, id) heap per
  cell; each micro-batch merges its rows and emits the cell's refreshed
  top-k. Downstream sees an always-current leaderboard without
  recomputing over history.

Both operators are deterministic given the same micro-batch contents, so
tests replay the same rows in two chunk splits and assert stream==batch.

Scale notes: state is per-key and O(1)/O(k) respectively; keys partition
across executors (hash shuffle on the grouping key), so state size per
executor is bounded by keys/executors — no global structure, no driver
state. The TTL bounds total state on unbounded streams.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
    ]
)
TOPK_IN_SCHEMA = T.StructType(
    [
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)
DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def stream_dedup_first_seen(
    docs: DataFrame,
    fingerprint_col: str = "fingerprint",
    id_col: str = "doc_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming first-seen dedup: emits (fingerprint, doc_id) for the
    first document of each fingerprint; later micro-batches with the same
    fingerprint emit nothing (until the state TTL expires, if one is set).

    Within one micro-batch the winner is the smallest doc_id (the batch
    analog ``dropDuplicates`` is nondeterministic there; a deterministic
    tie-break keeps stream==batch testable).

    ``ttl_minutes`` bounds state on an unbounded crawl via
    ProcessingTimeTimeout — use it with a periodic trigger
    (``trigger(processingTime=...)``) in production.  Leave it None for
    batch-replay harnesses: registered processing-time timeouts keep the
    engine scheduling timeout-check micro-batches, so
    ``processAllAvailable``/``availableNow`` never see the query settle
    (measured: epoch 72 within a minute on a 1-file source)."""
    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60 * 1000

    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf[id_col].min())
                best = m if best is None else min(best, m)
        if state.exists or best is None:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [best]})

    return (
        docs.select(fingerprint_col, id_col)
        .groupBy(fingerprint_col)
        .applyInPandasWithState(
            fn,
            DEDUP_OUT_SCHEMA,
            DEDUP_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout,
        )
    )


TOPK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.StringType()), False),
        T.StructField("scores", T.ArrayType(T.DoubleType()), False),
    ]
)


def stream_cell_topk(
    objects: DataFrame,
    k: int = 5,
    cell_col: str = "cell_id",
    id_col: str = "obj_id",
    score_col: str = "score",
) -> DataFrame:
    """Incremental running top-k per cell: every micro-batch merges its
    rows into the cell's stored top-k and emits the refreshed list
    (append mode — downstream keeps the latest emission per cell).

    Order: score DESC, id ASC on ties — deterministic, so replaying the
    same rows in any chunking yields the same final leaderboard."""

    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, scores = state.get
            cur = list(zip(ids, scores))
        else:
            cur = []
        for pdf in pdfs:
            cur.extend(zip(pdf[id_col].astype(str), pdf[score_col].astype(float)))
        cur.sort(key=lambda t: (-t[1], t[0]))
        # drop duplicate ids (an object re-observed keeps its best score)
        seen = set()
        top = []
        for oid, sc in cur:
            if oid in seen:
                continue
            seen.add(oid)
            top.append((oid, sc))
            if len(top) == k:
                break
        state.update(([t[0] for t in top], [t[1] for t in top]))
        yield pd.DataFrame(
            {
                "cell_id": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "obj_id": [t[0] for t in top],
                "score": [t[1] for t in top],
            }
        )

    return (
        objects.select(cell_col, id_col, score_col)
        .groupBy(cell_col)
        .applyInPandasWithState(
            fn,
            TOPK_OUT_SCHEMA,
            TOPK_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
