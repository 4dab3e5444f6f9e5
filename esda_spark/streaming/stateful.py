"""Custom stateful streaming operator: running hot-cell tracker.

The brief's streaming surface calls for ``applyInPandasWithState``
where built-in windowed aggregation can't express the semantics.  The
genuinely stateful operator here is the skew detector that feeds the
batch engine's salting/quadtree decisions: per grid cell it keeps a
RUNNING document count across all micro-batches (not a window — the
density that matters for candidate-join skew is cumulative) and emits
a row whenever a cell's classification changes or its count grows by
``emit_every`` since the last emit.  State is one (count, last_emit)
pair per cell; idle cells expire via event-time timeout against the
stream's watermark, so state stays bounded by the set of recently
active cells.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from esda_spark.plans.cells import cell_key

OUTPUT_SCHEMA = (
    "cell long, total long, is_hot boolean, expired boolean"
)
STATE_SCHEMA = "total long, last_emit long"


def hot_cell_tracker(
    stream: DataFrame,
    cell_size: float,
    hot_threshold: int = 1000,
    emit_every: int = 100,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    idle_timeout_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """(cell, total, is_hot, expired) change-log stream.

    stream must carry (ts timestamp, x double, y double).  Emits when a
    cell first appears, when it crosses ``hot_threshold``, when its
    count grows by ``emit_every`` since the last emit, and a final
    ``expired=true`` row when the cell has been idle past
    ``idle_timeout_ms`` beyond the watermark (state removed).
    """
    # the watermark column must flow into the grouped relation for
    # event-time timeouts to resolve
    keyed = (
        stream.withColumn("cell", cell_key(F.col("x"), F.col("y"), cell_size))
        .withWatermark(ts_col, watermark)
        .select("cell", ts_col)
    )

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (cell,) = key
        if state.hasTimedOut:
            total, _ = state.get
            state.remove()
            yield pd.DataFrame({
                "cell": [cell], "total": [total],
                "is_hot": [total >= hot_threshold], "expired": [True],
            })
            return
        new = sum(len(pdf) for pdf in pdfs)
        total, last_emit = state.get if state.exists else (0, -1)
        total += new
        was_hot = last_emit >= 0 and last_emit >= hot_threshold
        is_hot = total >= hot_threshold
        should_emit = (
            last_emit < 0
            or (is_hot and not was_hot)
            or (total - last_emit) >= emit_every
        )
        state.update((total, total if should_emit else last_emit))
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + idle_timeout_ms
        )
        if should_emit:
            yield pd.DataFrame({
                "cell": [cell], "total": [total],
                "is_hot": [is_hot], "expired": [False],
            })

    return keyed.groupBy("cell").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
