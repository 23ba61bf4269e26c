"""Custom stateful streaming operators (applyInPandasWithState).

Reference mapping: the reference's streaming state is per-source
watermark tracking (FineGrainedWatermarkTracker, gobblin-core-base
.../writer/FineGrainedWatermarkTracker.java:63) — Spark's checkpoint
subsumes that. What Structured Streaming does NOT give natively is
user-defined per-key state that survives micro-batches with custom
update logic; ``applyInPandasWithState`` is the engine's extension
point for that (the RecordStreamProcessor analogue lifted to keyed
state, gobblin-api .../records/RecordStreamProcessor.java:35).

Operators here follow the scale rules: state is O(keys) not O(rows),
Arrow-batched (one Python call per key-group per micro-batch, not per
record), and every operator declares a state timeout so abandoned keys
age out instead of accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def running_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ema_alpha: float = 0.1,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-key running count / sum / EMA across micro-batches.

    Emits one row per key per micro-batch with the cumulative count,
    exact cumulative sum, and exponential moving average — the running
    per-key signal a native windowed aggregation can't produce (windows
    bound state in event time; this is an unbounded running fold).
    State per key is three scalars; the shuffle is the groupBy on the
    key, same as any streaming aggregation.
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("ema", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("ema", DoubleType()),
        ]
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, total, ema = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            total += float(vals.sum())
            for v in vals:
                ema = float(v) if ema is None else ema_alpha * float(v) + (1 - ema_alpha) * ema
        state.update((n, total, ema if ema is not None else 0.0))
        yield pd.DataFrame(
            {"key": [str(key[0])], "n": [n], "total": [total], "ema": [ema or 0.0]}
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def seen_keys_filter(
    df: DataFrame,
    key_cols: Sequence[str],
    payload_col: str,
    timeout: str = GroupStateTimeout.ProcessingTimeTimeout,
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Cross-batch first-occurrence filter: emit a key's payload only the
    FIRST time the key is ever seen; later occurrences (any micro-batch)
    are dropped.

    This is streaming exact dedup with an explicit state TTL —
    ``dropDuplicates`` on a stream needs an event-time watermark column
    to bound state; this variant works for keys with no usable event
    time (fingerprints, GUIDs — the AvroHeaderGuidPolicy shape) by aging
    state on processing time instead.
    """
    out_fields = [StructField(c, StringType()) for c in key_cols] + [
        StructField(payload_col, StringType())
    ]
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("seen", LongType())])

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_time = not state.exists
        state.update((1,))
        if timeout == GroupStateTimeout.ProcessingTimeTimeout:
            state.setTimeoutDuration(ttl_ms)
        if not first_time:
            return
        for pdf in pdfs:
            head = pdf.head(1)
            if len(head):
                yield pd.DataFrame(
                    {
                        **{c: [str(head.iloc[0][c])] for c in key_cols},
                        payload_col: [str(head.iloc[0][payload_col])],
                    }
                )
            break

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def funnel_tracker(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
    timeout: str = GroupStateTimeout.NoTimeout,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming funnel progression: per-user advancement through an
    ordered step list, carried across micro-batches — the live face of
    ``functions.events.funnel`` with the same first-match semantics
    (step k anchors on the user's FIRST qualifying event strictly after
    step k-1, optionally within ``within_seconds`` of it).

    Emits one row per step ADVANCEMENT — (user, step_idx, step, ts) —
    as it happens, so a conversion dashboard sees each user cross each
    stage in near-real-time instead of recomputing the batch funnel.

    Ordering contract: rows are processed in event-time order within
    each micro-batch; across batches the anchor only moves forward, so
    an event arriving in a later batch with a timestamp BEFORE the
    recorded anchor cannot retroactively advance the funnel (use the
    batch operator for reprocessing-grade answers). State per user is
    two scalars (step index + anchor micros); pass a timeout to age out
    abandoned funnels. Advancement rows are emitted exactly once, so
    they are append-shaped: pass ``output_mode="append"`` for
    append-only sinks (files), leave ``"update"`` for update sinks.
    """
    if len(steps) < 2:
        raise ValueError("funnel_tracker needs at least 2 steps")
    from pyspark.sql.types import TimestampType

    out_schema = StructType(
        [
            StructField("user", StringType()),
            StructField("step_idx", LongType()),
            StructField("step", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [StructField("idx", LongType()), StructField("anchor_us", LongType())]
    )
    step_list = list(steps)
    window_us = None if within_seconds is None else int(within_seconds) * 1_000_000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        idx, anchor_us = state.get if state.exists else (0, 0)
        adv_idx: list[int] = []
        adv_ts: list[pd.Timestamp] = []
        # the key's batch rows arrive as MULTIPLE Arrow chunks (split at
        # arrow.maxRecordsPerBatch); event-time order must hold across
        # the whole micro-batch, so concatenate before the single sort —
        # chunk-local sorting would let a later chunk's earlier event
        # silently miss its in-window successor in an earlier chunk
        chunks = [pdf[[ts_col, type_col]] for pdf in pdfs]
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        if idx < len(step_list):
            sub = batch.sort_values(ts_col, kind="stable")
            for ts, etype in zip(sub[ts_col], sub[type_col]):
                if idx >= len(step_list):
                    break
                if etype != step_list[idx]:
                    continue
                t_us = int(pd.Timestamp(ts).value // 1_000)
                if idx > 0:
                    if t_us <= anchor_us:
                        continue
                    if window_us is not None and t_us > anchor_us + window_us:
                        continue
                anchor_us = t_us
                idx += 1
                adv_idx.append(idx)
                adv_ts.append(pd.Timestamp(ts))
        state.update((idx, anchor_us))
        if timeout == GroupStateTimeout.ProcessingTimeTimeout:
            state.setTimeoutDuration(24 * 3600 * 1000)
        if adv_idx:
            yield pd.DataFrame(
                {
                    "user": [str(key[0])] * len(adv_idx),
                    "step_idx": adv_idx,
                    "step": [step_list[i - 1] for i in adv_idx],
                    "ts": adv_ts,
                }
            )

    return (
        df.groupBy(user_col)
        .applyInPandasWithState(update, out_schema, state_schema, output_mode, timeout)
    )
