"""Custom stateful streaming operator: per-conversation incremental
collapse via applyInPandasWithState (SURVEY §2.11 scale path).

The windowed rollup in ingest.py emits per-window fragments; this
operator instead keeps ONE state row per conversation (the accumulated
turn set) and emits an updated snapshot per micro-batch with activity,
then a final row once the EVENT-TIME watermark passes the
conversation's last turn plus an idle gap (EventTimeTimeout — unlike a
processing-time timer this is deterministic, replayable from the
checkpoint, and lets a drain-style test advance time purely with
data). This is the streaming analog of
operators/collapse.py::collapse_turns — same dedup-by-turn_idx and
turn-order semantics — feeding the batch `transform` path (reference
resolver.py scores new records against fitted state; the stream keeps
each conversation's doc current for it).

Scale shape: state is partitioned by conv_id (Spark's state store
shards it with the shuffle); per-group state is O(turns in ONE
conversation), never global. The merge logic is a pure function
(`merge_turn_state`) so tests cover it directly in addition to the
end-to-end streaming drain.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("doc", T.StringType()),
        T.StructField("is_final", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType())),
        T.StructField("texts", T.ArrayType(T.StringType())),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def merge_turn_state(
    idxs: list, texts: list, new_idxs: list, new_texts: list
) -> Tuple[list, list]:
    """Merge new turns into the accumulated state: first occurrence per
    turn_idx wins (same dedup rule as batch collapse_turns), result
    ordered by turn_idx. Pure function — unit-tested directly."""
    seen = dict(zip(idxs, texts))
    for i, t in zip(new_idxs, new_texts):
        if i not in seen:
            seen[i] = t
    ordered = sorted(seen.items())
    return [i for i, _ in ordered], [t for _, t in ordered]


def _snapshot(conv_id: str, idxs: list, texts: list, final: bool) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [len(idxs)],
            "doc": [" ".join(texts)],
            "is_final": [final],
        }
    )


def _collapse_fn(idle_gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, texts, _ = state.get
            state.remove()
            yield _snapshot(conv_id, list(idxs), list(texts), True)
            return
        idxs, texts, last_ms = state.get if state.exists else ([], [], 0)
        new_idxs: list = []
        new_texts: list = []
        for pdf in pdfs:
            new_idxs.extend(int(x) for x in pdf["turn_idx"])
            new_texts.extend("" if x is None else str(x) for x in pdf["text"])
            if len(pdf):
                batch_max = pd.to_datetime(pdf["ts"]).max().value // 1_000_000
                last_ms = max(last_ms, int(batch_max))
        idxs, texts = merge_turn_state(list(idxs), list(texts), new_idxs, new_texts)
        state.update((idxs, texts, last_ms))
        # fire once the watermark passes last activity + gap; the +1
        # guard keeps the timestamp legal when the watermark has
        # already overtaken a stale conversation in the same batch
        state.setTimeoutTimestamp(
            max(last_ms + idle_gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield _snapshot(conv_id, idxs, texts, False)

    return fn


def stateful_conversation_collapse(
    turns: DataFrame,
    idle_gap: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """turns stream -> one snapshot row per (conversation, micro-batch
    with activity) plus a final row when the event-time watermark
    passes the conversation's last turn + idle_gap."""
    gap_ms = _duration_ms(idle_gap)
    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _collapse_fn(gap_ms),
            outputStructType=SNAPSHOT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(spec: str) -> int:
    """'10 minutes' / '30 seconds' / '2 hours' -> milliseconds."""
    n, unit = spec.split()
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(n) * factor
