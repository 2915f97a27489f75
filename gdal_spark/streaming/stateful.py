"""Custom stateful streaming operator: incremental sessionization with
explicit per-key state (applyInPandasWithState).

The batch engine sessionizes with a lag+cumsum window
(queries_ext.window_sessionize); this is the STREAMING form: per
user_id, an open session lives in the state store across micro-batches
and is emitted when the inactivity gap exceeds the timeout (processing
is event-time-ordered within each batch; late events beyond a closed
session start a new one — the standard trade of streaming
sessionization). This is the task-spec's "applyInPandasWithState for
custom stateful operators" surface; the reference has no streaming at
all (SURVEY §2.12), so batch parity is gated elsewhere and this module
is gated on (a) state round-tripping across micro-batches and (b)
agreement with the batch sessionizer when events arrive in order.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("dur_us", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])

GAP_US = 3_600_000_000  # 1h inactivity closes a session


def _sessionize_group(key: Tuple, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = -1
        n = 0
    closed = []
    for pdf in pdfs:
        for ts in sorted(int(v) for v in pdf["ts_us"]):
            if start_us < 0:
                start_us = last_us = ts
                n = 1
            elif ts - last_us > GAP_US:
                closed.append((user_id, start_us, n, last_us - start_us))
                start_us = last_us = ts
                n = 1
            else:
                last_us = max(last_us, ts)
                n += 1
    if start_us >= 0:
        state.update((start_us, last_us, n))
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "session_start_us",
                                            "n_events", "dur_us"])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id long, ts_us long) stream -> closed sessions.
    Open sessions stay in state until a later event closes them."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group, SESSION_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


# ------------------------------------------------ streaming exact dedup

DEDUP_OUT = T.StructType([
    T.StructField("text_hash", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
    T.StructField("first_batch", T.BooleanType()),
])

DEDUP_STATE = T.StructType([
    T.StructField("keeper", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _dedup_group(key: Tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (text_hash,) = key
    if state.exists:
        keeper, n = state.get
        first = False
    else:
        keeper, n = None, 0
        first = True
    for pdf in pdfs:
        for did in sorted(int(v) for v in pdf["doc_id"]):
            if keeper is None or did < keeper:
                keeper = did
            n += 1
    state.update((keeper, n))
    yield pd.DataFrame([(text_hash, keeper, n, first)],
                       columns=["text_hash", "doc_id", "n_seen",
                                "first_batch"])


def dedup_stream(docs: DataFrame) -> DataFrame:
    """STREAMING exact dedup: docs(doc_id long, text_hash string) ->
    per content hash, the keeper (min doc_id seen so far) and the
    running duplicate count; the hash set lives in the state store so
    duplicates are recognized ACROSS micro-batches (the incremental
    form of operators/dedup.exact_dedup — what a continuously-ingesting
    training-data pipeline runs; `first_batch` marks the batch where a
    hash was first seen, i.e. the rows a keep-first policy would emit)."""
    return (docs.groupBy("text_hash")
            .applyInPandasWithState(
                _dedup_group, DEDUP_OUT, DEDUP_STATE,
                "update", GroupStateTimeout.NoTimeout))
