"""Stateful streaming sessionization — applyInPandasWithState.

The custom-stateful-operator pattern the batch `grouping.sessionize` mirrors:
per user, split the event stream at inactivity gaps >= gap_minutes. State per
user carries (next session ordinal, last event epoch, open session start /
count); a session is EMITTED when a later event closes it by exceeding the
gap. The open tail session stays in state across triggers — exactly Spark's
session_window semantics, but hand-rolled so the session ids match the batch
operator's cumulative-gap numbering (session_id = number of gap restarts
before the session, 0-based).

The reference has no streaming layer (SURVEY.md §2.6); this is the Spark-side
capability a transcript pipeline needs for continuous ingest.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start_epoch long, session_end_epoch long"
)
STATE_SCHEMA = "sid long, last long, start long, n long"


def _sessionize_user(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_sec: int
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        sid, last, start, n = state.get
    else:
        sid, last, start, n = 0, None, None, 0
    out = []
    events = pd.concat(list(pdfs), ignore_index=True).sort_values("epoch")
    for e in events["epoch"].to_numpy():
        e = int(e)
        if last is not None and e - last >= gap_sec:
            out.append((user_id, sid, n, start, last))  # close the session
            sid += 1
            start, n = e, 0
        if start is None:
            start = e
        n += 1
        last = e
    state.update((sid, last, start, n))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_id", "n_events",
                "session_start_epoch", "session_end_epoch",
            ],
        )


def sessionize_stream(
    events_stream: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """events stream (user_id, ts, ...) → CLOSED sessions, one row per
    session once a later event seals it. The open tail per user lives in the
    group state across triggers (query the state store / final batch for it).
    """
    from pyspark.sql import functions as F

    gap_sec = gap_minutes * 60
    with_epoch = events_stream.select(
        "user_id", F.unix_timestamp(F.col("ts").cast("timestamp")).alias("epoch")
    )

    def fn(key, pdfs, state):
        yield from _sessionize_user(key, pdfs, state, gap_sec)

    return with_epoch.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
