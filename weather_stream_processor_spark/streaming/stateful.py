"""Custom stateful streaming operators via applyInPandasWithState.

Built-in stateful ops (windowed agg, session windows, streaming dedup) are
in pipeline.py; this module is the seam for semantics Spark has no
operator for — per-key state carried across micro-batches as an explicit
(pandas in, pandas out, state) function. The demonstration operator is a
per-key RECORD TRACKER: emit exactly the rows that strictly exceed the
running maximum of `value` for their key, in event order.

Semantics and scale notes:
- state per key is ONE float (the running max) — state store size is
  O(#keys), independent of throughput;
- rows inside a micro-batch are sorted by (ts, id) before applying, so
  replays are deterministic; ACROSS batches order is arrival order, which
  is the honest streaming semantic (late events compare against the max
  already seen, exactly like a monitoring system would);
- GroupStateTimeout can evict idle keys; the bounded-replay tests run with
  NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RECORD_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, value double"
STATE_SCHEMA = "max_value double"


def _record_breakers(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (running_max,) = state.get if state.exists else (None,)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for row in pdf.itertuples(index=False):
            if running_max is None or row.value > running_max:
                running_max = float(row.value)
                out.append(row)
    state.update((running_max,))
    if out:
        yield pd.DataFrame(out)


def record_breaking_events(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rows that strictly exceed their key's running max of `value`."""
    return (
        stream.select("user_id", "event_id", ts_col, "value")
        .groupBy(key)
        .applyInPandasWithState(
            _record_breakers,
            outputStructType=RECORD_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
