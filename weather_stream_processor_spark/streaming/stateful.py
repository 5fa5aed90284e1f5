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

API note: Spark 4 adds transformWithStateInPandas (StatefulProcessor with
typed value/list/map state and timers) as the successor API; probed here
(RocksDB provider configured) its driver-side Python worker crashes in
this sandbox (probed round 7, RE-PROBED round 10 on this build's Spark
4.1.2 with a minimal ValueState processor over a file source +
availableNow: identical STREAM_FAILED / "TransformWithStateInPySpark
driver worker exited unexpectedly (crashed)" SQLSTATE XXKST before the
first micro-batch), so the operators stay on applyInPandasWithState — the
semantics (per-key state across micro-batches) are identical, and a
deployment on a healthy cluster can port each processor mechanically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


CUSUM_SCHEMA = (
    "event_type string, event_id bigint, ts timestamp, "
    "cusum double, is_alert boolean"
)
CUSUM_STATE_SCHEMA = "n bigint, s1 bigint, s2 bigint, c bigint, t bigint"
CUSUM_H = 4.0  # decision interval, in baseline sigmas


def _half_away(x: float) -> int:
    """round-half-away-from-zero — the ROUND semantic of Spark and DuckDB
    (Python's built-in round is banker's and would diverge on ties)."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def make_cusum_monitor(cutoff):
    """Build the per-key CUSUM state function for a given baseline cutoff.

    Events before ``cutoff`` calibrate the baseline (exact integer count /
    sum / sum-of-squares of the 1e-5-quantized value); events at/after it
    are monitored: the cumulative deviation from the floored baseline mean
    is exact bigint arithmetic, and a row is emitted with the scaled CUSUM
    and an alert flag when |dev| exceeds CUSUM_H baseline sigmas. Keys
    whose baseline has fewer than 2 events emit nothing (sigma undefined).

    State is five bigints per key — O(#keys), independent of throughput.
    The sigma expression mirrors the oracle's cast-to-double moment
    identity term by term so both engines compute the identical IEEE
    value. Quantization at 1e-5 units bounds the state: sum-of-squares
    stays within int64 up to ~1e4 events/key at value<=100; wider keys or
    values call for 1e-4 units (one line here and in the oracle).
    """
    import math

    def monitor(key, pdfs, state: GroupState):
        n, s1, s2, c, t = state.get if state.exists else (0, 0, 0, 0, 0)
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            state.update((n, s1, s2, c, t))
            return
        rows = pd.concat(chunks).sort_values(["ts", "event_id"])
        # r11 vectorization (guide §4.2): the itertuples walk was ~21
        # CPU-s at sf0.1. The sequential semantics survive vectorization
        # because calibration rows (ts < cutoff) always SORT before
        # monitored rows within a batch, so the baseline moments are
        # fixed for the whole monitored suffix, and the monitored walk
        # is t_k = t0+k, c_k = c0+cumsum(xi) — a closed form. Per-row
        # arithmetic (half-away quantization, int64 moments, banker's
        # 5dp round) is element-for-element the old loop's.
        import numpy as np

        v = rows["value"].to_numpy(dtype=np.float64) * 100000
        xi = np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)
        pre = (rows["ts"] < cutoff).to_numpy()
        n += int(pre.sum())
        s1 += int(xi[pre].sum())
        s2 += int((xi[pre] * xi[pre]).sum())
        post = ~pre
        m = int(post.sum())
        if m:
            t_k = t + 1 + np.arange(m, dtype=np.int64)
            c_k = c + np.cumsum(xi[post])
            t, c = int(t_k[-1]), int(c_k[-1])
            if n >= 2:
                dev = c_k - t_k * (s1 // n)
                sigma = math.sqrt(
                    (float(n) * float(s2) - float(s1) * float(s1))
                    / (float(n) * (n - 1.0))
                )
                state.update((n, s1, s2, c, t))
                yield pd.DataFrame(
                    {
                        "event_type": np.full(m, key[0], dtype=object),
                        "event_id": rows["event_id"].to_numpy(np.int64)[post],
                        "ts": rows["ts"].to_numpy()[post],
                        "cusum": np.round(dev / 100000.0, 5),
                        "is_alert": np.abs(dev.astype(np.float64))
                        > CUSUM_H * sigma,
                    }
                )
                return
        state.update((n, s1, s2, c, t))

    return monitor


def cusum_alert_stream(stream: DataFrame, cutoff) -> DataFrame:
    """Per-event-type streaming CUSUM monitor (see make_cusum_monitor)."""
    return (
        stream.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            make_cusum_monitor(cutoff),
            outputStructType=CUSUM_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PATTERN_SCHEMA = (
    "user_id bigint, error_id bigint, error_ts timestamp, "
    "purchase_id bigint, purchase_ts timestamp, lag_sec bigint"
)
PATTERN_STATE_SCHEMA = "pending_us array<bigint>, pending_id array<bigint>"
PATTERN_WINDOW_SEC = 3600  # a purchase closes errors from the prior hour


def _error_then_purchase(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Sequence-pattern detector: for each 'error', its FIRST 'purchase'
    strictly after it within PATTERN_WINDOW_SEC. State per key is the
    pending-unmatched-error list, pruned on every purchase (an error older
    than purchase_ts - window can never match a later purchase, since
    later purchases are even further away) — so state is bounded by the
    per-user error rate inside one window, not history length."""
    pend_us, pend_id = state.get if state.exists else ([], [])
    pend = list(zip(pend_us, pend_id))
    out = []
    win_us = PATTERN_WINDOW_SEC * 1_000_000
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for row in pdf.itertuples(index=False):
            ts_us = row.ts.value // 1000  # pandas ns -> micros
            if row.event_type == "error":
                pend.append((ts_us, int(row.event_id)))
            elif row.event_type == "purchase":
                matched = [
                    (eus, eid)
                    for eus, eid in pend
                    if ts_us - win_us <= eus < ts_us
                ]
                for eus, eid in sorted(matched):
                    out.append(
                        (
                            int(key[0]),
                            eid,
                            pd.Timestamp(eus * 1000),
                            int(row.event_id),
                            row.ts,
                            (ts_us - eus) // 1_000_000,
                        )
                    )
                # matched errors are consumed; expired ones pruned
                pend = [
                    (eus, eid) for eus, eid in pend if eus >= ts_us
                ]
    state.update(
        ([eus for eus, _ in pend], [eid for _, eid in pend])
    )
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "error_id",
                "error_ts",
                "purchase_id",
                "purchase_ts",
                "lag_sec",
            ],
        )


def error_purchase_pattern_stream(stream: DataFrame) -> DataFrame:
    """Per-user error->purchase sequence matches (see _error_then_purchase)."""
    return (
        stream.filter(F.col("event_type").isin("error", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _error_then_purchase,
            outputStructType=PATTERN_SCHEMA,
            stateStructType=PATTERN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming SCD2 maintenance (round 6) ------------------------------------

SCD2_SCHEMA = (
    "user_id bigint, attr_value string, valid_from timestamp, "
    "valid_to timestamp, version bigint"
)
# valid_from carried as epoch MICROS (bigint) — timestamps round-trip the
# state store exactly on the micros-encoded fixtures
SCD2_STATE_SCHEMA = "cur_attr string, valid_from_us bigint, version bigint"


def _scd2_tracker(key, pdfs, state: GroupState):
    """Per-user SCD2 maintenance: carry the OPEN version (attribute,
    valid_from, version counter) in state; emit a row the moment a version
    CLOSES (the observed attribute changes). Open versions live only in
    the state store — exactly how a streaming dimension pipeline feeds a
    warehouse MERGE. State is one string + two bigints per key."""
    cur, vf_us, ver = state.get if state.exists else (None, 0, 0)
    uid = key[0]
    chunks = [pdf for pdf in pdfs]
    n_closed = 0
    if chunks and sum(len(c) for c in chunks):
        import numpy as np

        rows = pd.concat(chunks).sort_values(["ts", "event_id"])
        # r11 vectorization (guide §4.2): the former per-row itertuples
        # walk was the hottest Python stage of the whole bench (~78 CPU-s
        # at sf0.1). The same sequential semantics in closed form: a
        # version boundary sits wherever the attribute differs from the
        # previous effective attribute (the carried open version before
        # row 0); each boundary closes the previous segment. numpy finds
        # the boundaries; segment starts/attrs/versions follow by
        # concatenation — identical emissions row-for-row.
        ts_us = rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
        et = rows["event_type"].to_numpy(dtype=object)
        change = np.empty(len(et), dtype=bool)
        change[0] = (cur is not None) and (et[0] != cur)
        change[1:] = et[1:] != et[:-1]
        idx = np.flatnonzero(change)
        first_attr = et[0] if cur is None else cur
        first_vf = ts_us[0] if cur is None else vf_us
        first_ver = 1 if cur is None else ver
        seg_attr = np.concatenate(([first_attr], et[idx]))
        seg_start = np.concatenate(([first_vf], ts_us[idx]))
        n_closed = len(idx)
        cur = seg_attr[-1]
        vf_us = int(seg_start[-1])
        ver = first_ver + n_closed
    state.update((cur, vf_us, ver))
    if n_closed:
        yield pd.DataFrame(
            {
                "user_id": np.full(n_closed, uid, dtype=np.int64),
                "attr_value": seg_attr[:-1],
                "valid_from": pd.Series(seg_start[:-1] * 1000).astype(
                    "datetime64[ns]"
                ),
                "valid_to": pd.Series(seg_start[1:] * 1000).astype(
                    "datetime64[ns]"
                ),
                "version": np.arange(first_ver, first_ver + n_closed, dtype=np.int64),
            }
        )


def scd2_closed_versions(stream: DataFrame) -> DataFrame:
    """CLOSED SCD2 version rows per user, emitted as the stream observes
    each attribute change (append mode; the open current version stays in
    state, never emitted — its batch twin is scd2_dimension_build WHERE
    valid_to IS NOT NULL)."""
    return (
        stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd2_tracker,
            outputStructType=SCD2_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SPRT_SCHEMA = (
    "event_type string, event_id bigint, ts timestamp, "
    "llr double, decision string"
)
SPRT_STATE_SCHEMA = "s bigint, t bigint, decided int"
# Wald SPRT per event type: H0 p=0.45 vs H1 p=0.50 for the share of
# high-value events (value >= 50.0), alpha = beta = 0.05. Increments and
# boundaries are module literals mirrored verbatim into the oracle, so
# no libm call differs. The LLR is NEVER accumulated as a float: the
# walk is linear, llr_t = s_t*LA + (t - s_t)*LB, so both engines derive
# it in closed form from INTEGER cumulative counts (DuckDB's windowed
# float SUM uses tree-order accumulation, which diverged from the
# sequential walk in the last ulp and flipped one 6-dp rounding at
# sf0.1 — integer counts make the value order-free and bit-identical).
SPRT_P0, SPRT_P1 = 0.45, 0.50
SPRT_VALUE_CUT = 50.0
import math as _math

SPRT_LA = _math.log(SPRT_P1 / SPRT_P0)
SPRT_LB = _math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))
SPRT_UP = _math.log(19.0)
SPRT_LOW = -_math.log(19.0)


def _sprt_monitor(key, pdfs, state: GroupState):
    """Per-key Wald SPRT with latched first-crossing decision. State is
    (successes, trials, decided) — three scalars per key, O(#keys); the
    LLR at every row is the CLOSED FORM s*LA + (t-s)*LB over the exact
    integer cumulative counts, never a float accumulator, so it equals
    the batch oracle's value bit-for-bit regardless of micro-batch
    boundaries or either engine's summation tree. The decision keeps
    emitting after latching while the LLR column keeps evolving — which
    is what makes every output row hash-checkable."""
    s_cnt, t_cnt, decided = state.get if state.exists else (0, 0, 0)
    chunks = [pdf for pdf in pdfs]
    if not chunks:
        state.update((s_cnt, t_cnt, decided))
        return
    rows = pd.concat(chunks).sort_values(["ts", "event_id"])
    labels = {0: "continue", 1: "accept_h1", 2: "accept_h0"}
    # r11 vectorization (guide §4.2): same per-row semantics in closed
    # form — the LLR already is s*LA + (t-s)*LB over integer cumulatives,
    # so a cumsum reproduces the walk; the latch is "first index whose
    # LLR crosses either boundary" (UP > 0 > LOW, so one row can cross
    # only one of them), constant afterwards.
    import numpy as np

    m = len(rows)
    if m:
        succ = (
            rows["value"].to_numpy(dtype=np.float64) >= SPRT_VALUE_CUT
        ).astype(np.int64)
        s_k = s_cnt + np.cumsum(succ)
        t_k = t_cnt + 1 + np.arange(m, dtype=np.int64)
        llr = s_k * SPRT_LA + (t_k - s_k) * SPRT_LB
        dec = np.full(m, decided, dtype=np.int64)
        if decided == 0:
            cross = np.flatnonzero((llr >= SPRT_UP) | (llr <= SPRT_LOW))
            if len(cross):
                f = int(cross[0])
                decided = 1 if llr[f] >= SPRT_UP else 2
                dec[f:] = decided
        s_cnt, t_cnt = int(s_k[-1]), int(t_k[-1])
        state.update((s_cnt, t_cnt, decided))
        yield pd.DataFrame(
            {
                "event_type": np.full(m, key[0], dtype=object),
                "event_id": rows["event_id"].to_numpy(np.int64),
                "ts": rows["ts"].to_numpy(),
                "llr": np.round(llr, 6),
                "decision": np.array(
                    [labels[0], labels[1], labels[2]], dtype=object
                )[dec],
            }
        )
        return
    state.update((s_cnt, t_cnt, decided))


def sprt_decision_stream(stream: DataFrame) -> DataFrame:
    """Per-event-type streaming Wald SPRT (see _sprt_monitor)."""
    return (
        stream.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _sprt_monitor,
            outputStructType=SPRT_SCHEMA,
            stateStructType=SPRT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, "
    "step bigint, seq_so_far string"
)
FUNNEL_STATE_SCHEMA = "seq string"
# adoption-funnel letters tracked by the discovery stream (error events
# are process noise and are filtered out BEFORE the stateful operator,
# so they never consume state or emit)
FUNNEL_TYPES = ("signup", "view", "click", "purchase")


def _funnel_discovery(key, pdfs, state: GroupState):
    """Per-user funnel-discovery tracker: state is the user's
    first-occurrence letter sequence so far (ONE string of at most 4
    ASCII letters — bounded, no floats, order-free value), and a row is
    emitted exactly when an event contributes a NEW letter, carrying
    that event's id/ts, the step number, and the sequence prefix. The
    SET of letters in state is batch-boundary-free, but first-occurrence
    ORDER (and hence the emitted event_id/step attribution) relies on
    the replay source's time-ordered delivery contract plus the per-key
    (ts, event_id) sort WITHIN each batch (the streaming_cusum_monitor
    contract): two funnel events with EQUAL ts split across micro-batch
    boundaries would be tie-broken by arrival, not by the batch oracle's
    global (ts, event_id) order (r10 ADVICE caveat). Under that delivery
    contract every output row hash-checks against the batch oracle's
    windowed reconstruction — which the 3-scale replay and the
    4-micro-batch split test verify."""
    (seq,) = state.get if state.exists else ("",)
    chunks = [pdf for pdf in pdfs]
    if not chunks:
        state.update((seq,))
        return
    rows = pd.concat(chunks).sort_values(["ts", "event_id"])
    out = []
    for row in rows.itertuples(index=False):
        letter = row.event_type[0]
        if letter not in seq:
            seq += letter
            out.append((key[0], row.event_id, row.ts, len(seq), seq))
    state.update((seq,))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "ts", "step", "seq_so_far"],
        )


def funnel_discovery_stream(stream: DataFrame) -> DataFrame:
    """Per-user streaming funnel discovery (see _funnel_discovery)."""
    return (
        stream.filter(F.col("event_type").isin(*FUNNEL_TYPES))
        .select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_discovery,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CS_SCHEMA = (
    "event_type string, event_id bigint, ts timestamp, "
    "trials bigint, successes bigint, p_hat double, radius double, "
    "ci_lo double, ci_hi double, h0_in_band boolean"
)
CS_STATE_SCHEMA = "s bigint, t bigint"
# Anytime confidence sequence per event type for the share of
# high-value events (same value >= 50.0 cut and p0 = 0.45 reference as
# the SPRT monitor — SPRT emits the DECISION form of sequential
# inference, this emits the INTERVAL form, the deliberate pairing).
# The stitched-boundary constant 0.72*ln(10.4/0.05) is the same literal
# as the batch twin anytime_confidence_sequence.
CS_VALUE_CUT = 50.0
CS_RADIUS_CONST = 3.8430274173849486
CS_P0 = 0.45


def _round6_half_away(x: float) -> float:
    """6-dp round-half-away-from-zero, the ROUND semantic of Spark and
    DuckDB. Python's built-in round is banker's and ALREADY diverged on
    this operator: p_hat = 49/128 = 0.3828125 is exactly dyadic, lands
    exactly on the 6-dp half grid, and round() gave 0.382812 where both
    engines give 0.382813 (caught by the first oracle run). All CS
    values are non-negative, so floor(x*1e6 + 0.5) suffices."""
    return _math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _cs_monitor(key, pdfs, state: GroupState):
    """Per-key anytime confidence sequence. State is (successes, trials)
    — two integer scalars per key, O(#keys), NO float state; p_hat and
    the stitched radius at every row are CLOSED FORMS of the exact
    integer cumulatives (one division, one ln-ln, one sqrt on identical
    doubles), so every emitted row equals the batch oracle's windowed
    reconstruction bit-for-bit regardless of micro-batch boundaries.
    The replay source's time-ordered delivery + per-key (ts, event_id)
    batch sort is the streaming_cusum_monitor contract."""
    s_cnt, t_cnt = state.get if state.exists else (0, 0)
    chunks = [pdf for pdf in pdfs]
    if not chunks:
        state.update((s_cnt, t_cnt))
        return
    rows = pd.concat(chunks).sort_values(["ts", "event_id"])
    out = []
    for row in rows.itertuples(index=False):
        t_cnt += 1
        if row.value >= CS_VALUE_CUT:
            s_cnt += 1
        p_hat = s_cnt / t_cnt
        radius = 1.7 * _math.sqrt(
            (_math.log(_math.log(2.0 * t_cnt)) + CS_RADIUS_CONST) / t_cnt
        )
        lo = max(0.0, p_hat - radius)
        hi = min(1.0, p_hat + radius)
        out.append(
            (
                key[0],
                row.event_id,
                row.ts,
                t_cnt,
                s_cnt,
                _round6_half_away(p_hat),
                _round6_half_away(radius),
                _round6_half_away(lo),
                _round6_half_away(hi),
                bool(lo <= CS_P0 <= hi),
            )
        )
    state.update((s_cnt, t_cnt))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "event_id",
                "ts",
                "trials",
                "successes",
                "p_hat",
                "radius",
                "ci_lo",
                "ci_hi",
                "h0_in_band",
            ],
        )


def cs_band_stream(stream: DataFrame) -> DataFrame:
    """Per-event-type streaming anytime confidence sequence (see
    _cs_monitor)."""
    return (
        stream.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _cs_monitor,
            outputStructType=CS_SCHEMA,
            stateStructType=CS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
