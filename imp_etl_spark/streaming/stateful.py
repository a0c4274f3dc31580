"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps exactly one piece of cross-batch state: the four
run-level counters accumulated across micro-batches
(``services/etlService.js:526-583``, SURVEY.md A5/ST3). This module
generalizes that into a per-key stateful operator on a real event
stream: running (event count, value sum, last-seen event time) per user,
updated every micro-batch — the applyInPandasWithState shape any custom
stateful op (dedup-within-stream, sessionization with side outputs,
CDC folding) reuses.

Scale notes: state lives per key in the state store, partitioned by the
groupBy key — the shuffle is on user_id and state size is O(distinct
keys), not O(events). Arrow moves each group's rows as columnar batches
(no per-row Python overhead). With event-time timeouts + a watermark the
store evicts idle keys, bounding memory on unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# value accumulates as EXACT micro-unit integers (value quantized at 1e-6
# via decimal rounding), not a float sum: integer addition is associative,
# so the running total is independent of batch/row order AND bit-equal to
# any engine's exact decimal SUM — which makes the op oracle-checkable
# (queries.py stateful_user_stats) despite being custom stateful code.
OUTPUT_SCHEMA = ("user_id BIGINT, events BIGINT, value_sum_micro BIGINT, "
                 "last_event_us BIGINT")
STATE_SCHEMA = "events BIGINT, value_sum_micro BIGINT, last_event_us BIGINT"


def _quantize_micro(vals) -> int:
    # Quantize from the double's SHORTEST decimal representation
    # (repr), rounding halves away from zero — empirically bit-equal to
    # DuckDB's double->DECIMAL(18,6) cast, including on exact .5 ties
    # (0.0078125 -> 7812.5 -> 7813) and on values where the exact
    # binary expansion sits just below the tie (3.5e-6 is really
    # 3.4999...e-6, yet both engines read the shortest form "3.5e-6"
    # and round to 4). Parity pinned in tests/test_quantize.py.
    from decimal import ROUND_HALF_UP, Decimal

    return sum(
        int(Decimal(repr(float(v))).scaleb(6)
            .to_integral_value(rounding=ROUND_HALF_UP))
        for v in vals)


def _update_user_stats(key: tuple[Any, ...],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    cnt, vsum_micro, last_us = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        cnt += len(pdf)
        vals = pdf["value"].dropna()
        vsum_micro += _quantize_micro(vals) if len(vals) else 0
        # NaT-dropped max: a user whose events carry no timestamp has
        # no last-seen time — NULL, matching the oracle's MAX(ts) over
        # nothing (a 0 sentinel would read as 1970-01-01)
        ts_vals = pdf["ts"].dropna()
        if len(ts_vals):
            m = int(pd.Timestamp(ts_vals.max()).value // 1000)
            last_us = m if last_us is None else max(last_us, m)
    state.update((cnt, vsum_micro, last_us))
    yield pd.DataFrame(
        {"user_id": [key[0]], "events": [cnt],
         "value_sum_micro": [vsum_micro], "last_event_us": [last_us]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats over a streaming events frame.

    Emits one row per (user, micro-batch) with the cumulative totals —
    'update' output semantics; the latest row per user is the current
    state. Input needs columns user_id, ts, value.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
