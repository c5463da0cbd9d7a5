"""Custom stateful streaming operator (SURVEY.md §2.10):
online QC-P consecutive-run detection via ``applyInPandasWithState``.

The batch QC flags every member of a TRIPLE of consecutive equal values
> 0.1 mm whose head row has qn != 3 (StationP.py:145-166; the batch form
lives in operators/qc.qc_p as a UNION of three shifted-timestamp
disjuncts). Streaming twin: per-station GroupState carries the last
``run_len - 1`` rows plus an emitted-until watermark across micro-batches,
so a qualifying window that straddles a batch boundary is still flagged,
and every member is emitted exactly once. The head-qn gate is evaluated
per overlapping window exactly like the batch rule — a run
[qn=3, qn=1, qn=1, qn=1] flags rows 2-4 (the window headed at row 2),
not nothing; SQL semantics for the gate mean a NULL qn head never flags.

Rows within one micro-batch are globally time-sorted per station before
processing (Arrow may split a group into several chunks — sorting each
chunk alone would corrupt runs at chunk boundaries). Late rows arriving
in a LATER micro-batch than their successors are an inherent streaming
limit: the watermark prevents double emission, but a window only forms
from rows seen in order.

This is the ``applyInPandasWithState`` shape: grouped Arrow batches, an
explicit state schema, append output. State per station is
O(run_len) — bounded regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType([
    T.StructField("station_id", T.IntegerType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("run_value", T.DoubleType()),
])
# sliding window of the last run_len - 1 rows; qn rides as double so a
# missing qn survives the round-trip as NaN/None
_STATE_SCHEMA = T.StructType([
    T.StructField("win_ts", T.ArrayType(T.LongType())),      # epoch us
    T.StructField("win_raw", T.ArrayType(T.DoubleType())),
    T.StructField("win_qn", T.ArrayType(T.DoubleType())),
    T.StructField("emitted_until", T.LongType()),
])


def consec_run_flags(
    stream: DataFrame,
    consec_min: float = 0.1,
    run_len: int = 3,
) -> DataFrame:
    """Flag members of qn-gated equal-value runs, statefully.

    ``stream``: streaming DataFrame with (station_id, timestamp, raw, qn).
    Returns an append-mode stream of (station_id, timestamp, run_value)
    — one row per flagged member, exactly the rows the batch rule nulls
    for data arriving in time order.
    """
    import pandas as pd

    def fn(key, pdf_iter, state) -> Iterator["pd.DataFrame"]:
        (station_id,) = key
        if state.exists:
            win_ts, win_raw, win_qn, emitted_until = state.get
            window = [
                (t, r, q)
                for t, r, q in zip(list(win_ts), list(win_raw), list(win_qn))
            ]
        else:
            window, emitted_until = [], -(1 << 62)
        # one global sort per station per micro-batch: Arrow may deliver
        # the group as several chunks, each only internally ordered
        chunks = [pdf for pdf in pdf_iter]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else pd.DataFrame(
                columns=["timestamp", "raw", "qn"]
            )
        )
        pdf = pdf.sort_values("timestamp")
        out_rows = []
        for ts, raw, qn in zip(pdf["timestamp"], pdf["raw"], pdf["qn"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            raw = None if pd.isna(raw) else float(raw)
            qn = None if pd.isna(qn) else float(qn)
            if len(window) == run_len - 1:
                head_qn = window[0][2]
                head_qn = None if pd.isna(head_qn) else head_qn
                if (
                    raw is not None
                    and raw > consec_min
                    and all(
                        w_raw is not None and not pd.isna(w_raw)
                        and w_raw == raw
                        for _, w_raw, _ in window
                    )
                    # SQL `qn != 3` on the HEAD row: NULL never passes
                    and head_qn is not None
                    and head_qn != 3
                ):
                    for t in [w_ts for w_ts, _, _ in window] + [ts_us]:
                        if t > emitted_until:
                            out_rows.append((station_id, t, raw))
                            emitted_until = t
            window.append((ts_us, raw, qn))
            window = window[-(run_len - 1):]
        state.update((
            [t for t, _, _ in window],
            [r for _, r, _ in window],
            [q for _, _, q in window],
            emitted_until,
        ))
        if out_rows:
            yield pd.DataFrame(
                {
                    "station_id": [r[0] for r in out_rows],
                    "timestamp": pd.to_datetime(
                        [r[1] for r in out_rows], unit="us"
                    ),
                    "run_value": [r[2] for r in out_rows],
                }
            )

    return (
        stream.groupBy("station_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
