"""Custom stateful streaming operator (SURVEY.md §2.10):
online QC-P consecutive-run detection via ``applyInPandasWithState``.

The batch QC flags every member of a run of >= 3 equal values > 0.1 mm
whose head row has qn != 3 (StationP.py:145-166; the batch form lives in
operators/qc.qc_p). Streaming twin: per-station GroupState carries the
open run (its value, head-qn gate, and member timestamps) across
micro-batches, so a run that straddles a batch boundary is still flagged.
Rows are emitted as soon as the run reaches length 3 (the first 3 members
retroactively, every extension immediately) — the online form of the
reference's UNION of shifted timestamps.

This is the ``applyInPandasWithState`` shape: grouped Arrow batches, an
explicit state schema, append output. State per station is O(run length
<= 3) — bounded regardless of stream length.
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
_STATE_SCHEMA = T.StructType([
    T.StructField("run_val", T.DoubleType()),
    T.StructField("run_n", T.IntegerType()),
    T.StructField("qn_ok", T.BooleanType()),
    T.StructField("member_ts", T.ArrayType(T.LongType())),  # epoch us
])


def consec_run_flags(
    stream: DataFrame,
    consec_min: float = 0.1,
    run_len: int = 3,
) -> DataFrame:
    """Flag members of qn-gated equal-value runs, statefully.

    ``stream``: streaming DataFrame with (station_id, timestamp, raw, qn).
    Returns an append-mode stream of (station_id, timestamp, run_value)
    — one row per flagged member, exactly the rows the batch rule nulls.
    """
    import pandas as pd

    def fn(key, pdf_iter, state) -> Iterator["pd.DataFrame"]:
        (station_id,) = key
        if state.exists:
            run_val, run_n, qn_ok, member_ts = state.get
            member_ts = list(member_ts)
        else:
            run_val, run_n, qn_ok, member_ts = None, 0, False, []
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("timestamp")
            for ts, raw, qn in zip(
                pdf["timestamp"], pdf["raw"], pdf["qn"]
            ):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if raw is not None and run_val is not None and raw == run_val:
                    run_n += 1
                    member_ts.append(ts_us)
                    member_ts = member_ts[-run_len:]
                    if run_val > consec_min and qn_ok:
                        if run_n == run_len:
                            out_rows += [
                                (station_id, t, run_val) for t in member_ts
                            ]
                        elif run_n > run_len:
                            out_rows.append((station_id, ts_us, run_val))
                else:
                    # new run starts here; the qn gate is evaluated on the
                    # HEAD row only (StationP.py:152-159)
                    run_val = raw if raw is not None else None
                    run_n = 1 if raw is not None else 0
                    qn_ok = bool(qn != 3) if raw is not None else False
                    member_ts = [ts_us] if raw is not None else []
        state.update((run_val, run_n, qn_ok, member_ts))
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
