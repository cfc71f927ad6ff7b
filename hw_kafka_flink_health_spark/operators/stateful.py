"""Custom stateful / grouped-map operators — the Python escape hatch.

Everything else in this engine is pure Catalyst; these two operators
demonstrate the sanctioned slow paths for semantics the built-ins can't
express (SURVEY §2.C "UDF/UDAF escape hatch"):

* `grouped_zscore` — applyInPandas grouped-map (Arrow batches, one pandas
  DataFrame per group): the UDAF-style per-group computation.
* `new_peak_stream` — applyInPandasWithState: a custom streaming operator
  with per-key GroupState (here: running-max "new peak" detection, the
  kind of per-patient monitor the reference's pipeline would grow next).
  Its deterministic batch twin (`new_peaks_batch`) is a pure window
  expression — same results on the same data, oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hw_kafka_flink_health_spark.pyship import ship_package

ZSCORE_SCHEMA = "event_id long, event_type string, value double, zscore double"


def grouped_zscore(events: DataFrame) -> DataFrame:
    """Per-event-type z-score via grouped-map pandas (ddof=1)."""
    ship_package(events.sparkSession)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)
        pdf["zscore"] = (v - v.mean()) / sd if sd and sd > 0 else 0.0
        return pdf[["event_id", "event_type", "value", "zscore"]]

    return events.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        per_group, schema=ZSCORE_SCHEMA
    )


PEAK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("event_time", T.LongType()),
        T.StructField("heart_rate_bpm", T.IntegerType()),
    ]
)
PEAK_STATE_SCHEMA = T.StructType([T.StructField("max_bpm", T.IntegerType())])


def new_peak_stream(parsed: DataFrame) -> DataFrame:
    """Streaming custom stateful operator: emit an event iff its bpm
    strictly exceeds every previously seen bpm for that patient.

    GroupState holds one int per key — O(keys) state, watermark-free
    (monotone). Rows within a micro-batch are processed in event-time
    order; cross-batch order follows stream time, as with any
    at-least-once streaming monitor.
    """
    ship_package(parsed.sparkSession)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        max_bpm = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            for _, row in pdf.sort_values("event_time").iterrows():
                bpm = int(row["heart_rate_bpm"])
                if max_bpm is None or bpm > max_bpm:
                    max_bpm = bpm
                    out.append((key[0], int(row["event_time"]), bpm))
        state.update((max_bpm,))
        if out:
            yield pd.DataFrame(out, columns=["patient_id", "event_time", "heart_rate_bpm"])

    return parsed.groupBy("patient_id").applyInPandasWithState(
        fn,
        outputStructType=PEAK_OUTPUT_SCHEMA,
        stateStructType=PEAK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def new_peaks_batch(
    df: DataFrame,
    *,
    key_col: str = "patient_id",
    ts_col: str = "event_time",
    value_col: str = "heart_rate_bpm",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Batch twin of new_peak_stream as a pure window expression: a row is
    a peak iff its value > max over all strictly-previous rows (pass
    tiebreak_cols to totalize the order under equal timestamps)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(value_col).over(w)
    return (
        df.withColumn("__prev_max", prev_max)
        .filter(F.col("__prev_max").isNull() | (F.col(value_col) > F.col("__prev_max")))
        .select(key_col, ts_col, value_col)
    )
