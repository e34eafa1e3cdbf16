"""events.ts fixture-vintage regression (io._read schema branch).

The fixture generator has shipped events.ts as parquet TIMESTAMP(NANOS)
(Spark 4 reads it only as long under nanosAsLong) and later as a µs
TIMESTAMP_NTZ.  CORRECTNESS_r02 showed the loader crashing on the NTZ
vintage ('ts div 1000' over a timestamp); this test pins both vintages to
the same µs TimestampType result so neither can regress.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from bigdatawork_spark.io import load

_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 11, 12],
    "event_type": ["view", "click", "purchase"],
    "value": [1.5, 2.5, 3.5],
    "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}'],
}
_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 2, 6, 30, 15),
    datetime.datetime(2024, 1, 3, 23, 59, 59, 123456),
]


def _write_events(dir_path, ts_array):
    table = pa.table({"event_id": _ROWS["event_id"], "ts": ts_array, **{
        k: v for k, v in _ROWS.items() if k != "event_id"
    }})
    pq.write_table(table, str(dir_path / "events.parquet"))
    return str(dir_path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("ns"),  # r01 vintage: TIMESTAMP(NANOS), nanosAsLong path
        pa.timestamp("us"),  # r02+ vintage: µs TIMESTAMP_NTZ, relabel path
        pa.timestamp("ms"),  # defensive: a ms vintage must also normalize
    ],
    ids=["nanos", "micros", "millis"],
)
def test_events_ts_vintage_loads_identically(spark, tmp_path, ts_type):
    sf_dir = _write_events(tmp_path, pa.array(_TS, type=ts_type))
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"expected µs TimestampType from {ts_type} fixture, "
        f"got {df.schema['ts'].dataType}"
    )
    got = sorted(r["ts"] for r in df.select("ts").collect())
    if ts_type == pa.timestamp("ms"):  # ms storage floors sub-ms components
        want = [t.replace(microsecond=t.microsecond // 1000 * 1000) for t in _TS]
    else:
        want = _TS
    assert got == want


def test_embeddings_element_type_drift_normalizes(spark, tmp_path):
    """A fixture vintage that widens embedding to list<double> must load
    back as the canonical array<float> (pandas-UDF ANN ops declare float32
    batch schemas)."""
    table = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[0.5, 1.5], [2.5, 3.5]], type=pa.list_(pa.float64())
            ),
            "label": pa.array([0, 1], type=pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    df = load(spark, str(tmp_path), "embeddings")
    assert df.schema["embedding"].dataType == T.ArrayType(T.FloatType()), (
        df.schema["embedding"].dataType
    )
    assert [r["embedding"] for r in df.orderBy("vec_id").collect()] == [
        [0.5, 1.5],
        [2.5, 3.5],
    ]


def test_matching_schema_adds_no_projection(spark, sf_dir):
    """When the fixture matches the canonical schema the normalizer must be
    a no-op — Q1's l_shipdate filter has to stay pushed to the parquet scan."""
    from bigdatawork_spark.plans.explain import pushed_filters
    from bigdatawork_spark.registry import QUERIES

    lines = pushed_filters(QUERIES["agg_groupby_q1"](spark, sf_dir))
    assert any("l_shipdate" in l for l in lines), lines


def test_long_timestamp_vintage_detects_epoch_unit(spark):
    """_normalize must NOT plain-cast long->timestamp (Spark reads that as
    epoch SECONDS — silent garbage for a nanos/micros/millis-as-long vintage,
    ADVICE r03).  The magnitude detector maps each epoch unit to the same
    instant."""
    from pyspark.sql import functions as F

    from bigdatawork_spark.io import _normalize

    instant = datetime.datetime(2024, 1, 2, 6, 30, 15, 123456)
    epoch_us = int(instant.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    cases = {
        "nanos": epoch_us * 1000,
        "micros": epoch_us,
        "millis": epoch_us // 1000,
        "seconds": epoch_us // 1_000_000,
    }
    for unit, val in cases.items():
        df = spark.range(1).select(
            F.lit(1).alias("event_id"),
            F.lit(val).cast("long").alias("ts"),
            F.lit(10).alias("user_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.5).alias("value"),
            F.lit("{}").alias("props"),
        )
        out = _normalize(df, "events")
        assert isinstance(out.schema["ts"].dataType, T.TimestampType), unit
        got = out.select("ts").collect()[0]["ts"]
        trunc = {"nanos": 1, "micros": 1, "millis": 1000, "seconds": 1_000_000}[unit]
        want = instant.replace(microsecond=instant.microsecond // trunc * trunc)
        assert got == want, (unit, got, want)
