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

# --- per-column epoch-unit decision (ADVICE r04: the per-row WHEN chain
# could silently mix units within one column; now the unit is decided once
# per column from min/max magnitude, and straddling values fail loudly) ---

_BOUNDARY_CASES = [
    # (value, expected unit) — exact band edges around 1e11 / 1e14 / 1e17
    (0, "s"),
    (1, "s"),
    (10**11 - 1, "s"),
    (10**11, "ms"),
    (10**14 - 1, "ms"),
    (10**14, "us"),
    (10**17 - 1, "us"),
    (10**17, "ns"),
    (2**63 - 1, "ns"),
]


@pytest.mark.parametrize("value,unit", _BOUNDARY_CASES)
def test_epoch_unit_band_edges(value, unit):
    from bigdatawork_spark.io import epoch_unit_for_magnitude

    assert epoch_unit_for_magnitude(value) == unit


def test_epoch_unit_roundtrip_property():
    """Hypothesis: any instant in the unambiguous 1973-2262 window encodes
    into each unit's band — the magnitude heuristic cannot misclassify a
    real date regardless of vintage."""
    from hypothesis import given, settings, strategies as st

    from bigdatawork_spark.io import epoch_unit_for_magnitude

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(
            min_value=10**11 // 1000 + 1,      # > 1e8 s  (~1973-03)
            max_value=10**14 // 1000 - 1,      # < 1e11 s (~5138) capped below
        )
    )
    def check(sec):
        # cap seconds at the 2262 ns-overflow edge so the ns encoding stays
        # a valid long
        sec = min(sec, 9_000_000_000)
        assert epoch_unit_for_magnitude(sec) == "s"
        assert epoch_unit_for_magnitude(sec * 10**3) == "ms"
        assert epoch_unit_for_magnitude(sec * 10**6) == "us"
        assert epoch_unit_for_magnitude(sec * 10**9) == "ns"

    check()


def _long_ts_events(spark, values):
    from pyspark.sql import functions as F

    rows = [(i + 1, v, 10, "view", 1.5, "{}") for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "event_id int, ts long, user_id int, event_type string, value double, props string"
    )


def test_epoch_unit_uniform_within_column(spark):
    """Regression for the r04 per-row bug: two in-band millis values —
    one of them small — must BOTH decode as millis (one column, one unit)."""
    from bigdatawork_spark.io import _normalize

    lo, hi = 2 * 10**11, 2 * 10**12  # both in the ms band
    out = _normalize(_long_ts_events(spark, [lo, hi]), "events")
    got = [r["ts"] for r in out.orderBy("event_id").collect()]
    want = [
        datetime.datetime.fromtimestamp(v / 1000, datetime.timezone.utc).replace(tzinfo=None)
        for v in (lo, hi)
    ]
    assert got == want, (got, want)


def test_epoch_unit_straddle_raises(spark):
    """Values spanning two unit bands in one column must fail loudly, not
    silently decode with mixed units."""
    from bigdatawork_spark.io import _normalize

    df = _long_ts_events(spark, [5 * 10**10, 2 * 10**12])  # s-band + ms-band
    with pytest.raises(ValueError, match="straddle"):
        _normalize(df, "events")


def test_epoch_unit_all_null_column(spark):
    from bigdatawork_spark.io import _normalize

    from pyspark.sql import functions as F

    df = _long_ts_events(spark, [0]).select(
        "event_id", F.lit(None).cast("long").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    out = _normalize(df, "events")
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0]["ts"] is None
