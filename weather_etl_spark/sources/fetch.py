"""External columnar source -> DataFrame (SURVEY.md §2 B.1 src_fetch).

Re-expresses the reference's source stage (A1/A2):
- columnar HTTP fetch with zero-copy float vectors
  (/root/reference/lambda_function.py:89-124; FlatBuffers decode in
  package/openmeteo_requests/Client.py:26-43),
- retry/backoff wrapper: 5 retries, backoff_factor 0.2, on HTTP
  500/502/504 (lambda_function.py:92-94;
  package/retry_requests/__init__.py:40-86),
- time-axis expansion [start, end) at a fixed interval
  (lambda_function.py:106-111).

Spark-first shape: the fetch happens on the driver (or inside a
Python DataSource partition reader at scale), lands as Arrow-backed
columns, and ``spark.createDataFrame`` hands Catalyst a normal
DataFrame with an explicit schema — no schema inference (A9).

The container has no network: the default transport is a
deterministic in-process fake — but it speaks the reference's REAL
wire format: every call encodes the payload as length-prefixed
FlatBuffers frames and decodes them back through the sentinel-checked
frame loop (see ``sources.flatbuf``, mirroring Client.py:26-43 and
the float32 zero-copy vector decode of VariableWithValues.py:58-62).
A real HTTP transport plugs in via the same byte-level ``transport``
callable without touching the Spark side.
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weather_etl_spark.registry import register
from weather_etl_spark.session import ensure_engine_confs

#: The reference's 8 measure variables, in request order — the request
#: list IS the schema (lambda_function.py:27-36, read back by index
#: 0..7 at :112-119).
MEASURES = (
    "temperature_2m",
    "relative_humidity_2m",
    "apparent_temperature",
    "rain",
    "sunshine_duration",
    "precipitation",
    "dew_point_2m",
    "wind_speed_10m",
)

WEATHER_SCHEMA = T.StructType(
    [T.StructField("date", T.TimestampType(), False)]
    + [T.StructField(m, T.DoubleType(), True) for m in MEASURES]
)


@dataclass(frozen=True)
class RetryConfig:
    """The reference's retry envelope (retry_requests/__init__.py:42-44,73)."""

    retries: int = 5
    backoff_factor: float = 0.2
    retry_statuses: tuple[int, ...] = (500, 502, 504)

    def backoff(self, attempt: int) -> float:
        return self.backoff_factor * (2**attempt)


class TransientSourceError(Exception):
    def __init__(self, status: int):
        super().__init__(f"transient source error: HTTP {status}")
        self.status = status


def generate_measure_vectors(n: int) -> dict[str, np.ndarray]:
    """The deterministic synthetic payload: 8 float32 vectors with the
    documented NaN placement ((row + measure_idx) % 37 == 0, A10)."""
    rng = np.random.default_rng(42)
    out = {}
    for i, m in enumerate(MEASURES):
        v = rng.normal(10.0 * (i + 1), 3.0, n).astype(np.float32)
        v[(np.arange(n) + i) % 37 == 0] = np.nan  # missing = NaN (A10)
        out[m] = v
    return out


def fake_wire_transport(
    start_s: int = 1704067200,  # 2024-01-01 00:00:00 UTC
    end_s: int = 1704240000,  # 2024-01-03 00:00:00 UTC (2 days)
    interval_s: int = 900,
    fail_times: int = 0,
    _state: dict | None = None,
) -> Callable[[], bytes]:
    """Byte-level fake server: encodes the synthetic series as ONE
    length-prefixed FlatBuffers TimeSeriesFrame per call — the same
    stream shape ``_process_response`` consumes (Client.py:26-43).
    The first ``fail_times`` calls raise HTTP-502 transient errors
    (retry envelope A2)."""
    from weather_etl_spark.sources.flatbuf import (
        encode_timeseries,
        frame_messages,
    )

    state = _state if _state is not None else {"calls": 0}

    def transport() -> bytes:
        state["calls"] += 1
        if state["calls"] <= fail_times:
            raise TransientSourceError(502)
        n = (end_s - start_s) // interval_s  # half-open [start, end)
        return frame_messages(
            [
                encode_timeseries(
                    start_s, end_s, interval_s, generate_measure_vectors(n)
                )
            ]
        )

    return transport


def decode_timeseries_frames(data: bytes) -> dict:
    """Client-side wire decode -> columnar dict (the reference's
    post-decode shape, lambda_function.py:105-121): splits the frame
    stream (sentinel-checked), reads each message's float32 vectors
    zero-copy, regenerates the half-open [start, end) time axis from
    the message's time box, and concatenates frames in stream order."""
    from weather_etl_spark.sources.flatbuf import (
        decode_timeseries,
        split_frames,
    )

    times, vectors = [], {m: [] for m in MEASURES}
    for message in split_frames(data):
        frame = decode_timeseries(message)
        n = (frame["end_s"] - frame["start_s"]) // frame["interval_s"]
        times.append(
            frame["start_s"]
            + frame["interval_s"] * np.arange(n, dtype=np.int64)
        )
        for m in MEASURES:
            vectors[m].append(frame["variables"][m])
    cols = {"time_s": np.concatenate(times)}
    for m in MEASURES:
        cols[m] = np.concatenate(vectors[m])
    return cols


def fake_columnar_transport(
    start_s: int = 1704067200,
    end_s: int = 1704240000,
    interval_s: int = 900,
    fail_times: int = 0,
    _state: dict | None = None,
) -> Callable[[], dict]:
    """Columnar transport = byte-level fake server + the real wire
    decode. Every call round-trips through length-prefixed FlatBuffers
    bytes, so the framing/vtable/float32-vector path is exercised by
    every source query, not just dedicated codec tests."""
    wire = fake_wire_transport(start_s, end_s, interval_s, fail_times, _state)

    def transport() -> dict:
        return decode_timeseries_frames(wire())

    return transport


def fetch_timeseries(
    spark: SparkSession,
    transport: Callable[[], dict] | None = None,
    retry: RetryConfig = RetryConfig(),
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Fetch columnar data with retries and land it as a DataFrame.

    Mirrors A1+A2: retried transport -> columnar vectors -> Arrow ->
    DataFrame with the declared schema.  NaNs are preserved (the
    reference converts NaN->NULL only at the sink, A10)."""
    ensure_engine_confs(spark)
    transport = transport or fake_columnar_transport()

    last_err: Exception | None = None
    for attempt in range(retry.retries + 1):
        try:
            cols = transport()
            break
        except TransientSourceError as err:
            last_err = err
            if err.status not in retry.retry_statuses or attempt == retry.retries:
                raise
            sleep(retry.backoff(attempt))
    else:  # pragma: no cover
        raise last_err  # type: ignore[misc]

    # Arrow table, not pandas: pandas uses NaN as its missing-value
    # sentinel, so createDataFrame(pandas) silently turns NaN into NULL —
    # breaking the reference's "NaN stays NaN until the sink" invariant
    # (A10).  Arrow keeps NaN as a value (null mask is separate), matching
    # the zero-copy float-vector decode of the reference (A1).
    import pyarrow as pa

    arrays = [
        pa.array((cols["time_s"] * 1_000_000).astype("int64")).cast(
            pa.timestamp("us")
        )
    ]
    names = ["date"]
    for m in MEASURES:
        arrays.append(pa.array(cols[m].astype("float64"), from_pandas=False))
        names.append(m)
    table = pa.Table.from_arrays(arrays, names=names)
    return spark.createDataFrame(table, schema=WEATHER_SCHEMA)


@register(
    "src_fetch",
    oracle=None,  # engine API surface, not a testdata query (rows-only)
    doc="External fetch -> DataFrame with declared schema; retry/backoff "
    "per the reference envelope (A1/A2). Offline: deterministic fake "
    "server that fails twice with HTTP 502 before succeeding, speaking "
    "the reference's real wire format (length-prefixed FlatBuffers "
    "frames, sentinel-checked, float32 vectors decoded zero-copy — "
    "sources/flatbuf.py).",
    scale_notes="Fetch is a driver-side (or Python-DataSource) boundary; "
    "everything after createDataFrame is a normal distributed plan. For "
    "many locations/shards, fan the transport out with mapInPandas over a "
    "shard table instead of looping on the driver.",
)
def src_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = fetch_timeseries(
        spark,
        transport=fake_columnar_transport(fail_times=2),
        sleep=lambda _s: None,  # don't actually sleep in tests
    )
    return df


@register(
    "src_fetch_profile",
    oracle="""
WITH meas(name, idx) AS (
  VALUES ('temperature_2m', 0), ('relative_humidity_2m', 1),
         ('apparent_temperature', 2), ('rain', 3),
         ('sunshine_duration', 4), ('precipitation', 5),
         ('dew_point_2m', 6), ('wind_speed_10m', 7)
), r AS (SELECT unnest(range(0, 192)) AS row_i)
SELECT meas.name AS measure,
       CAST(192 AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM r
             WHERE (r.row_i + meas.idx) % 37 = 0) AS BIGINT) AS n_nan,
       CAST(1704067200000000 AS BIGINT) AS min_ts_us,
       CAST(1704067200000000 + CAST(900000000 AS BIGINT) * 191
            AS BIGINT) AS max_ts_us
FROM meas
""",
    doc="Fetched-frame profile with an EXACT oracle: the fetch's "
    "deterministic contract — half-open [start,end) 15-min axis (192 "
    "rows over 2 days), per-measure NaN placement ((row+idx) %% 37 == "
    "0, A10 'NaN stays NaN until the sink'), axis bounds — recomputed "
    "arithmetically in SQL. The payload VALUES are RNG noise (not "
    "SQL-reproducible), so src_fetch itself stays rows-only; this row "
    "pins everything about the source path that IS deterministic, "
    "including the retry envelope it runs through.",
    scale_notes="Same driver-side boundary as src_fetch; the profile "
    "aggregate is a normal distributed plan over the landed frame.",
)
def src_fetch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = fetch_timeseries(
        spark,
        transport=fake_columnar_transport(fail_times=2),
        sleep=lambda _s: None,
    )
    per_measure = [
        df.agg(
            F.lit(m).alias("measure"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.isnan(m).cast("bigint")).alias("n_nan"),
            F.unix_micros(F.min("date")).alias("min_ts_us"),
            F.unix_micros(F.max("date")).alias("max_ts_us"),
        )
        for m in MEASURES
    ]
    out = per_measure[0]
    for frame in per_measure[1:]:
        out = out.unionAll(frame)
    return out


def _fetch_values_oracle() -> str:
    """Generate the exact expected payload as a DuckDB VALUES literal.

    The fake transport is fully deterministic (seeded numpy draws,
    documented NaN placement, fixed time axis) and INDEPENDENT of
    sf_dir, so the complete 192-row x 9-column payload can be pinned
    as an oracle: every float64 literal is the shortest repr of the
    widened float32 value (round-trips bit-exact), NaN cells emit
    'nan'::DOUBLE, and the time axis is epoch-us bigints.  This turns
    the fetch path's VALUE surface into a driver-checkable row —
    src_fetch itself stays rows-only because its declared schema
    carries a raw timestamp column (SURVEY §7.4 rule 5 keeps raw
    timestamps out of oracled outputs)."""
    import math

    n = (1704240000 - 1704067200) // 900
    cols = generate_measure_vectors(n)
    rows = []
    for i in range(n):
        ts = (1704067200 + 900 * i) * 1_000_000
        cells = [str(ts)]
        for m in MEASURES:
            v = float(cols[m][i])
            # string -> DOUBLE casts dodge DuckDB's VALUES decimal
            # unification, which rescales (rounds!) literals of mixed
            # fractional width before the double conversion
            cells.append(
                "'nan'::DOUBLE" if math.isnan(v) else f"'{v!r}'::DOUBLE"
            )
        rows.append("(" + ", ".join(cells) + ")")
    names = ", ".join(["ts_us"] + list(MEASURES))
    return (
        "SELECT * FROM (VALUES\n"
        + ",\n".join(rows)
        + f"\n) AS t({names})"
    )


@register(
    "src_fetch_values",
    oracle=_fetch_values_oracle(),
    doc="Full-payload value verification of the fetch path: the same "
    "retried wire-format fetch as src_fetch, projected to portable "
    "types (epoch-us bigint time axis + the 8 float64 measure columns, "
    "NaNs preserved per A10) and compared cell-by-cell against the "
    "deterministic expected payload pinned as a VALUES oracle — the "
    "192 x 9 value surface src_fetch's rows-only verdict could not "
    "cover. sf-independent by construction (the transport is an "
    "external boundary).",
    scale_notes="Same driver-side boundary as src_fetch; the "
    "projection is a normal distributed plan over the landed frame. "
    "The VALUES oracle pins the fixture contract, not a scale path.",
)
def src_fetch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = fetch_timeseries(
        spark,
        transport=fake_columnar_transport(fail_times=2),
        sleep=lambda _s: None,
    )
    return df.select(
        F.unix_micros(F.col("date")).alias("ts_us"),
        *[F.col(m) for m in MEASURES],
    )
