"""One-off audit: mimic the external driver's canonicalizer strictness.

For every oracled registered query, run Spark and DuckDB at sf0.001 and
flag anything the driver's pandas-level hasher would trip on even when
values are identical:

  * dtype family mismatch per column (int vs float vs object vs bool);
  * array/list-typed cells (unhashable in a naive sort_values/hash);
  * object columns whose Python types differ (Decimal vs float, etc).

Run:  python tools/audit_driver_typing.py [name_prefix ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

from weather_etl_spark.registry import load_all
from weather_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def family(dtype, sample) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if sample is not None and isinstance(sample, (list, np.ndarray)):
        return "ARRAY"
    if sample is not None and type(sample).__name__ == "Decimal":
        return "decimal"
    return "object"


def main() -> None:
    prefixes = tuple(sys.argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    problems = 0
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            sdf = spec.fn(spark, SF_DIR).toPandas()
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: EXEC-ERROR {type(e).__name__}: {e}")
            problems += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"{name}: COLUMN-MISMATCH spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            problems += 1
            continue
        for c in sorted(sdf.columns):
            s_samp = sdf[c].dropna().iloc[0] if len(sdf[c].dropna()) else None
            o_samp = odf[c].dropna().iloc[0] if len(odf[c].dropna()) else None
            fs, fo = family(sdf[c].dtype, s_samp), family(odf[c].dtype, o_samp)
            if fs != fo or "ARRAY" in (fs, fo) or "decimal" in (fs, fo):
                print(f"{name}.{c}: spark={sdf[c].dtype}/{fs} "
                      f"oracle={odf[c].dtype}/{fo} "
                      f"sample spark={s_samp!r} oracle={o_samp!r}")
                problems += 1
    print(f"--- {problems} potential driver-typing problems")


if __name__ == "__main__":
    main()
