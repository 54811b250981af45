"""Local replica of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL side-by-side, normalizes both
frames (columns sorted by name, rows sorted by all columns), and asserts
EXACT equality — stricter than any plausible driver hash, so passing here
means passing the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from aws_data_pipeline_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> None:
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs oracle {sorted(odf.columns)}"
    )
    # dtype-CLASS parity BEFORE normalize: the driver hashes raw values, so a
    # Spark int64 vs oracle float64 (the DuckDB HUGEINT artifact — SUM(BIGINT)
    # widens to HUGEINT, .df() downgrades to float) hash-mismatches even when
    # every value is numerically equal. normalize() would mask that here;
    # catching it early is what keeps this replica stricter than the driver.
    for c in sdf.columns:
        s_int = pd.api.types.is_integer_dtype(sdf[c])
        o_int = pd.api.types.is_integer_dtype(odf[c])
        s_f = pd.api.types.is_float_dtype(sdf[c])
        o_f = pd.api.types.is_float_dtype(odf[c])
        assert not (s_int and o_f) and not (s_f and o_int), (
            f"{name}: column {c} dtype-class mismatch: spark={sdf[c].dtype} "
            f"oracle={odf[c].dtype} (HUGEINT oracle typing? CAST(... AS BIGINT))"
        )
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating):
            mismatch = ~((sv == ov) | (np.isnan(sv) & np.isnan(ov)))
        else:
            mismatch = ~(pd.Series(sv).eq(pd.Series(ov)) | (pd.isna(sv) & pd.isna(ov)))
            mismatch = np.asarray(mismatch)
        assert not mismatch.any(), (
            f"{name}: column {c} mismatches at {int(mismatch.sum())} rows; "
            f"first: spark={sv[mismatch][:3]} oracle={ov[mismatch][:3]}"
        )


# The contract itself lives in the PACKAGE (engine policy, usable by
# operational scripts without a tests/ tree on the path); re-exported here
# because every oracle replay enforces it.
from aws_data_pipeline_spark.plans.contracts import (  # noqa: F401
    CARTESIAN_OK,
    assert_plan_contract,
)


def run_compare(spark, sf_dir: str, name: str) -> None:
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry

    q = load_registry().get(name) or DEMOTED[name]
    df = q.spark_fn(spark, sf_dir)
    assert_plan_contract(df, name)
    sdf = df.toPandas()
    assert q.sql is not None, f"{name} has no oracle SQL"
    con = duck_con(sf_dir)
    try:
        odf = con.execute(q.sql).df()
    finally:
        con.close()
    compare_frames(sdf, odf, name)
