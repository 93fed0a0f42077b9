"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, exact) — the same bar as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            nonnull = s.dropna()
            if len(nonnull) and type(nonnull.iloc[0]).__name__ in ("date", "Timestamp"):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def _dtype_class(s: pd.Series) -> str:
    """Collapse a pandas dtype to the class the driver's value hash is
    sensitive to.

    DuckDB HUGEINT (un-cast integer ``sum()``) reaches pandas as
    float64 while Spark's bigint arrives as int64 — numerically equal
    values then canonicalize to different hash inputs. Local runs must
    flag that, not paper over it with ``astype`` (ADVICE r1).

    Width within a class does NOT matter: CORRECTNESS_r01 proves it —
    ``user_value_scd2_intervals`` (spark int64 vs oracle int32) was
    hash-green while the five int-vs-float (HUGEINT) rows failed. So
    the mirror collapses widths and flags only class crossings."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return [
            f"{name}: column mismatch spark={sorted(sp.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        ]
    for c in sorted(sp.columns):
        if sp[c].isna().all() or oracle_df[c].isna().all():
            # An all-NULL column's pandas dtype is an artifact of the
            # transport (Spark toPandas -> object; DuckDB -> typed
            # float64/datetime); the driver hash agrees on all-NULL
            # values regardless, so a class mismatch here is a false
            # positive (ADVICE r2). Value comparison below still runs.
            continue
        sc, oc = _dtype_class(sp[c]), _dtype_class(oracle_df[c])
        if sc != oc:
            errors.append(
                f"{name}: column '{c}' dtype class differs pre-normalization: "
                f"spark={sp[c].dtype} ({sc}) oracle={oracle_df[c].dtype} ({oc})"
                " — would hash-mismatch under the driver even if values agree"
            )
    if len(sp) != len(oracle_df):
        errors.append(f"{name}: row count spark={len(sp)} oracle={len(oracle_df)}")
    a, b = _normalize(sp), _normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.isna(a[c]).all() and pd.isna(b[c]).all():
                # All-NULL on both sides: equal under the driver hash;
                # the numpy representations (nan vs NaT) are transport
                # artifacts (ADVICE r2).
                continue
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if pd.api.types.is_float_dtype(a[c]):
                eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            else:
                eq = (av == bv) | (pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy())
            if not eq.all():
                idx = int(np.argmin(eq))
                errors.append(
                    f"{name}: column '{c}' differs at sorted-row {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r} "
                    f"({int((~eq).sum())}/{len(eq)} rows differ)"
                )
    return errors
