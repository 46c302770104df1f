"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Mirrors the documented compare: row count + schema (column names) +
order-insensitive values — but stricter where we can afford it: values are
compared exactly (after sorting columns by name and rows by all columns),
so any nondeterminism or engine mismatch fails HERE before the driver
sees it.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pandas as pd

from duck_delta_share_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        # tz-aware → naive UTC (Spark LTZ vs DuckDB naive)
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _dtype_family(dtype) -> str:
    """Collapse a pandas dtype to the family the driver's canonicalizer
    hashes by: int widths canonicalize together, but int-vs-float does NOT
    (r3 driver red: DuckDB HUGEINT → float64 hashed != Spark int64 even
    with identical values)."""
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in ("M", "m"):
        return "datetime"
    return "object"


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"{name}: columns {sc} != {dc}")
        return errs
    if errs:
        return errs
    # dtype strictness BEFORE value compare: the driver hashes the raw
    # toPandas values, so an integer-valued float64 column vs int64 fails
    # there even when every value matches numerically.
    for c in sc:
        fa, fb = _dtype_family(spark_pdf[c].dtype), _dtype_family(duck_pdf[c].dtype)
        if fa != fb and not (
            # all-NULL columns arrive as object/float NaN on either side
            spark_pdf[c].isna().all() or duck_pdf[c].isna().all()
        ):
            errs.append(
                f"{name}.{c}: dtype family spark={spark_pdf[c].dtype} ({fa}) "
                f"!= duck={duck_pdf[c].dtype} ({fb}) — driver hashes these "
                "differently even if values match"
            )
    if errs:
        return errs
    a = _normalize(spark_pdf)
    b = _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y))
            elif isinstance(x, float) and isinstance(y, float):
                ok = x == y  # exact — the driver hashes values
            else:
                ok = x == y or str(x) == str(y)
            if not ok:
                errs.append(f"{name}.{c}[{i}]: spark={x!r} duck={y!r}")
                if len(errs) > 8:
                    return errs
    return errs


def complex_output_columns(df) -> list[str]:
    """Driver contract (VERDICT r2): the driver's canonicalizer sorts the
    toPandas frame on every output column; Array/Map/Struct columns arrive
    as unhashable numpy arrays / dicts and crash it. No driver-checked
    query may emit them — serialize (array_join / to_json) instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def audit_oracle_types(con: duckdb.DuckDBPyConnection, name: str, oracle: str) -> list[str]:
    """DESCRIBE the oracle and flag types pandas will widen lossily:
    HUGEINT/UHUGEINT → float64 (the exact r3 driver red)."""
    try:
        rows = con.execute(f"DESCRIBE {oracle}").fetchall()
    except Exception as e:  # noqa: BLE001 — surface as a parity failure
        return [f"{name}: DESCRIBE failed: {e}"]
    bad = [(r[0], r[1]) for r in rows if "HUGEINT" in str(r[1]).upper()]
    return [
        f"{name}.{col}: oracle type {typ} materializes as float64 in pandas "
        "— CAST it to BIGINT/DOUBLE in the oracle SQL"
        for col, typ in bad
    ]


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from duck_delta_share_spark.plans import QUERIES

    con = duck_connection(sf_dir)
    failures: dict[str, list[str]] = {}
    for qname, qd in QUERIES.items():
        if names and qname not in names:
            continue
        df = qd.spark_fn(spark, sf_dir)
        bad = complex_output_columns(df)
        if bad:
            failures[qname] = [
                f"{qname}: complex-typed output columns {bad} would crash "
                "the driver canonicalizer — serialize them"
            ]
            continue
        if qd.oracle is None:
            # rows-only: just materialize to prove the plan executes
            n = df.count()
            if n < 0:
                failures[qname] = ["negative count?"]
            continue
        type_errs = audit_oracle_types(con, qname, qd.oracle)
        if type_errs:
            failures[qname] = type_errs
            continue
        spark_pdf = df.toPandas()
        duck_pdf = con.execute(qd.oracle).df()
        errs = compare_frames(spark_pdf, duck_pdf, qname)
        if errs:
            failures[qname] = errs
    return failures
