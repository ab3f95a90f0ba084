"""Local mirror of the driver's correctness gate: run a registry query in
Spark and its oracle SQL in DuckDB over the same parquet fixtures, then
compare row count + order-insensitive value hash (columns sorted by
name, floats rounded to 6dp)."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from electrician_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return f"{r:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name,
            False,
            len(spark_pdf),
            len(oracle_pdf),
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    # Dtype-kind check: the external driver hash-compares typed values, so a
    # DuckDB HUGEINT (pandas object/float) vs Spark bigint (int64) fails there
    # even when stringified values agree. Compare numpy dtype *kinds* (int vs
    # int ok regardless of width; ns-vs-us timestamps ok) to mirror that gate
    # without false positives. Empty results can't expose a kind, skip those.
    if len(spark_pdf) and len(oracle_pdf):
        for c in sorted(spark_pdf.columns):
            ka, kb = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
            # toPandas turns a bigint-with-NULLs into float64 ('f') while
            # DuckDB keeps int64 — the real driver still sees bigint on
            # the Spark side, so an integral-WITH-NaN float is the
            # conversion artifact, not a mismatch. A NaN-free float
            # column is a genuine double (the driver would hash it as
            # one) and still fails against int.
            def _nullable_int_artifact(pdf_col, kind):
                if kind != "f":
                    return False
                s = pdf_col.dropna()
                return bool(pdf_col.isna().any() and (s == s.round()).all())

            if ka != kb and {ka, kb} <= {"i", "u", "f"}:
                if _nullable_int_artifact(spark_pdf[c], ka) or _nullable_int_artifact(
                    oracle_pdf[c], kb
                ):
                    continue
            if ka != kb and not ({ka, kb} <= {"i", "u"}):
                # Both-object (strings, arrays, decimals) is fine; a numeric
                # column arriving as object on one side only is the artifact.
                return CompareResult(
                    name,
                    False,
                    len(spark_pdf),
                    len(oracle_pdf),
                    f"dtype-kind mismatch on {c!r}: spark={spark_pdf[c].dtype} "
                    f"oracle={oracle_pdf[c].dtype} (driver hash would differ)",
                )
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if a == b:
        return CompareResult(name, True, len(spark_pdf), len(oracle_pdf))
    diff = ""
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            diff = f"first diff row {i}: spark={ra} oracle={rb}"
            break
    if not diff:
        diff = f"row count: spark={len(a)} oracle={len(b)}"
    return CompareResult(name, False, len(spark_pdf), len(oracle_pdf), diff)
