"""Upsert / merge semantics (reference K4 Postgres writer:
INSERT ... ON CONFLICT (cols) DO UPDATE,
/root/reference/pkg/internal/adapter/postgresclient/writer.go:11-116,
sql.go:167-268).

Spark-first mapping: an upsert into a keyed table is a
last-writer-wins merge — union the existing rows with the incoming
batch, then keep one row per key by precedence (batch beats existing;
within the batch, highest version/sequence wins). At scale this is the
``foreachBatch`` + MERGE INTO pattern against a transactional table
format; the plan below is the engine-native equivalent with a single
shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    existing: DataFrame,
    batch: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Apply ``batch`` over ``existing``: rows with matching keys are
    replaced, new keys are inserted. ``order_by`` breaks ties *within*
    the batch (e.g. a seq column, highest wins); batch always beats
    existing. Deterministic for any input order: after ``order_by``
    (or when none is given) remaining ties break on a content hash of
    the full row, so the winner never depends on partition/arrival
    order — a task retry or re-run keeps the same row."""
    tagged_existing = existing.withColumn("_src", F.lit(0))
    tagged_batch = batch.withColumn("_src", F.lit(1))
    merged = tagged_existing.unionByName(tagged_batch)
    content_tiebreak = F.xxhash64(*[F.col(c) for c in batch.columns])
    order = (
        [F.col("_src").desc()]
        + ([o.desc() for o in order_by] if order_by else [])
        + [content_tiebreak.asc()]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def apply_idempotent(batch: DataFrame, keys: list[str], times: int = 2) -> DataFrame:
    """Re-applying the same batch must be a no-op (the ON CONFLICT
    round-trip check, SURVEY Q-K4): fold the batch onto an empty table
    ``times`` times and return the final state."""
    state = batch.limit(0)
    for _ in range(times):
        state = upsert(state, batch, keys)
    return state


# -- SQL generation for JDBC sinks (postgresclient/sql.go:167-268) -----------

def _quote_ident(name: str) -> str:
    """Double-quote an SQL identifier (escaping embedded quotes)."""
    return '"' + name.replace('"', '""') + '"'


_PG_TYPES = {
    "string": "TEXT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "binary": "BYTEA",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
}


def create_table_ddl(df: DataFrame, table: str, keys: list[str] | None = None) -> str:
    """CREATE TABLE IF NOT EXISTS from the DataFrame schema — the
    reference writer's auto-create DDL (sql.go buildCreateTable).
    Map/struct/array columns land as JSONB (the reference's metadata
    JSONB column)."""
    cols = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t == "decimal":  # NUMERIC, not the JSONB fallback
            pg = f"NUMERIC({f.dataType.precision}, {f.dataType.scale})"
        else:
            pg = _PG_TYPES.get(t, "JSONB")
        null = "" if f.nullable else " NOT NULL"
        cols.append(f'"{f.name}" {pg}{null}')
    # keys quoted like the column list — an unquoted mixed-case or
    # reserved-word key would fold/parse differently than its column
    pk = f', PRIMARY KEY ({", ".join(_quote_ident(k) for k in keys)})' if keys else ""
    return f'CREATE TABLE IF NOT EXISTS {table} ({", ".join(cols)}{pk})'


def upsert_sql(df: DataFrame, table: str, keys: list[str]) -> str:
    """INSERT ... ON CONFLICT (keys) DO UPDATE statement template with
    positional placeholders, for a foreachBatch JDBC executor
    (sql.go buildUpsert). Non-key columns take EXCLUDED values —
    last-writer-wins, matching :func:`upsert`."""
    names = [f.name for f in df.schema.fields]
    non_keys = [c for c in names if c not in keys]
    sets = ", ".join(f'"{c}" = EXCLUDED."{c}"' for c in non_keys)
    action = f"DO UPDATE SET {sets}" if non_keys else "DO NOTHING"
    quoted = ", ".join(f'"{c}"' for c in names)
    placeholders = ", ".join("?" for _ in names)
    # conflict keys quoted like the column list (mixed-case / reserved
    # names must resolve to the same columns the INSERT names)
    conflict = ", ".join(_quote_ident(k) for k in keys)
    return (
        f"INSERT INTO {table} ({quoted}) VALUES ({placeholders}) "
        f"ON CONFLICT ({conflict}) {action}"
    )


_DERBY_TYPES = {
    "string": "VARCHAR(32672)",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "double": "DOUBLE",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
}


def merge_sql(df: DataFrame, table: str, keys: list[str]) -> str:
    """ANSI MERGE upsert template (Derby/DB2 family; Postgres 15+ also
    speaks MERGE): one row per execution via placeholders, keyed ON the
    primary-key columns, matched rows take the new non-key values.
    Parameter order: key values (ON), non-key values (UPDATE), then all
    columns (INSERT) — see :func:`jdbc_upsert` for the executor."""
    names = [f.name for f in df.schema.fields]
    types = {
        f.name: (
            f"DECIMAL({f.dataType.precision}, {f.dataType.scale})"
            if f.dataType.typeName() == "decimal"
            else _DERBY_TYPES.get(f.dataType.typeName(), "VARCHAR(32672)")
        )
        for f in df.schema.fields
    }
    non_keys = [c for c in names if c not in keys]
    on = " AND ".join(f"{table}.{k} = CAST(? AS {types[k]})" for k in keys)
    sets = ", ".join(f"{c} = CAST(? AS {types[c]})" for c in non_keys)
    ins_cols = ", ".join(names)
    ins_vals = ", ".join(f"CAST(? AS {types[c]})" for c in names)
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if non_keys else ""
    return (
        f"MERGE INTO {table} USING SYSIBM.SYSDUMMY1 ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


# java.sql.Types constant per Spark type, for PreparedStatement.setNull:
# several JDBC drivers (Derby included, in some positions) reject
# Types.NULL as the target sqlType — NULLs must be bound with the
# column's real SQL type code.
_JDBC_TYPE_CODES = {
    "string": "VARCHAR",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "double": "DOUBLE",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "VARBINARY",
    "decimal": "DECIMAL",
}


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
    batch_size: int = 1_000,
) -> int:
    """Execute the MERGE upsert against a real JDBC database. Rows
    stream through the driver via ``toLocalIterator`` (one partition in
    memory at a time) into JDBC ``addBatch``/``executeBatch`` — the
    bounded-batch dimension-table path, mirroring the reference's
    single-process Postgres writer (writer.go:11-116). Fact-scale
    upserts belong to MERGE INTO on a transactional table format
    instead; this executor is deliberately driver-side so the database
    sees one connection and one transaction boundary per call. Returns
    the number of rows applied."""
    names = [f.name for f in df.schema.fields]
    non_keys = [c for c in names if c not in keys]
    spark = df.sparkSession
    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    null_codes = {
        f.name: getattr(
            jvm.java.sql.Types, _JDBC_TYPE_CODES.get(f.dataType.typeName(), "VARCHAR")
        )
        for f in df.schema.fields
    }
    n = 0
    try:
        conn.setAutoCommit(False)
        ps = conn.prepareStatement(merge_sql(df, table, keys))
        param_order = keys + non_keys + names
        for row in df.toLocalIterator():
            d = row.asDict()
            for i, c in enumerate(param_order, start=1):
                v = d[c]
                if v is None:
                    ps.setNull(i, null_codes[c])
                elif isinstance(v, bool):
                    ps.setBoolean(i, v)
                elif isinstance(v, int):
                    ps.setLong(i, v)
                elif isinstance(v, float):
                    ps.setDouble(i, v)
                else:
                    ps.setString(i, str(v))
            ps.addBatch()
            n += 1
            if n % batch_size == 0:
                ps.executeBatch()
        ps.executeBatch()
        conn.commit()
    except Exception:
        # roll back before close: closing a connection with an open
        # transaction makes embedded Derby raise from the close itself,
        # which (inside finally) would mask the real failure
        try:
            conn.rollback()
        except Exception:
            pass
        raise
    finally:
        conn.close()
    return n
