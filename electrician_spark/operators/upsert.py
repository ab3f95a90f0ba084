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
    existing. Deterministic for any input order."""
    tagged_existing = existing.withColumn("_src", F.lit(0))
    tagged_batch = batch.withColumn("_src", F.lit(1))
    merged = tagged_existing.unionByName(tagged_batch)
    order = [F.col("_src").desc()] + ([o.desc() for o in order_by] if order_by else [])
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
        pg = _PG_TYPES.get(f.dataType.typeName(), "JSONB")
        null = "" if f.nullable else " NOT NULL"
        cols.append(f'"{f.name}" {pg}{null}')
    pk = f', PRIMARY KEY ({", ".join(keys)})' if keys else ""
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
    return (
        f"INSERT INTO {table} ({quoted}) VALUES ({placeholders}) "
        f'ON CONFLICT ({", ".join(keys)}) {action}'
    )
