"""Ignore-list table [S5, I2, I3] — IgnoreFile analog.

The reference persists ignored group fingerprints in
``.dupes-ignore.toml`` (``dupes-core/src/ignore.rs:12-56``) with CRUD +
staleness cleanup. Here the list is a small table in the warehouse
(`ignore(fingerprint BIGINT, reason STRING)` — fingerprint is STRING hex
when cfg.fingerprint_bits=128), always broadcast when joined. With the
Iceberg jar present (catalog.iceberg) the CRUD runs as MERGE INTO /
DELETE FROM row-level operations on the Iceberg table (exercised by
tests/test_iceberg.py, jar-gated); the parquet fallback rewrites the
(tiny) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import IGNORE, IGNORE_WIDE
from .catalog import Catalog

TABLE = "ignore"


def _schema_for(fp) -> "object":
    """Width follows the fingerprint VALUE: int -> 64-bit BIGINT row,
    str (32-char hex) -> 128-bit STRING row."""
    return IGNORE_WIDE if isinstance(fp, str) else IGNORE


def _sql_type(fp) -> str:
    return "STRING" if isinstance(fp, str) else "BIGINT"


def _ensure_iceberg_table(catalog: Catalog, fp) -> None:  # pragma: no cover
    catalog.spark.sql(
        f"CREATE TABLE IF NOT EXISTS {catalog.table_ref(TABLE)} "
        f"(fingerprint {_sql_type(fp)}, reason STRING) USING iceberg"
    )


def load_ignore(catalog: Catalog, bits: int = 64) -> DataFrame:
    """``bits`` picks the empty-table schema when nothing is persisted yet
    (an existing table keeps its own width)."""
    if not catalog.exists(TABLE):
        return catalog.spark.createDataFrame(
            [], IGNORE_WIDE if bits == 128 else IGNORE
        )
    return catalog.read(TABLE)


def save_ignore(catalog: Catalog, df: DataFrame) -> None:
    # tiny table (the TOML-file analog): materialize on the driver before
    # overwriting — a lazy plan still reading the old files would race the
    # overwrite (Spark reads lazily; the write deletes the input)
    rows = df.collect()
    schema = df.schema
    catalog.write(
        catalog.spark.createDataFrame(rows, schema).coalesce(1), TABLE
    )


def add_ignore(
    catalog: Catalog, fingerprint: int | str, reason: str | None = None
) -> bool:
    """Insert-if-absent (``ignore.rs:66-78``). Returns False if present.

    Iceberg path: MERGE INTO (atomic row-level insert-if-absent, no table
    rewrite, concurrent-writer safe via snapshot commit)."""
    if is_ignored(catalog, fingerprint):
        return False
    if catalog.iceberg:  # pragma: no cover - requires the runtime jar
        _ensure_iceberg_table(catalog, fingerprint)
        catalog.spark.sql(
            f"MERGE INTO {catalog.table_ref(TABLE)} t "
            f"USING (SELECT CAST(:fp AS {_sql_type(fingerprint)}) AS "
            "fingerprint, CAST(:reason AS STRING) AS reason) s "
            "ON t.fingerprint = s.fingerprint "
            "WHEN NOT MATCHED THEN INSERT *",
            args={"fp": fingerprint, "reason": reason},
        )
        return True
    cur = load_ignore(catalog, bits=128 if isinstance(fingerprint, str) else 64)
    new = catalog.spark.createDataFrame(
        [(fingerprint, reason)], _schema_for(fingerprint)
    )
    if dict(cur.dtypes)["fingerprint"] != dict(new.dtypes)["fingerprint"]:
        raise ValueError(
            "ignore table holds "
            f"{dict(cur.dtypes)['fingerprint']} fingerprints; cannot add a "
            f"{dict(new.dtypes)['fingerprint']} one (fingerprint_bits mixed "
            "within one warehouse)"
        )
    save_ignore(catalog, cur.unionByName(new))
    return True


def remove_ignore(catalog: Catalog, fingerprint: int | str) -> bool:
    """Retain-filter removal (``ignore.rs:81-89``); DELETE FROM under
    Iceberg."""
    if not is_ignored(catalog, fingerprint):
        return False
    if catalog.iceberg:  # pragma: no cover - requires the runtime jar
        catalog.spark.sql(
            f"DELETE FROM {catalog.table_ref(TABLE)} WHERE fingerprint = :fp",
            args={"fp": fingerprint},
        )
        return True
    cur = load_ignore(catalog)
    save_ignore(catalog, cur.filter(F.col("fingerprint") != fingerprint))
    return True


def is_ignored(catalog: Catalog, fingerprint: int | str) -> bool:
    cur = load_ignore(catalog, bits=128 if isinstance(fingerprint, str) else 64)
    return cur.filter(F.col("fingerprint") == fingerprint).limit(1).count() > 0


def remove_stale(catalog: Catalog, memberships: DataFrame) -> DataFrame:
    """[I3] destructive cleanup: drop entries matching no live group;
    returns the removed entries (for the report)."""
    from ..operators.groups import stale_ignore_entries

    bits = 128 if dict(memberships.dtypes).get("group_fp") == "string" else 64
    cur = load_ignore(catalog, bits=bits)
    stale = stale_ignore_entries(cur, memberships)
    stale_rows = stale.collect()
    if stale_rows:
        live = cur.join(
            stale.select("fingerprint"), "fingerprint", "left_anti"
        )
        save_ignore(catalog, live)
    return catalog.spark.createDataFrame(stale_rows, cur.schema)
