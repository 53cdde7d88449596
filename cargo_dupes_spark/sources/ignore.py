"""Ignore-list table [S5, I2, I3] — IgnoreFile analog.

The reference persists ignored group fingerprints in
``.dupes-ignore.toml`` (``dupes-core/src/ignore.rs:12-56``) with CRUD +
staleness cleanup. Here the list is a small table in the warehouse
(`ignore(fingerprint BIGINT, reason STRING)`), always broadcast when
joined. With the Iceberg jar present (catalog.iceberg) the CRUD runs as
MERGE INTO / DELETE FROM row-level operations on the Iceberg table
(exercised by tests/test_iceberg.py, jar-gated); the parquet fallback
rewrites the (tiny) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import IGNORE
from .catalog import Catalog

TABLE = "ignore"


def _ensure_iceberg_table(catalog: Catalog) -> None:  # pragma: no cover - jar
    catalog.spark.sql(
        f"CREATE TABLE IF NOT EXISTS {catalog.table_ref(TABLE)} "
        "(fingerprint BIGINT, reason STRING) USING iceberg"
    )


def load_ignore(catalog: Catalog) -> DataFrame:
    if not catalog.exists(TABLE):
        return catalog.spark.createDataFrame([], IGNORE)
    return catalog.read(TABLE)


def save_ignore(catalog: Catalog, df: DataFrame) -> None:
    # tiny table (the TOML-file analog): materialize on the driver before
    # overwriting — a lazy plan still reading the old files would race the
    # overwrite (Spark reads lazily; the write deletes the input)
    rows = df.collect()
    catalog.write(
        catalog.spark.createDataFrame(rows, IGNORE).coalesce(1), TABLE
    )


def add_ignore(
    catalog: Catalog, fingerprint: int, reason: str | None = None
) -> bool:
    """Insert-if-absent (``ignore.rs:66-78``). Returns False if present.

    Iceberg path: MERGE INTO (atomic row-level insert-if-absent, no table
    rewrite, concurrent-writer safe via snapshot commit)."""
    if is_ignored(catalog, fingerprint):
        return False
    if catalog.iceberg:  # pragma: no cover - requires the runtime jar
        _ensure_iceberg_table(catalog)
        catalog.spark.sql(
            f"MERGE INTO {catalog.table_ref(TABLE)} t "
            "USING (SELECT CAST(:fp AS BIGINT) AS fingerprint, "
            "CAST(:reason AS STRING) AS reason) s "
            "ON t.fingerprint = s.fingerprint "
            "WHEN NOT MATCHED THEN INSERT *",
            args={"fp": fingerprint, "reason": reason},
        )
        return True
    cur = load_ignore(catalog)
    new = catalog.spark.createDataFrame([(fingerprint, reason)], IGNORE)
    save_ignore(catalog, cur.unionByName(new))
    return True


def remove_ignore(catalog: Catalog, fingerprint: int) -> bool:
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


def is_ignored(catalog: Catalog, fingerprint: int) -> bool:
    cur = load_ignore(catalog)
    return cur.filter(F.col("fingerprint") == fingerprint).limit(1).count() > 0


def remove_stale(catalog: Catalog, memberships: DataFrame) -> DataFrame:
    """[I3] destructive cleanup: drop entries matching no live group;
    returns the removed entries (for the report)."""
    from ..operators.groups import stale_ignore_entries

    cur = load_ignore(catalog)
    stale = stale_ignore_entries(cur, memberships)
    stale_rows = stale.collect()
    if stale_rows:
        live = cur.join(
            stale.select("fingerprint"), "fingerprint", "left_anti"
        )
        save_ignore(catalog, live)
    return catalog.spark.createDataFrame(stale_rows, IGNORE)
