"""Ignore-list table [S5, I2, I3] — IgnoreFile analog.

The reference persists ignored group fingerprints in
``.dupes-ignore.toml`` (``dupes-core/src/ignore.rs:12-56``) with CRUD +
staleness cleanup. Here the list is a small table in the warehouse
(`ignore(fingerprint BIGINT, reason STRING)`), always broadcast when
joined. With the Iceberg jar present the CRUD below becomes
MERGE INTO / DELETE FROM; the parquet fallback rewrites the (tiny) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import IGNORE
from .catalog import Catalog

TABLE = "ignore"


def load_ignore(catalog: Catalog) -> DataFrame:
    if not (catalog.warehouse / TABLE).exists():
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
    """Insert-if-absent (``ignore.rs:66-78``). Returns False if present."""
    cur = load_ignore(catalog)
    if cur.filter(F.col("fingerprint") == fingerprint).limit(1).count() > 0:
        return False
    new = catalog.spark.createDataFrame([(fingerprint, reason)], IGNORE)
    save_ignore(catalog, cur.unionByName(new))
    return True


def remove_ignore(catalog: Catalog, fingerprint: int) -> bool:
    """Retain-filter removal (``ignore.rs:81-89``)."""
    cur = load_ignore(catalog)
    if cur.filter(F.col("fingerprint") == fingerprint).limit(1).count() == 0:
        return False
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
