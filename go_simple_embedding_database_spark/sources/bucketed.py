"""Bucketed tables — co-located, shuffle-free joins for repeated big joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Bucketing
pre-hash-partitions a table on the join key AT WRITE TIME (``bucketBy`` on
a managed table): two tables bucketed on the same key with the same bucket
count join with ZERO exchanges — every task reads bucket i of both sides.
Spark's planner proves co-location from the table metadata, so the saving
repeats on every subsequent join, which is exactly the records-table shape
of this engine (records joined to per-collection updates/queries by id,
day after day).

The reference has no notion of physical layout at all (in-memory Go maps,
SURVEY §4.1); bucketing is the Spark-native answer to "this join happens
every day — stop shuffling it".

Sort-within-buckets (``sortBy``) additionally enables sort-merge joins
without the per-task sort when both sides are sorted on the key.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Table names are interpolated into DDL strings below; one up-front check
# covers every site (and odd names have no business in a warehouse layout
# contract anyway).
_TABLE_NAME_RE = re.compile(r"^[A-Za-z0-9_]+$")



def save_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                  num_buckets: int = 16, sort_cols: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Write ``df`` as a managed bucketed table (parquet). Bucket count is
    a layout contract: joins are exchange-free only between tables with
    the SAME bucket count on the SAME keys — pick it once per subject
    area (16 here for local[32]; hundreds at warehouse scale)."""
    writer = (df.write.mode(mode).format("parquet")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def source_fingerprint(*paths: str) -> str:
    """Cheap change-detection token for ``ensure_bucketed_copy``: size and
    mtime of the source files (no data read). If the sources are rewritten
    the fingerprint changes and the bucketed copy is rebuilt."""
    import os

    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
    return "|".join(parts)


def ensure_bucketed_copy(spark: SparkSession, src: DataFrame, table_name: str,
                         bucket_cols: list[str], num_buckets: int = 16,
                         fingerprint: str | None = None) -> DataFrame:
    """Idempotent bucketed materialization: write once, then reuse the
    managed table across queries/sessions (the write is the one-time cost
    the exchange-free joins amortize).

    The default in-memory catalog forgets tables between processes while
    the warehouse directory persists — a fresh session then fails
    saveAsTable with LOCATION_ALREADY_EXISTS. A leftover location without
    a catalog entry is dead state (bucketing metadata lives in the
    catalog, not the files), so remove it and rewrite.

    An existing table is validated against the requested layout (bucket
    columns + count): returning a differently-bucketed table would
    silently reintroduce the join shuffles this module exists to remove —
    fail loudly instead. A ``fingerprint`` (see ``source_fingerprint``)
    additionally guards against STALE data: the token is stored in the
    table properties on write, and a mismatch (source files rewritten
    since) drops and rebuilds the copy instead of serving old rows."""
    if not _TABLE_NAME_RE.match(table_name):
        raise ValueError(
            f"invalid table name {table_name!r}: must match [A-Za-z0-9_]+")
    # NO validation memo, deliberately: an earlier version cached
    # (table, layout, fingerprint) tuples to skip the catalog round-trips
    # on repeated calls, but the memo key is the CALLER's request — a
    # table dropped and rebuilt mid-session with a different layout under
    # the same name passed the memo unvalidated (the requested fingerprint
    # doesn't change when the TABLE changes, only when the source does).
    # The validations below are a few catalog-only queries (~100 ms),
    # noise next to the join work this table exists to serve; correctness
    # of the layout guarantee wins.
    if spark.catalog.tableExists(table_name):
        # Bucket COLUMNS come from the catalog API (listColumns' isBucket
        # flag), never from string-parsing DESCRIBE data rows; the bucket
        # COUNT is only exposed in DESCRIBE EXTENDED's detailed-metadata
        # section, so restrict the parse to rows AFTER the '# Detailed
        # Table Information' separator — a data column that happens to be
        # named 'Num Buckets' cannot shadow it there.
        got_cols = [c.name for c in spark.catalog.listColumns(table_name)
                    if c.isBucket]
        rows = spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()
        sep = max((i for i, r in enumerate(rows)
                   if r.col_name.startswith("# Detailed Table")), default=0)
        meta = {r.col_name: r.data_type for r in rows[sep:]}
        got_n = meta.get("Num Buckets")
        if got_n != str(num_buckets) or got_cols != list(bucket_cols):
            raise ValueError(
                f"table {table_name} exists with layout (buckets={got_n}, "
                f"cols={got_cols}) but (buckets={num_buckets}, "
                f"cols={list(bucket_cols)}) was requested — drop it or use "
                f"a different name")
        if fingerprint is not None:
            stored = spark.sql(
                f"SHOW TBLPROPERTIES {table_name} ('source_fingerprint')"
            ).collect()
            if not stored or stored[0].value != fingerprint:
                spark.sql(f"DROP TABLE {table_name}")
            else:
                return spark.table(table_name)
        else:
            return spark.table(table_name)
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    loc = jvm.org.apache.hadoop.fs.Path(warehouse, table_name.lower())
    fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    save_bucketed(src, table_name, bucket_cols, num_buckets)
    if fingerprint is not None:
        escaped = fingerprint.replace("'", "''")
        spark.sql(f"ALTER TABLE {table_name} "
                  f"SET TBLPROPERTIES ('source_fingerprint' = '{escaped}')")
    return spark.table(table_name)
