"""SQL source (S9): range-partitioned JDBC scan → record DataFrame.

The reference's fork-added SQL source paginates MySQL with keyset queries
(``SELECT fields FROM t WHERE … AND id > '<lastId>' ORDER BY id ASC LIMIT
batch`` — ``/root/reference/pkg/source/sql.go:196-213``) and counts rows by
rewriting the query (``:165-194``). Spark's JDBC reader replaces both: range
partitioning on the keyset column turns pagination into N parallel bounded
scans, and the count is the scan itself.

No JDBC driver ships in this sandbox, so this module is exercised by unit
tests only through ``build_reader_options``; the read path is gated.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from nebula_importer_spark.sources.csv import records_from_columns


def build_reader_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetch_size: int = 1000,
    user: Optional[str] = None,
    password: Optional[str] = None,
) -> dict[str, str]:
    """JDBC options replacing keyset pagination (sql.go:196-213).

    ``num_partitions`` plays the role of the reference's reader concurrency;
    ``fetch_size`` the per-roundtrip batch (manager.batch analog).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def read_records_jdbc(
    spark: SparkSession,
    columns: Sequence[str],
    **options: object,
) -> DataFrame:
    """Read a JDBC table into the ``record: array<string>`` shape."""
    reader = spark.read.format("jdbc")
    for k, v in build_reader_options(**options).items():  # type: ignore[arg-type]
        reader = reader.option(k, v)
    df = reader.load().select(*columns)
    return records_from_columns(df)
