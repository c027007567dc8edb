"""JDBC source option mapping (S9: keyset pagination → range partitioning)."""

from nebula_importer_spark.sources.jdbc import build_reader_options


def test_build_reader_options_range_partitioning():
    opts = build_reader_options(
        url="jdbc:mysql://db:3306/app",
        table="users",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=50,   # reader-concurrency analog (manager.go:24)
        fetch_size=128,      # batch analog (reader/option.go:7-9)
        user="u",
        password="p",
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "50"
    assert opts["fetchsize"] == "128"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
