"""Hadoop FS scheme dispatch for the reference's remote sources (S3–S8).

The reference implements one Go client per storage backend
(``/root/reference/pkg/source/{s3,oss,ftp,sftp,hdfs,gcs}.go``); Spark
subsumes them behind ``spark.read`` URI dispatch. These tests pin what this
distribution actually ships: the *scheme → FileSystem impl* resolution that
``sources/config.py`` relies on when it maps a config block to a URI —
no remote servers needed (connections are lazy, per-operation).
"""

from __future__ import annotations

import pytest


def _fs_class(spark, uri: str) -> str:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return path.getFileSystem(conf).getClass().getName()


def test_ftp_scheme_resolves_to_shipped_filesystem(spark):
    """S4/S5 (FTP): FTPFileSystem + the shaded commons-net client both ship
    in hadoop-client jars — an ftp:// source URI from the config loader
    dispatches without extra jars."""
    assert (
        _fs_class(spark, "ftp://user:pw@example.invalid/data/x.csv")
        == "org.apache.hadoop.fs.ftp.FTPFileSystem"
    )


def test_sftp_scheme_class_present_but_gated(spark):
    """S6 (SFTP): SFTPFileSystem ships, but its jsch dependency does NOT —
    instantiation fails with the missing-class error, which is the
    documented boundary (COVERAGE.md): wire-up exists, the transport jar
    must come from the cluster."""
    jvm = spark.sparkContext._jvm
    try:
        klass = jvm.java.lang.Class.forName("org.apache.hadoop.fs.sftp.SFTPFileSystem")
        assert klass.getName().endswith("SFTPFileSystem")
    except Exception:  # pragma: no cover — distro without the class at all
        pytest.skip("SFTPFileSystem not shipped in this distribution")
    with pytest.raises(Exception, match="jsch|NoClassDef|ClassNotFound"):
        _fs_class(spark, "sftp://user:pw@example.invalid/data/x.csv")


def test_local_and_hdfs_style_uris_resolve(spark):
    """S2 (local) resolves to the checksum'd local FS; file:/ is the
    sandbox stand-in for every warehouse path the pipeline writes."""
    assert _fs_class(spark, "file:///tmp/x").endswith("LocalFileSystem")
