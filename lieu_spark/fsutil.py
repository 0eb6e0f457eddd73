"""Small-file I/O through Spark's Hadoop FileSystem.

Markers, manifests, and layout stamps must live on the SAME store as
the state they describe — a work_dir on hdfs:// or s3:// with
driver-local ``open()`` markers would silently no-op every guard (or
crash on the scheme prefix). These helpers route through the Hadoop
FS resolved from the path itself, so local paths, hdfs:// and s3://
behave identically. Shared by the streaming state machinery
(streaming/ingest.py) and the checkpoint stage store (checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for a string path via Spark's Hadoop conf."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def path_exists(spark: SparkSession, path_str: str) -> bool:
    fs, path = hadoop_fs(spark, path_str)
    return bool(fs.exists(path))


def fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    """Write a small text file (overwrite)."""
    fs, path = hadoop_fs(spark, path_str)
    out = fs.create(path, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()


def fs_read_text(spark: SparkSession, path_str: str) -> str:
    """Read a small text file. (NOT spark.read.text: Hadoop's hidden-file
    filter silently ignores underscore-prefixed names, which markers use
    so parquet readers skip them.)"""
    fs, path = hadoop_fs(spark, path_str)
    stream = fs.open(path)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, sp = hadoop_fs(spark, src)
    return bool(fs.rename(sp, spark._jvm.org.apache.hadoop.fs.Path(dst)))


def fs_delete(spark: SparkSession, path_str: str) -> bool:
    fs, path = hadoop_fs(spark, path_str)
    return bool(fs.delete(path, True))
