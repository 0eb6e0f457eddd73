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
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        # close even when write() throws: an unclosed HDFS output
        # stream holds the file lease, and every retry of this path
        # then fails with lease errors until it expires
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


def fs_rename_overwrite(spark: SparkSession, src: str, dst: str) -> None:
    """Atomically rename ``src`` onto ``dst``, replacing it.

    FileSystem.rename refuses an existing destination, and
    delete-then-rename opens a window where NO valid file exists at
    ``dst`` — a concurrent reader in that window sees a missing marker
    and recomputes work another process may be reading. FileContext's
    Options.Rename.OVERWRITE is the Hadoop-blessed atomic replace
    (atomic on HDFS and local; object stores degrade to copy+delete,
    which is why object-store deployments should use the Iceberg
    backend's snapshot commit instead). Falls back to
    delete-then-rename only if the scheme has no AbstractFileSystem
    binding (raw FileContext unsupported)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_p = jvm.org.apache.hadoop.fs.Path(src)
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            src_p.toUri(), conf
        )
        opts = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(src_p, dst_p, opts)
        return
    except Exception as exc:  # no AbstractFileSystem for this scheme
        if "UnsupportedFileSystemException" not in str(exc):
            raise
    if path_exists(spark, dst):
        fs_delete(spark, dst)
    if not fs_rename(spark, src, dst):
        raise IOError(f"rename {src} -> {dst} failed")
