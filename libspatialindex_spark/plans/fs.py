"""Filesystem abstraction for the stored index.

The reference talks to storage through ``IStorageManager``
(``include/spatialindex/SpatialIndex.h:156-164``) so the same tree runs on
disk, memory, or user-supplied pages (``src/capi/CustomStorage.cc``).  The
distributed analog: every driver-side file operation the index layout needs
(manifest swap, bucket sweep, spec read/write) goes through this interface,
so the index can live on local disk in tests and on HDFS/S3A on a cluster —
Spark itself already reads/writes any Hadoop-FS URI; this closes the gap
for the *driver-side* metadata ops.

Two implementations:

* :class:`LocalFS` — plain ``os``/``shutil`` (the default for bare paths);
* :class:`HadoopFS` — the JVM ``org.apache.hadoop.fs.FileSystem`` resolved
  from the session's Hadoop configuration; works for ``hdfs://``, ``s3a://``
  and also ``file://`` (which is how tests exercise this code path without
  a cluster).

``get_fs(spark, path)`` picks by URI scheme.  All paths are joined with
"/" (URI semantics) — ``os.path.join`` would mangle scheme-qualified paths.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def join(*parts: str) -> str:
    """URI-safe path join (no scheme mangling)."""
    out = parts[0].rstrip("/")
    for p in parts[1:]:
        out += "/" + p.strip("/")
    return out


class LocalFS:
    """Driver-side file ops on the local filesystem."""

    def listdir(self, path: str) -> list[str]:
        import os

        return os.listdir(path) if os.path.isdir(path) else []

    def exists(self, path: str) -> bool:
        import os

        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def mkdirs(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        import os
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def rename(self, src: str, dst: str) -> None:
        """Atomic-ish move; dst must not exist (callers rename-aside first)."""
        import shutil

        shutil.move(src, dst)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)  # atomic on POSIX


class HadoopFS:
    """Driver-side file ops through the JVM Hadoop FileSystem API.

    Resolved per-path, so one instance handles any scheme the session's
    Hadoop conf knows (file://, hdfs://, s3a://, ...).
    """

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._path(path).getFileSystem(self._conf)

    def listdir(self, path: str) -> list[str]:
        p = self._path(path)
        fs = self._fs(path)
        if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
            return []
        return [st.getPath().getName() for st in fs.listStatus(p)]

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._path(path))

    def isdir(self, path: str) -> bool:
        fs = self._fs(path)
        p = self._path(path)
        return fs.exists(p) and fs.getFileStatus(p).isDirectory()

    def mkdirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def delete(self, path: str) -> None:
        self._fs(path).delete(self._path(path), True)

    def rename(self, src: str, dst: str) -> None:
        ok = self._fs(src).rename(self._path(src), self._path(dst))
        if not ok:
            raise OSError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        fs = self._fs(path)
        stream = fs.open(self._path(path))
        try:
            out = bytearray()
            buf_cls = self._jvm.java.io.BufferedReader
            rdr = buf_cls(self._jvm.java.io.InputStreamReader(stream, "UTF-8"))
            line = rdr.readLine()
            while line is not None:
                out.extend((line + "\n").encode())
                line = rdr.readLine()
            return out.decode().rstrip("\n")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        parent = path.rsplit("/", 1)[0]
        self.mkdirs(parent)
        tmp = path + ".tmp"
        fs = self._fs(path)
        stream = fs.create(self._path(tmp), True)
        try:
            stream.write(bytearray(text.encode()))
        finally:
            stream.close()
        p = self._path(path)
        if fs.exists(p):
            fs.delete(p, False)
        if not fs.rename(self._path(tmp), p):
            raise OSError(f"rename failed: {tmp} -> {path}")


def get_fs(spark: SparkSession, path: str):
    """Pick the FS impl by URI scheme (bare paths → local)."""
    if "://" in path:
        return HadoopFS(spark)
    return LocalFS()
