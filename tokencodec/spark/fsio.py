"""Filesystem abstraction for the snapshot/manifest layer.

The reference reads any offset-addressable source
(/root/reference/src/Parquet/Reader.hs:222-248 supports local files and
HTTP ranges); our manifest IO must likewise not assume a local POSIX
filesystem — a 100 TB deployment keeps tables on s3a:// or hdfs://.

Two implementations behind one small interface:

- ``LocalFS``: plain paths and file:// URIs via os/open (the sandbox
  path, and the default).
- ``HadoopFS``: any scheme Spark's Hadoop configuration can resolve
  (hdfs://, s3a://, gs://, ...), driven through the active
  SparkSession's JVM gateway — no extra Python dependencies.

Atomicity notes: snapshot files are claimed create-exclusive (O_EXCL /
FileSystem.create(overwrite=false)), which both backends enforce. The
CURRENT pointer swap is rename-based — atomic on POSIX and HDFS;
object stores without atomic rename (raw S3) should front the manifest
directory with a real catalog (Iceberg/DynamoDB-style), which is what
this layer's API is shaped to be replaced by.
"""

from __future__ import annotations

import os
import uuid


class LocalFS:
    """'' and 'file' schemes."""

    @staticmethod
    def _p(path: str) -> str:
        return path[len("file://"):] if path.startswith("file://") else path

    def mkdirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def read_text(self, path: str) -> str:
        with open(self._p(path)) as f:
            return f.read()

    def create_excl(self, path: str, text: str) -> None:
        """Create-if-absent; raises FileExistsError when present."""
        fd = os.open(self._p(path), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(text)

    def write_atomic(self, path: str, text: str) -> None:
        p = self._p(path)
        tmp = os.path.join(os.path.dirname(p), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, p)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(self._p(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def size(self, path: str) -> int:
        return os.path.getsize(self._p(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def delete(self, path: str, recursive: bool = False) -> None:
        p = self._p(path)
        if os.path.isdir(p):
            if not recursive:
                raise IsADirectoryError(path)
            import shutil
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)


class HadoopFS:
    """Any Hadoop-resolvable scheme via the active SparkSession's JVM."""

    def __init__(self, root: str):
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"manifest root '{root}' needs a Hadoop filesystem, which "
                "requires an active SparkSession")
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(root).getFileSystem(
            self._conf)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 4096, False)
            return baos.toString("UTF-8")
        finally:
            stream.close()

    def _write(self, path: str, text: str, overwrite: bool) -> None:
        out = self._fs.create(self._p(path), overwrite)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def create_excl(self, path: str, text: str) -> None:
        # FileSystem.create(overwrite=false) raises if the file exists;
        # translate to the interface's FileExistsError so commit-race
        # handling is backend-independent. Classify by the Java exception
        # CLASS, not message substrings — messages are locale/impl
        # dependent and a cause chain can mention 'already exists' for
        # unrelated reasons.
        try:
            self._write(path, text, False)
        except Exception as e:  # py4j wraps the Java exception
            je = getattr(e, "java_exception", None)
            names = []
            cur = je
            while cur is not None:
                try:
                    names.append(cur.getClass().getName())
                    cur = cur.getCause()
                except Exception:
                    break
            if any("AlreadyExists" in n for n in names) or (
                    je is None and ("AlreadyExists" in str(e)
                                    or "already exists" in str(e))):
                raise FileExistsError(path) from e
            raise

    def write_atomic(self, path: str, text: str) -> None:
        parent, name = path.rsplit("/", 1)
        tmp = f"{parent}/.tmp-{uuid.uuid4().hex}"
        self._write(tmp, text, True)
        # FileContext.rename(OVERWRITE) is the atomic pointer swap on
        # HDFS (FileSystem.rename has no overwrite flag, and a
        # delete-then-rename would open a window where CURRENT does not
        # exist — readers would see a committed table as empty)
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._p(path).toUri(), self._conf)
        rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gateway.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc.rename(self._p(tmp), self._p(path), opts)

    def listdir(self, path: str) -> list[str]:
        return [st.getPath().getName()
                for st in self._fs.listStatus(self._p(path))]

    def isdir(self, path: str) -> bool:
        return bool(self._fs.getFileStatus(self._p(path)).isDirectory())

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path)).getLen())

    def mtime(self, path: str) -> float:
        return self._fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0

    def delete(self, path: str, recursive: bool = False) -> None:
        self._fs.delete(self._p(path), recursive)


# Schemes whose Hadoop FileSystem lacks atomic rename AND atomic
# create-exclusive: S3A's create(overwrite=false) is check-then-create
# and its rename is copy+delete, so neither the snapshot claim nor the
# CURRENT pointer swap is safe against concurrent committers there.
# These stores need a real catalog (Iceberg/Glue/DynamoDB-style) in
# front of the manifest directory.
RENAME_UNSAFE_SCHEMES = frozenset({"s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss"})


def fs_for(root: str, allow_unsafe: bool = False):
    scheme = root.split("://", 1)[0] if "://" in root else ""
    if scheme in ("", "file"):
        return LocalFS()
    if scheme in RENAME_UNSAFE_SCHEMES and not allow_unsafe:
        raise ValueError(
            f"manifest root scheme '{scheme}://' has no atomic rename / "
            "create-exclusive, so optimistic-concurrency commits are unsafe "
            "there; put the manifest dir on HDFS or behind a catalog, or "
            "pass allow_unsafe=True (single-writer deployments only)")
    return HadoopFS(root)
