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

- ``ObjectStoreFS`` (tokencodec/spark/objectstore.py): s3:// and
  friends via native conditional PUTs (boto3 when available, or any
  injected client with the same If-None-Match semantics).

Atomicity notes: the commit protocol (table.py) needs exactly ONE
primitive from the store — ``create_excl`` must atomically create the
file WITH its full content, or fail with FileExistsError. LocalFS gets
it from link(2) (write a temp, hard-link it into place), HadoopFS from
rename-without-overwrite (atomic on HDFS), ObjectStoreFS from S3
conditional writes (``If-None-Match: *`` PUT — public AWS capability).
``write_atomic`` only ever writes the advisory CURRENT hint, so its
atomicity is a torn-read guard, not a correctness requirement.
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
        """Create-if-absent with FULL content, atomically; raises
        FileExistsError when present. O_EXCL alone would make the file
        visible empty and fill it afterwards — a reader (or a crash)
        in that window sees a torn manifest that wedges its id forever.
        Writing a temp and hard-linking it into place publishes the
        complete bytes or nothing."""
        p = self._p(path)
        tmp = os.path.join(os.path.dirname(p), f".claim-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, p)
        finally:
            os.unlink(tmp)

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

    def _is_already_exists(self, e: Exception) -> bool:
        # Classify by the Java exception CLASS, not message substrings —
        # messages are locale/impl dependent and a cause chain can
        # mention 'already exists' for unrelated reasons.
        je = getattr(e, "java_exception", None)
        names = []
        cur = je
        while cur is not None:
            try:
                names.append(cur.getClass().getName())
                cur = cur.getCause()
            except Exception:
                break
        return any("AlreadyExists" in n for n in names) or (
            je is None and ("AlreadyExists" in str(e)
                            or "already exists" in str(e)))

    def create_excl(self, path: str, text: str) -> None:
        """Create-if-absent with FULL content, atomically. Writing the
        destination directly via create(overwrite=false) would publish
        an empty visible file first (torn-manifest window); instead
        write a temp and rename WITHOUT overwrite — atomic on HDFS,
        where rename into an existing path raises
        FileAlreadyExistsException, translated to FileExistsError so
        commit-race handling is backend-independent."""
        parent, _ = path.rsplit("/", 1)
        tmp = f"{parent}/.claim-{uuid.uuid4().hex}"
        self._write(tmp, text, True)
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._p(path).toUri(), self._conf)
            rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gateway.new_array(rename_cls, 1)
            opts[0] = rename_cls.NONE
            fc.rename(self._p(tmp), self._p(path), opts)
        except Exception as e:  # py4j wraps the Java exception
            self._fs.delete(self._p(tmp), False)
            if self._is_already_exists(e):
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


# Schemes whose HADOOP FileSystem cannot provide an atomic
# create-exclusive claim: S3A's create(overwrite=false) is
# check-then-create and its rename is copy+delete, so the snapshot
# claim is unsafe against concurrent committers through that API.
# s3/s3a/s3n are served NATIVELY by ObjectStoreFS (conditional PUTs
# via boto3) when boto3 is importable, gs:// natively over the GCS
# JSON API (ifGenerationMatch=0, stdlib HTTP — round 5), and
# wasb[s]/abfs[s] natively over the Azure Blob REST API
# (If-None-Match: * Put Blob — round 5); the remaining schemes here
# are refused unless the caller opts into single-writer mode. abfs is
# listed because on flat (non-hierarchical-namespace) blob accounts
# Hadoop's create is not atomic — the native conditional PUT is safe
# on both account kinds, so it is the default either way.
RENAME_UNSAFE_SCHEMES = frozenset({"s3", "s3a", "s3n", "gs", "wasb", "wasbs",
                                   "abfs", "abfss", "oss"})

_AZURE_SCHEMES = frozenset({"wasb", "wasbs", "abfs", "abfss"})

# Schemes ObjectStoreFS can commit on safely with native conditional
# writes (If-None-Match PUT — public AWS capability, and faithfully
# emulated by tests' DirObjectStore).
_S3_SCHEMES = frozenset({"s3", "s3a", "s3n"})


def fs_for(root: str, allow_unsafe: bool | None = None):
    """Resolve the manifest filesystem for ``root``.

    ``allow_unsafe`` opts a rename-unsafe scheme into single-writer
    mode; None defers to the TOKENCODEC_ALLOW_UNSAFE_ROOT env var so
    deployments can flip it without threading a flag through every
    entry point (SnapshotTable/encode/CLI all land here). An EXPLICIT
    ``allow_unsafe=True`` on an s3 scheme is honored as a request for
    the Hadoop s3a backend (single-writer): escape hatch for
    deployments whose s3a credential setup (custom providers, assumed
    roles) boto3 cannot replicate even with the fs.s3a.* endpoint/key
    harvesting the native client performs. The env var does NOT demote
    s3 — it exists to enable the schemes with no native client (oss),
    and native conditional-PUT commits stay the safer default wherever
    they work."""
    explicit_unsafe = allow_unsafe is True
    if allow_unsafe is None:
        allow_unsafe = os.environ.get(
            "TOKENCODEC_ALLOW_UNSAFE_ROOT", "") not in ("", "0", "false")
    scheme = root.split("://", 1)[0] if "://" in root else ""
    if scheme in ("", "file"):
        return LocalFS()
    if scheme in _S3_SCHEMES and not explicit_unsafe:
        try:
            import boto3  # noqa: F401
        except ImportError:
            pass  # fall through to the Hadoop path + unsafe gate
        else:
            from tokencodec.spark.objectstore import ObjectStoreFS
            return ObjectStoreFS.for_s3(root)
    if scheme == "gs" and not explicit_unsafe:
        # stdlib-HTTP GCS JSON API client: conditional PUTs give gs://
        # the same safe multi-writer commit protocol as s3://; missing
        # credentials fail loudly at first use, and an explicit
        # allow_unsafe=True still selects the Hadoop gcs-connector path
        from tokencodec.spark.objectstore import ObjectStoreFS
        return ObjectStoreFS.for_gcs(root)
    if scheme in _AZURE_SCHEMES and not explicit_unsafe:
        # native Azure Blob REST client: If-None-Match:* Put Blob gives
        # wasb/abfs the same safe multi-writer commit protocol; an
        # explicit allow_unsafe=True still selects the Hadoop connector
        from tokencodec.spark.objectstore import ObjectStoreFS
        return ObjectStoreFS.for_azure(root)
    if scheme in RENAME_UNSAFE_SCHEMES and not allow_unsafe:
        raise ValueError(
            f"manifest root scheme '{scheme}://' has no atomic "
            "create-exclusive through Hadoop, so optimistic-concurrency "
            "commits are unsafe there; install boto3 (s3 schemes commit "
            "natively via conditional PUT), put the manifest dir on HDFS, "
            "or pass allow_unsafe=True / set TOKENCODEC_ALLOW_UNSAFE_ROOT=1 "
            "(single-writer deployments only)")
    return HadoopFS(root)
