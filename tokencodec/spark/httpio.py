"""HTTP(S) range-request source: read parquet over plain HTTP.

The reference reads remote parquet via HTTP Range requests
(/root/reference/src/Parquet/Reader.hs:222-248 builds a seekable source
from ranged GETs). This is the PySpark-native analog: a seekable
read-only file object backed by ``Range: bytes=a-b`` GETs (stdlib
urllib — no extra dependencies), handed to pyarrow's ParquetFile, which
then issues exactly the footer/column-chunk reads it needs — a
projection never downloads unrequested columns' bytes, same as the
reference's offset-addressed reads.

Operational notes for scale: each ``read()`` is one HTTP request; the
parquet reader already batches per column chunk, so a row-group read of
K projected columns costs K+O(1) requests. The object is cheap to
construct inside executors (one HEAD for the size), so (file,
row-group) splits parallelize across workers exactly like the s3/file
paths. Servers that ignore Range (HTTP 200 with the full body) are
detected and refused rather than silently downloading the whole file
per read.
"""

from __future__ import annotations

import urllib.request


class HttpRangeFile:
    """Seekable read-only file over HTTP Range requests."""

    def __init__(self, url: str, timeout: float = 60.0):
        self.url = url
        self.timeout = timeout
        self._pos = 0
        self.closed = False
        req = urllib.request.Request(url, method="HEAD")
        with urllib.request.urlopen(req, timeout=timeout) as r:
            ln = r.headers.get("Content-Length")
            if ln is None:
                raise OSError(f"{url}: server sent no Content-Length; "
                              "cannot address ranges")
            self._size = int(ln)
            accept = (r.headers.get("Accept-Ranges") or "").lower()
        if accept == "none":
            raise OSError(f"{url}: server advertises Accept-Ranges: none")

    # ------------------------------------------------------ file protocol
    mode = "rb"

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def read(self, nbytes: int | None = -1) -> bytes:
        if nbytes is None or nbytes < 0:
            nbytes = self._size - self._pos
        if nbytes <= 0 or self._pos >= self._size:
            return b""
        end = min(self._size, self._pos + nbytes) - 1
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={self._pos}-{end}"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            if r.status != 206:
                # 200 means the server ignored Range: the body is the
                # WHOLE file — reading it per request would turn one
                # footer probe into N full downloads
                raise OSError(f"{self.url}: server ignored Range "
                              f"(HTTP {r.status})")
            data = r.read()
        self._pos += len(data)
        return data

    def close(self) -> None:
        self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
