"""Output compression for protocol NDJSON (reference K5: the server
wraps the response writer in zstd when the client sends an
``Accept-Zstd`` header, proto.go:196-204).

zstd has no stdlib codec on this Python; it is gated behind an
import-try (``zstandard`` if installed, else a clear error). gzip is
always available and is the default compressed form. Spark-side
parquet/json writers take ``.option("compression", "zstd")``
natively — this module only covers the driver-side NDJSON pipe.
"""

from __future__ import annotations

import gzip
import io
from typing import IO

CODECS = ("none", "gzip", "zstd")


def wrap_output(raw: IO[bytes], compression: str = "none") -> IO[str]:
    """Wrap a binary sink in the requested codec, returning a text
    stream for the NDJSON encoders. Caller closes the returned stream
    (which flushes/closes the codec, not the underlying sink)."""
    if compression in (None, "none"):
        w = io.TextIOWrapper(raw, encoding="utf-8", write_through=True)
        # closing the wrapper must not close the caller's sink (stdout
        # or a BytesIO the caller still reads) — mirror the codec
        # wrappers, which flush but leave the fileobj open.
        w.close = lambda _w=w: (_w.flush(), _w.detach())  # type: ignore[method-assign]
        return w
    if compression == "gzip":
        return io.TextIOWrapper(
            gzip.GzipFile(fileobj=raw, mode="wb", mtime=0), encoding="utf-8"
        )
    if compression == "zstd":
        try:
            import zstandard  # noqa: PLC0415 - optional dependency
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "zstd output requires the 'zstandard' package; use gzip "
                "or install zstandard"
            ) from e
        cctx = zstandard.ZstdCompressor()
        return io.TextIOWrapper(cctx.stream_writer(raw), encoding="utf-8")
    raise ValueError(f"unknown compression {compression!r}; expected {CODECS}")


def read_compressed(raw: IO[bytes], compression: str = "none") -> IO[str]:
    """Inverse of wrap_output, for tests and round-trips."""
    if compression in (None, "none"):
        return io.TextIOWrapper(raw, encoding="utf-8")
    if compression == "gzip":
        return io.TextIOWrapper(gzip.GzipFile(fileobj=raw, mode="rb"), encoding="utf-8")
    if compression == "zstd":
        try:
            import zstandard  # noqa: PLC0415 - optional dependency
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError("zstd requires the 'zstandard' package") from e
        dctx = zstandard.ZstdDecompressor()
        return io.TextIOWrapper(dctx.stream_reader(raw), encoding="utf-8")
    raise ValueError(f"unknown compression {compression!r}; expected {CODECS}")
