"""Test-only stand-in for the optional ``fsspec`` dependency.

The engine's object-store read branch (``pbf/io.py::open_binary``, S5
parity with the reference's ``create_s3_buf_reader``,
``osm-pbf-parquet/src/pbf.rs:24-49``) dispatches any non-local URL scheme
to ``fsspec.open(url, "rb").open()`` and requires only seek/read/tell on
the result. The sandbox ships no fsspec (and no network), so this module
implements exactly that surface over the LOCAL filesystem under a
``mock://`` scheme — letting tests execute the real fsspec code path
end-to-end (driver blob index + executor range reads) without network.

Distributed to executors via ``SparkContext.addPyFile``; the driver gets
it via a ``sys.path`` insert in the test. It refuses every scheme except
``mock`` so an accidental resolution of a real URL fails loudly.
"""

import builtins
from urllib.parse import urlparse


class _OpenFile:
    """Mirror of fsspec.core.OpenFile: ``.open()`` yields the file."""

    def __init__(self, path: str, mode: str):
        self._path, self._mode = path, mode

    def open(self):
        return builtins.open(self._path, self._mode)


def open(urlpath: str, mode: str = "rb", **kwargs) -> _OpenFile:
    parsed = urlparse(urlpath)
    if parsed.scheme != "mock":
        raise ValueError(
            f"fake fsspec serves only mock:// URLs, got {urlpath!r}"
        )
    return _OpenFile(parsed.path, mode)
