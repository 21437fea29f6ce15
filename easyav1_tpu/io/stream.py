"""Stream I/O abstraction — the L1 layer of the framework.

Behavioral contract: easyav1_stream {read, seek, tell, userdata}
(/root/reference/src/easyav1.h:124-176) with FILE* (easyav1.c:717-772),
memory (easyav1.c:784-848) and custom backends. The demuxer consumes only
this interface, so the whole pipeline can run hermetically from a byte
buffer — the seam used by the test suite.
"""

from __future__ import annotations

import io
import os
from typing import BinaryIO, Callable, Optional


class Stream:
    """Abstract seekable byte stream: read(n) -> bytes, seek(pos, whence), tell()."""

    def read(self, size: int) -> bytes:
        raise NotImplementedError

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> None:
        raise NotImplementedError

    def tell(self) -> int:
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - default no-op
        pass


class FileStream(Stream):
    """File-backed stream (reference: file_read/seek/tell easyav1.c:717-772)."""

    def __init__(self, path_or_file, close_on_destroy: bool = True):
        if isinstance(path_or_file, (str, os.PathLike)):
            self._f: BinaryIO = open(path_or_file, "rb")
            self._owns = True
        else:
            self._f = path_or_file
            self._owns = close_on_destroy

    def read(self, size: int) -> bytes:
        return self._f.read(size)

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> None:
        self._f.seek(offset, whence)

    def tell(self) -> int:
        return self._f.tell()

    def close(self) -> None:
        if self._owns:
            self._f.close()


class MemoryStream(Stream):
    """In-memory stream (reference: memory_read/seek/tell easyav1.c:784-848)."""

    def __init__(self, data: bytes):
        self._data = memoryview(data)
        self._pos = 0

    def read(self, size: int) -> bytes:
        end = min(self._pos + size, len(self._data))
        out = bytes(self._data[self._pos:end])
        self._pos = end
        return out

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> None:
        if whence == os.SEEK_SET:
            pos = offset
        elif whence == os.SEEK_CUR:
            pos = self._pos + offset
        elif whence == os.SEEK_END:
            pos = len(self._data) + offset
        else:
            raise ValueError(f"bad whence {whence}")
        if pos < 0:
            raise IOError("seek before start of memory stream")
        self._pos = min(pos, len(self._data))

    def tell(self) -> int:
        return self._pos

    @property
    def size(self) -> int:
        return len(self._data)


class CustomStream(Stream):
    """User-supplied callbacks (reference: easyav1_init_from_custom_stream)."""

    def __init__(
        self,
        read_func: Callable[[int, object], bytes],
        seek_func: Callable[[int, int, object], None],
        tell_func: Callable[[object], int],
        userdata: object = None,
        close_func: Optional[Callable[[object], None]] = None,
    ):
        self._read = read_func
        self._seek = seek_func
        self._tell = tell_func
        self._close = close_func
        self.userdata = userdata

    def read(self, size: int) -> bytes:
        return self._read(size, self.userdata)

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> None:
        self._seek(offset, whence, self.userdata)

    def tell(self) -> int:
        return self._tell(self.userdata)

    def close(self) -> None:
        if self._close is not None:
            self._close(self.userdata)


def open_stream(source, close_on_destroy: bool = True) -> Stream:
    """Coerce path / file object / bytes / Stream into a Stream."""
    if isinstance(source, Stream):
        return source
    if isinstance(source, (bytes, bytearray, memoryview)):
        return MemoryStream(bytes(source))
    if isinstance(source, (str, os.PathLike)):
        return FileStream(source)
    if isinstance(source, io.IOBase) or hasattr(source, "read"):
        return FileStream(source, close_on_destroy)
    raise TypeError(f"cannot open stream from {type(source)!r}")
