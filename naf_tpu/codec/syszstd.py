"""ctypes binding to the SYSTEM libzstd for section compression.

Why this exists: the reference binaries link the system libzstd (1.5.4 on
this image) while the Python ``zstandard`` wheel bundles its own newer copy
(1.5.7), whose high-level match finder trades ~4% ratio on packed DNA at
levels 17-19.  Ratio parity with the locally built reference requires the
locally linked codec, so the encode path binds the system library directly
and replicates ennaf's exact call shape
(/root/reference/ennaf/src/compressor.c:7-21: setParameter(LDM, windowLog)
then level, streamed).  Decompression stays on ``zstandard`` — frames are
interchangeable.

Falls back cleanly: ``load()`` returns None when no system libzstd is
available and the backend keeps using ``zstandard`` (the choice is
per-process, so the byte-identity invariants across in-memory/streaming/
sharded paths are unaffected).
"""

from __future__ import annotations

import ctypes as ct
import ctypes.util
from typing import Optional

# stable public ZSTD_cParameter / ZSTD_EndDirective enum values
_C_LEVEL = 100
_C_WINDOWLOG = 101
_C_ENABLE_LDM = 160
_C_CONTENTSIZE = 200
_C_NBWORKERS = 400
_E_CONTINUE = 0
_E_END = 2

_lib = None
_loaded = False


def load():
    """The system libzstd handle, or None (memoized)."""
    global _lib, _loaded
    if _loaded:
        return _lib
    _loaded = True
    path = ctypes.util.find_library("zstd")
    if not path:
        return None
    try:
        lib = ct.CDLL(path)
        lib.ZSTD_versionNumber.restype = ct.c_uint
        if lib.ZSTD_versionNumber() < 10400:   # needs ZSTD_compressStream2
            return None
        lib.ZSTD_createCCtx.restype = ct.c_void_p
        lib.ZSTD_freeCCtx.argtypes = [ct.c_void_p]
        lib.ZSTD_CCtx_setParameter.restype = ct.c_size_t
        lib.ZSTD_CCtx_setParameter.argtypes = [ct.c_void_p, ct.c_int, ct.c_int]
        lib.ZSTD_CCtx_setPledgedSrcSize.restype = ct.c_size_t
        lib.ZSTD_CCtx_setPledgedSrcSize.argtypes = [ct.c_void_p, ct.c_ulonglong]
        lib.ZSTD_compressStream2.restype = ct.c_size_t
        lib.ZSTD_compressStream2.argtypes = [ct.c_void_p, ct.c_void_p,
                                             ct.c_void_p, ct.c_int]
        lib.ZSTD_isError.restype = ct.c_uint
        lib.ZSTD_isError.argtypes = [ct.c_size_t]
        lib.ZSTD_CStreamOutSize.restype = ct.c_size_t
        _lib = lib
    except OSError:
        return None
    return _lib


class _Buf(ct.Structure):          # ZSTD_outBuffer / ZSTD_inBuffer layout
    _fields_ = [("dst", ct.c_void_p), ("size", ct.c_size_t),
                ("pos", ct.c_size_t)]


class SysZstdCompressor:
    """Streaming single-frame compressor over the system libzstd.

    Mirrors ``zstandard``'s compressobj surface used by SectionCompressor:
    ``compress(data) -> bytes`` and ``flush_finish() -> bytes``.
    ``pledged_size`` turns on one-shot-style window/table right-sizing and
    a content-size header (used by the buffered small-section path).
    """

    def __init__(self, level: int, window_log: int = 0, threads: int = 0,
                 pledged_size: Optional[int] = None):
        lib = load()
        assert lib is not None
        self._lib = lib
        self._cctx = lib.ZSTD_createCCtx()
        if not self._cctx:
            raise MemoryError("ZSTD_createCCtx failed")

        def setp(param, value):
            r = lib.ZSTD_CCtx_setParameter(self._cctx, param, value)
            if lib.ZSTD_isError(r):
                raise RuntimeError(f"ZSTD_CCtx_setParameter({param}) failed")

        # ennaf order: LDM + windowLog first, then level (compressor.c:7-21)
        if window_log:
            setp(_C_ENABLE_LDM, 1)
            setp(_C_WINDOWLOG, window_log)
        setp(_C_LEVEL, level)
        if threads:
            setp(_C_NBWORKERS, threads)
        if pledged_size is not None:
            r = lib.ZSTD_CCtx_setPledgedSrcSize(self._cctx, pledged_size)
            if lib.ZSTD_isError(r):
                raise RuntimeError("ZSTD_CCtx_setPledgedSrcSize failed")
        else:
            setp(_C_CONTENTSIZE, 0)    # streaming: no content-size header
        self._out_cap = max(int(lib.ZSTD_CStreamOutSize()), 1 << 17)
        self._outbuf = ct.create_string_buffer(self._out_cap)

    def __del__(self):
        cctx = getattr(self, "_cctx", None)
        if cctx:
            self._lib.ZSTD_freeCCtx(cctx)
            self._cctx = None

    def _pump(self, src, n: int, end_op: int) -> bytes:
        lib = self._lib
        inb = _Buf(ct.cast(src, ct.c_void_p), n, 0)
        chunks = []
        while True:
            outb = _Buf(ct.cast(self._outbuf, ct.c_void_p), self._out_cap, 0)
            r = lib.ZSTD_compressStream2(self._cctx, ct.byref(outb),
                                         ct.byref(inb), end_op)
            if lib.ZSTD_isError(r):
                raise RuntimeError("ZSTD_compressStream2 failed")
            if outb.pos:
                chunks.append(self._outbuf.raw[:outb.pos])
            if end_op == _E_END:
                if r == 0:
                    break
            elif inb.pos == inb.size:
                break
        return b"".join(chunks)

    def compress(self, data) -> bytes:
        mv = memoryview(data)
        if mv.nbytes == 0:
            return b""
        if mv.format != "B":
            mv = mv.cast("B")
        if not mv.readonly:                      # numpy scratch: zero-copy
            arr = (ct.c_char * mv.nbytes).from_buffer(mv)
            return self._pump(arr, mv.nbytes, _E_CONTINUE)
        if isinstance(data, bytes):              # bytes object: zero-copy
            return self._pump(ct.c_char_p(data), mv.nbytes, _E_CONTINUE)
        return self._pump(ct.c_char_p(bytes(mv)), mv.nbytes, _E_CONTINUE)

    def flush_finish(self) -> bytes:
        return self._pump(ct.c_char_p(b""), 0, _E_END)

    def flush(self, _mode=None) -> bytes:
        """zstandard-compressobj-compatible spelling of flush_finish."""
        return self.flush_finish()


def compress_oneshot(payload: bytes, level: int, window_log: int = 0) -> bytes:
    """One frame with pledged source size (window right-sized by libzstd)."""
    c = SysZstdCompressor(level, window_log=window_log,
                          pledged_size=len(payload))
    head = c.compress(payload)
    return head + c.flush_finish()
