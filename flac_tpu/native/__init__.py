"""Native (C++) host runtime, bound via ctypes.

The TPU does the DSP; this module is the native implementation of the
host-side runtime around it — MD5 accumulate with fused channel
interleave (md5.c:388-520), the decoder's frame-sync scan
(stream_decoder.c:2321,2624), CRC-8/16 (crc.c), and the encoder's ordered
frame gather (stream_encoder.c:3614-3626).

The library is compiled once with g++ at first import and cached next to
this file; every entry point has a pure-Python fallback elsewhere in the
package, so `AVAILABLE` gates usage rather than hard-failing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "flac_native.cpp")
_SO = os.path.join(_DIR, "_flac_native.so")

_lib = None
ABI_VERSION = 5     # must match FT_ABI_VERSION in flac_native.cpp
BUILD_ERROR: str | None = None


def build(force: bool = False) -> str | None:
    """Compile the native runtime (explicit build step; also invoked
    lazily at import).  `python -m flac_tpu.native` calls this and
    reports the outcome."""
    global BUILD_ERROR
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    try:
        with tempfile.NamedTemporaryFile(
                suffix=".so", dir=_DIR, delete=False) as tf:
            tmp = tf.name
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, _SRC],
            check=True, capture_output=True, text=True)
        os.replace(tmp, _SO)
        return _SO
    except subprocess.CalledProcessError as e:
        BUILD_ERROR = (e.stderr or "")[-2000:]
        return None
    except (FileNotFoundError, OSError) as e:
        BUILD_ERROR = str(e)
        return None


def _load():
    global _lib, BUILD_ERROR
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    # ABI stamp: a stale checked-out/cached .so must never pair with
    # newer bindings — rebuild once, then refuse
    try:
        lib.ft_abi_version.restype = ctypes.c_int32
        abi = int(lib.ft_abi_version())
    except AttributeError:
        abi = -1
    if abi != ABI_VERSION:
        so = build(force=True)
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.ft_abi_version.restype = ctypes.c_int32
        if int(lib.ft_abi_version()) != ABI_VERSION:
            BUILD_ERROR = (f"ABI mismatch: .so reports "
                           f"{int(lib.ft_abi_version())}, bindings need "
                           f"{ABI_VERSION}")
            return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ft_crc8.restype = ctypes.c_uint8
    lib.ft_crc8.argtypes = [u8p, ctypes.c_int64]
    lib.ft_crc16.restype = ctypes.c_uint16
    lib.ft_crc16.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint16]
    lib.ft_md5_ctx_size.restype = ctypes.c_int32
    lib.ft_md5_init.argtypes = [ctypes.c_void_p]
    lib.ft_md5_update.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    lib.ft_md5_update_pcm.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
    lib.ft_md5_final.argtypes = [ctypes.c_void_p, u8p]
    lib.ft_scan_frames.restype = ctypes.c_int64
    lib.ft_scan_frames.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        i64p, ctypes.c_int64]
    lib.ft_gather_frames.restype = ctypes.c_int64
    lib.ft_gather_frames.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i64p, u8p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ft_parse_frames.restype = ctypes.c_int64
    lib.ft_parse_frames.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, i64p, i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p,
        ctypes.c_void_p, ctypes.c_void_p, i64p, i32p]
    lib.ft_tile_scan.restype = ctypes.c_int64
    lib.ft_tile_scan.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, i64p, i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p, i64p, i32p, i64p, i32p, i32p, i32p,
        i32p]
    lib.ft_decode_frames.restype = ctypes.c_int64
    lib.ft_decode_frames.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, i64p, i32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, ctypes.c_int32, ctypes.c_int32, i32p, i64p, ctypes.c_int64,
        i64p, i32p]
    lib.ft_restore.argtypes = [
        i32p, i32p, i32p, i32p, i32p,
        ctypes.c_int64, ctypes.c_int64, i64p]
    lib.ft_restore_wide.argtypes = [
        i64p, i32p, i32p, i32p, i32p,
        ctypes.c_int64, ctypes.c_int64, i64p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.ft_iir.argtypes = [f64p, f64p, ctypes.c_int64, f64p, f64p,
                           ctypes.c_int32]
    _lib = lib
    return lib


try:
    _load()
except Exception as _e:      # pragma: no cover - defensive
    BUILD_ERROR = BUILD_ERROR or repr(_e)
    _lib = None

AVAILABLE = _lib is not None

if not AVAILABLE:
    # loud, once: every entry point has a pure-Python fallback, but a
    # silent 10-100x slowdown is a bug report waiting to happen
    import sys as _sys
    print("flac_tpu: native runtime UNAVAILABLE (pure-Python fallbacks "
          f"active; {BUILD_ERROR or 'no compiler?'}). Run "
          "`python -m flac_tpu.native` to build and see the error.",
          file=_sys.stderr)


def _u8(buf) -> ctypes.POINTER(ctypes.c_uint8):
    return ctypes.cast(
        (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf)
        if isinstance(buf, (bytes, bytearray)) else
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint8))


def crc8(data: bytes) -> int:
    return _lib.ft_crc8(_u8(data), len(data))


def crc16(data: bytes, init: int = 0) -> int:
    return _lib.ft_crc16(_u8(data), len(data), init)


class MD5:
    """Streaming MD5 with a fused FLAC PCM interleave path."""

    def __init__(self):
        self._ctx = ctypes.create_string_buffer(_lib.ft_md5_ctx_size())
        _lib.ft_md5_init(self._ctx)

    def update(self, data: bytes) -> None:
        _lib.ft_md5_update(self._ctx, _u8(data), len(data))

    def update_pcm(self, pcm: np.ndarray, bps: int) -> None:
        """pcm: [C, N] int32 with contiguous rows (any channel stride —
        spans of a larger [C, total] array hash in place); hashes the FLAC
        MD5 byte stream (sample-major, little-endian, (bps+7)//8 bytes
        per sample)."""
        if pcm.dtype != np.int32 or pcm.strides[1] != 4:
            pcm = np.ascontiguousarray(pcm, np.int32)
        C, N = pcm.shape
        _lib.ft_md5_update_pcm(
            self._ctx, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            C, N, pcm.strides[0] // 4, (bps + 7) // 8)

    def digest(self) -> bytes:
        # finalize a copy so the accumulator can keep going
        ctx = ctypes.create_string_buffer(self._ctx.raw, len(self._ctx))
        out = (ctypes.c_uint8 * 16)()
        _lib.ft_md5_final(ctx, out)
        return bytes(out)


_SCAN_FIELDS = ("offset", "number", "blocksize", "sample_rate", "channels",
                "assignment", "bps", "variable", "header_bits")


def scan_frames(data: bytes, start: int, stream_bps: int,
                stream_rate: int) -> list[dict]:
    """Native frame-sync scan; returns header dicts compatible with
    decoder.scan_frames (size/header_end_bits filled by the caller)."""
    arr = np.frombuffer(data, np.uint8)
    max_frames = max(16, len(data) // 10)
    out = np.empty((max_frames, 9), np.int64)
    n = _lib.ft_scan_frames(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        start, stream_bps, stream_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_frames)
    frames = []
    for row in out[:n]:
        d = dict(zip(_SCAN_FIELDS, (int(v) for v in row)))
        d["header_end_bits"] = d["offset"] * 8 + d.pop("header_bits")
        frames.append(d)
    return frames


def iir_filter(x: np.ndarray, b: np.ndarray, a: np.ndarray,
               x_hist: np.ndarray, y_hist: np.ndarray):
    """Direct-form IIR with explicit history (ReplayGain filter cascade).

    x: [n] float64; b, a: [order+1] coefficients (a[0] ignored, == 1);
    x_hist, y_hist: [order] trailing history from the previous call
    (oldest first).  Returns (y [n], new_x_hist, new_y_hist).
    """
    order = len(b) - 1
    n = len(x)
    xp = np.concatenate([x_hist[-order:] if order else x_hist, x])
    yp = np.empty(order + n, np.float64)
    yp[:order] = y_hist[-order:]
    f64p = ctypes.POINTER(ctypes.c_double)
    _lib.ft_iir(xp[order:].ctypes.data_as(f64p),
                yp[order:].ctypes.data_as(f64p), n,
                np.ascontiguousarray(b, np.float64).ctypes.data_as(f64p),
                np.ascontiguousarray(a, np.float64).ctypes.data_as(f64p),
                order)
    if n >= order:
        return yp[order:], xp[-order:].copy(), yp[-order:].copy()
    return (yp[order:], np.concatenate([x_hist, x])[-order:],
            yp[-order:].copy())


# Frame parse/restore status codes (mirror flac_native.cpp enum)
FT_OK = 0
FT_PARSE_ERR = 1
FT_CRC16_BAD = 2
FT_RES_OVERFLOW = 3
FT_EXTENT_MISMATCH = 4
FT_OOR = 5
FT_SEG_OVERFLOW = 6


SEG_INERT = (255 << 7) | 1      # raw width-0 x255 idle segment


class TileGroup:
    """ft_tile_scan output: per-subframe restore metadata + per-lane
    segment tables for the device Rice decoder (ops/bitunpack.py)."""

    __slots__ = ("order", "shift", "wasted", "sftype", "qlp", "lane_start",
                 "segs", "end_bits", "status", "wide", "max_tile_bits",
                 "max_segs", "tiles")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def tile_scan(data, offsets, start_bits, sizes, ch_bps, blocksize: int,
              T: int = 128, segmax: int = 8) -> TileGroup:
    """Skip-walk F same-shape frames emitting device-decode tile tables
    (boundaries + {skip,count,param,kind} segments — no residuals touch
    the host).  ~3x cheaper than parse_frames per byte."""
    arr = data if isinstance(data, np.ndarray) else \
        np.frombuffer(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    start_bits = np.ascontiguousarray(start_bits, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int64)
    ch_bps = np.ascontiguousarray(ch_bps, np.int32)
    F, C = ch_bps.shape
    S = F * C
    N = blocksize
    tiles = (N + T - 1) // T
    order = np.zeros(S, np.int32)
    shift = np.zeros(S, np.int32)
    wasted = np.zeros(S, np.int32)
    sftype = np.zeros(S, np.int32)
    qlp = np.zeros((S, 32), np.int32)
    lane_start = np.zeros(S * tiles, np.int64)
    segs = np.full((S * tiles, segmax), SEG_INERT, np.int32)
    end_bits = np.zeros(F, np.int64)
    status = np.zeros(F, np.int32)
    wide = np.zeros(F, np.int32)
    max_tile_bits = np.zeros(1, np.int32)
    max_segs = np.zeros(1, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    _lib.ft_tile_scan(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr),
        offsets.ctypes.data_as(i64p), start_bits.ctypes.data_as(i64p),
        sizes.ctypes.data_as(i64p), ch_bps.ctypes.data_as(i32p),
        F, C, N, T, segmax,
        order.ctypes.data_as(i32p), shift.ctypes.data_as(i32p),
        wasted.ctypes.data_as(i32p), sftype.ctypes.data_as(i32p),
        qlp.ctypes.data_as(i32p), lane_start.ctypes.data_as(i64p),
        segs.ctypes.data_as(i32p), end_bits.ctypes.data_as(i64p),
        status.ctypes.data_as(i32p), wide.ctypes.data_as(i32p),
        max_tile_bits.ctypes.data_as(i32p), max_segs.ctypes.data_as(i32p))
    return TileGroup(order=order, shift=shift, wasted=wasted, sftype=sftype,
                     qlp=qlp, lane_start=lane_start, segs=segs,
                     end_bits=end_bits, status=status, wide=wide,
                     max_tile_bits=int(max_tile_bits[0]),
                     max_segs=int(max_segs[0]), tiles=tiles)


def decode_frames_full(data, offsets, start_bits, sizes, ch_bps,
                       blocksize: int, assignment, check_bps: int = 0,
                       verify_crc: bool = True, out=None, out_off=None):
    """Fused all-CPU frame decode: parse + restore + stereo undo + range
    check in one native pass (the host engine's hot loop).

    With out=None returns (pcm [F, C, N] int32, end_bits, status); with
    out (a [C, total] int32 array with contiguous rows) and out_off (per-
    frame sample offsets) the frames decode straight into the final PCM
    array — no assembly pass — and pcm is returned as None.
    check_bps enables the stream_decoder.c:2458-2472 bps-range rejection
    (status FT_OOR).  ctypes releases the GIL, so chunks of the frame
    table parallelize across a thread pool.
    """
    arr = data if isinstance(data, np.ndarray) else \
        np.frombuffer(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    start_bits = np.ascontiguousarray(start_bits, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int64)
    ch_bps = np.ascontiguousarray(ch_bps, np.int32)
    assignment = np.ascontiguousarray(assignment, np.int32)
    F, C = ch_bps.shape
    end_bits = np.zeros(F, np.int64)
    status = np.zeros(F, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    if out is None:
        dest = np.empty((F, C, blocksize), np.int32)
        off_p, stride = None, 0
    else:
        assert out.dtype == np.int32 and out.strides[1] == 4
        dest = out
        out_off = np.ascontiguousarray(out_off, np.int64)
        off_p, stride = out_off.ctypes.data_as(i64p), out.strides[0] // 4
    _lib.ft_decode_frames(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr),
        offsets.ctypes.data_as(i64p), start_bits.ctypes.data_as(i64p),
        sizes.ctypes.data_as(i64p), ch_bps.ctypes.data_as(i32p),
        F, C, blocksize, assignment.ctypes.data_as(i32p),
        check_bps, int(verify_crc),
        dest.ctypes.data_as(i32p), off_p, stride,
        end_bits.ctypes.data_as(i64p), status.ctypes.data_as(i32p))
    return (dest if out is None else None), end_bits, status


class ParsedGroup:
    """Phase-1 parse output for a batch of same-shape frames: normalized
    restore form (see flac_native.cpp ft_parse_frames docs)."""

    __slots__ = ("order", "shift", "wasted", "sftype", "qlp", "res",
                 "end_bits", "status", "wide")

    def __init__(self, order, shift, wasted, sftype, qlp, res, end_bits,
                 status, wide):
        self.order = order          # [S] int32
        self.shift = shift          # [S] int32
        self.wasted = wasted        # [S] int32
        self.sftype = sftype        # [S] int32 (0 const,1 verb,2 fixed,3 lpc)
        self.qlp = qlp              # [S, 32] int32 (normalized taps)
        self.res = res              # [S, N] int32 (or int64 when wide)
        self.end_bits = end_bits    # [F] int64 absolute bit cursor
        self.status = status        # [F] int32 FT_* codes
        self.wide = wide


def parse_frames(data, offsets, start_bits, sizes, ch_bps,
                 blocksize: int, wide: bool = False) -> ParsedGroup:
    """Native phase-1 frame parse: bit-walk F same-shape frames, emitting
    per-subframe (order, shift, wasted, qlp, residual) in the normalized
    uniform-LPC restore form plus CRC-16/extent status per frame.

    data: bytes/uint8 array of the whole stream; offsets/start_bits/sizes:
    [F] int64 (start_bits absolute); ch_bps: [F, C] int32.
    Automatically retries in wide (int64 residual) mode if any frame
    overflows int32.
    """
    arr = data if isinstance(data, np.ndarray) else \
        np.frombuffer(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    start_bits = np.ascontiguousarray(start_bits, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int64)
    ch_bps = np.ascontiguousarray(ch_bps, np.int32)
    F, C = ch_bps.shape
    S = F * C
    N = blocksize
    order = np.zeros(S, np.int32)
    shift = np.zeros(S, np.int32)
    wasted = np.zeros(S, np.int32)
    sftype = np.zeros(S, np.int32)
    qlp = np.zeros((S, 32), np.int32)
    res = np.zeros((S, N), np.int64 if wide else np.int32)
    end_bits = np.zeros(F, np.int64)
    status = np.zeros(F, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    _lib.ft_parse_frames(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr),
        offsets.ctypes.data_as(i64p), start_bits.ctypes.data_as(i64p),
        sizes.ctypes.data_as(i64p), ch_bps.ctypes.data_as(i32p),
        F, C, N,
        order.ctypes.data_as(i32p), shift.ctypes.data_as(i32p),
        wasted.ctypes.data_as(i32p), sftype.ctypes.data_as(i32p),
        qlp.ctypes.data_as(i32p),
        None if wide else res.ctypes.data_as(i32p),
        res.ctypes.data_as(i64p) if wide else None,
        end_bits.ctypes.data_as(i64p), status.ctypes.data_as(i32p))
    if not wide and np.any(status == FT_RES_OVERFLOW):
        return parse_frames(data, offsets, start_bits, sizes, ch_bps,
                            blocksize, wide=True)
    return ParsedGroup(order, shift, wasted, sftype, qlp, res, end_bits,
                       status, wide)


def restore_subframes(pg: ParsedGroup) -> np.ndarray:
    """Host (CPU) phase-2 restore of a ParsedGroup -> [S, N] int64
    subframe signals with wasted bits applied."""
    S, N = pg.res.shape
    out = np.empty((S, N), np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    fn = _lib.ft_restore_wide if pg.wide else _lib.ft_restore
    fn(pg.res.ctypes.data_as(i64p if pg.wide else i32p),
       pg.order.ctypes.data_as(i32p), pg.shift.ctypes.data_as(i32p),
       pg.wasted.ctypes.data_as(i32p), pg.qlp.ctypes.data_as(i32p),
       S, N, out.ctypes.data_as(i64p))
    return out


def gather_frames(rows: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate the first lens[i] bytes of each row (ordered gather)."""
    rows = np.ascontiguousarray(rows, np.uint8)
    lens64 = np.ascontiguousarray(lens, np.int64)
    out = np.empty(int(lens64.sum()), np.uint8)
    _lib.ft_gather_frames(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows.shape[0], rows.shape[1],
        lens64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()
