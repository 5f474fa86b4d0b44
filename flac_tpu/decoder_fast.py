"""Fast batched decoder: native bit-parse (phase 1) + uniform device
LPC restore (phase 2).

The reference decodes pull-style, one frame at a time, fusing bit reading
with prediction (stream_decoder.c:3000-3420 read_subframe_*,
bitreader.c:834 Rice reads, lpc.c:978 restore).  A TPU cannot vectorize
the bit-serial part (every Rice code's length is data-dependent), so this
pipeline splits the work where the hardware boundary is:

  phase 1 (host, C++): ft_parse_frames walks each frame's bits once,
    extracting residuals/coefficients and CRC-16-verifying the trailer.
    Every subframe type is normalized to a single uniform LPC-restore
    form (constant -> order-1 tap {1}; fixed -> its taps, shift 0;
    verbatim -> order 0; warmup -> res[0..order)), so phase 2 needs no
    per-type control flow.  Frames parse independently -> thread pool.

  phase 2 (device): ONE jitted restore scan, vectorized over every
    subframe of the batch: x[n] = res[n] + ((sum c_i * x[n-i]) >> shift),
    `unroll` samples per scan step so step dispatch overhead amortizes;
    stereo undo + wasted-bits shift + output narrowing stay on device so
    the fetch moves exactly PCM-sized data.

Batches pipeline: while the device restores batch i, the host parses
batch i+1 (jax dispatch is async; the fetch is the only sync point).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import format as fmt
from . import native
from .ref_decoder import DecodedStream, FlacDecodeError

# compile-key buckets: subframe count is padded to a power of two and the
# restore loop length to one of these, so arbitrary batch shapes reuse a
# handful of compiled programs
_ORDER_BUCKETS = (1, 2, 4, 8, 12, 16, 32)


def _bucket_order(mo: int) -> int:
    for b in _ORDER_BUCKETS:
        if mo <= b:
            return b
    return 32


@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "channels", "max_order", "unroll",
                     "wide", "out16", "bps"))
def restore_and_undo(res, order, shift, qlp, wasted, assignment, *,
                     blocksize: int, channels: int, max_order: int,
                     unroll: int = 16, wide: bool = False,
                     out16: bool = False, bps: int = 0):
    """Uniform batched subframe restore + stereo undo.

    res:        [S, N] int16/int32 (int64 when wide) normalized residuals
    order/shift/wasted: [S] int32;  qlp: [S, max_order] int32
    assignment: [B] int32 (S = B * channels)
    Returns ([B, channels, N] PCM (int16 when out16, else int32/int64),
             [B] bool out-of-range flags — the stream_decoder.c:2458-2472
             bps-range lost-sync check, evaluated BEFORE any narrowing so
             wrapped int16 values cannot evade it).  bps=0 disables the
             check (flags all False).  Body shared with the device Rice
             engine (ops/bitunpack.py restore_undo_body).
    """
    from .ops.bitunpack import restore_undo_body
    return restore_undo_body(
        res, order, shift, qlp, wasted, assignment, blocksize=blocksize,
        channels=channels, max_order=max_order, unroll=unroll, wide=wide,
        out16=out16, bps=bps)


def _group_arrays(frames, idxs, channels):
    """Build the phase-1 input table for one batch of frame indices."""
    F = len(idxs)
    offsets = np.empty(F, np.int64)
    start_bits = np.empty(F, np.int64)
    sizes = np.empty(F, np.int64)
    asg = np.empty(F, np.int32)
    ch_bps = np.empty((F, channels), np.int32)
    for j, i in enumerate(idxs):
        f = frames[i]
        offsets[j] = f["offset"]
        start_bits[j] = f["header_end_bits"]
        sizes[j] = f["size"]
        asg[j] = f["assignment"]
        for c in range(channels):
            extra = int(
                (f["assignment"] == fmt.CHANNEL_ASSIGNMENT_LEFT_SIDE
                 and c == 1) or
                (f["assignment"] == fmt.CHANNEL_ASSIGNMENT_RIGHT_SIDE
                 and c == 0) or
                (f["assignment"] == fmt.CHANNEL_ASSIGNMENT_MID_SIDE
                 and c == 1))
            ch_bps[j, c] = f["bps"] + extra
    return offsets, start_bits, sizes, asg, ch_bps


def _parse_batch(arr, frames, idxs, blocksize, channels):
    """Phase 1 for one batch (runs on a worker thread: ctypes releases
    the GIL, so parse overlaps the tunnel transfers)."""
    offsets, start_bits, sizes, asg, ch_bps = _group_arrays(
        frames, idxs, channels)
    wide = int(ch_bps.max()) >= 32 if len(idxs) else False
    pg = native.parse_frames(arr, offsets, start_bits, sizes, ch_bps,
                             blocksize, wide=wide)
    return pg, asg


def _dispatch_batch(arr, frames, idxs, blocksize, channels, bps,
                    parsed=None):
    """Phase 1 (unless pre-parsed) + device dispatch for one batch.
    Returns (device_out, pg, asg) with device_out in flight."""
    pg, asg = parsed if parsed is not None else _parse_batch(
        arr, frames, idxs, blocksize, channels)
    F = len(idxs)
    # pad the batch to a power of two so compile keys are reused
    Fp = max(8, 1 << (F - 1).bit_length())
    S, Sp = F * channels, Fp * channels
    res = pg.res
    if not pg.wide and res.max(initial=0) < 32768 \
            and res.min(initial=0) >= -32768:
        res = res.astype(np.int16)      # halve the upload
    if Sp != S:
        res = np.pad(res, ((0, Sp - S), (0, 0)))
    pad_s = ((0, Sp - S),)
    mo = _bucket_order(int(pg.order.max(initial=0)))
    out, oor = restore_and_undo(
        jnp.asarray(res), jnp.asarray(np.pad(pg.order, pad_s)),
        jnp.asarray(np.pad(pg.shift, pad_s)),
        jnp.asarray(np.pad(pg.qlp[:, :mo], (pad_s[0], (0, 0)))),
        jnp.asarray(np.pad(pg.wasted, pad_s)),
        jnp.asarray(np.pad(asg, (0, Fp - F))),
        blocksize=blocksize, channels=channels, max_order=mo,
        wide=pg.wide, out16=(bps <= 16 and not pg.wide), bps=bps)
    return (out, oor), pg, asg


def decode_frame_list_fast(data, st: DecodedStream, frames: list, *,
                           verify_crc: bool = True, max_batch: int = 1024,
                           on_crc_error: str = "raise",
                           pipeline_depth: int = 3) -> list:
    """Batched fast decode of an explicit frame-header list; same contract
    as decoder.decode_frame_list ([C, N] int32 per frame, None for frames
    dropped under on_crc_error="drop")."""
    results: list[np.ndarray | None] = [None] * len(frames)
    groups: dict[tuple, list[int]] = {}
    for i, f in enumerate(frames):
        groups.setdefault((f["blocksize"], f["channels"]), []).append(i)
    arr = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data

    # build the batch list, then run it as a depth-limited pipeline:
    # parse/dispatch runs ahead of the ordered fetch+commit, and a small
    # pool keeps several d2h copies in flight (the tunnel multiplexes:
    # ~28 MB/s serial vs ~55 MB/s with 3 concurrent, measured — same
    # finding as the encoder's fetch pool)
    from concurrent.futures import ThreadPoolExecutor
    batches = []
    for (blocksize, channels), idxs in groups.items():
        for lo in range(0, len(idxs), max_batch):
            batches.append((blocksize, channels, idxs[lo:lo + max_batch]))

    inflight = []
    pool = ThreadPoolExecutor(max_workers=3)

    def commit(fut, pg, asg, idxs, blocksize, channels):
        F = len(idxs)
        bad: dict[int, str] = {}
        for j in range(F):
            s = int(pg.status[j])
            if s in (native.FT_OK, native.FT_EXTENT_MISMATCH):
                continue
            if s == native.FT_CRC16_BAD and not verify_crc:
                continue
            label = ("FRAME_CRC_MISMATCH" if s == native.FT_CRC16_BAD
                     else "LOST_SYNC")
            if on_crc_error == "raise":
                raise FlacDecodeError(
                    f"frame {'CRC16 mismatch' if label == 'FRAME_CRC_MISMATCH' else 'parse failure (lost sync)'}"
                    f" at frame {frames[idxs[j]]['number']}")
            bad[j] = label
        sig_np, oor_flags = fut.result()
        sig_np = sig_np[:F]
        if sig_np.dtype != np.int32:
            sig_np = sig_np.astype(np.int32)
        # decoded-sample range check (stream_decoder.c:2458-2472), computed
        # on device on the pre-narrowed signal (see restore_and_undo)
        oor = np.nonzero(oor_flags[:F])[0]
        for j in oor:
            j = int(j)
            if j in bad:
                continue
            if on_crc_error == "raise":
                raise FlacDecodeError(
                    "decoded sample out of bps range (lost sync) at "
                    f"frame {frames[idxs[j]]['number']}")
            bad[j] = "LOST_SYNC"
        for j, i in enumerate(idxs):
            if j in bad:
                if not hasattr(st, "errors"):
                    st.errors = []
                st.errors.append((bad[j], frames[i]["number"]))
                continue
            results[i] = sig_np[j]

    parse_pool = ThreadPoolExecutor(max_workers=2)
    try:
        # parse runs ahead of dispatch, but only a bounded window so a
        # long file never holds more than ~pipeline_depth batches of
        # residuals in RAM
        parse_futs: dict[int, object] = {}

        def ensure_parsed(upto: int):
            for j in range(upto + 1):
                if j < len(batches) and j not in parse_futs:
                    bs_j, ch_j, idx_j = batches[j]
                    parse_futs[j] = parse_pool.submit(
                        _parse_batch, arr, frames, idx_j, bs_j, ch_j)

        for bi, (blocksize, channels, idxs) in enumerate(batches):
            ensure_parsed(bi + pipeline_depth)
            pf = parse_futs.pop(bi)
            bps = st.bits_per_sample or max(frames[i]["bps"] for i in idxs)
            (out, oor), pg, asg = _dispatch_batch(arr, frames, idxs,
                                                  blocksize, channels, bps,
                                                  parsed=pf.result())
            for dv in (out, oor):
                try:
                    dv.copy_to_host_async()
                except AttributeError:
                    pass
            fut = pool.submit(lambda o=out, r=oor: (np.asarray(o),
                                                    np.asarray(r)))
            inflight.append((fut, pg, asg, idxs, blocksize, channels))
            while len(inflight) > pipeline_depth:
                commit(*inflight.pop(0))
        while inflight:
            commit(*inflight.pop(0))
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
        parse_pool.shutdown(wait=False, cancel_futures=True)
    return results


class StreamHasher:
    """Incremental stream-order MD5 (md5.c:497 FLAC__MD5Accumulate):
    hashes committed frames while later chunks are still decoding, hiding
    the hash cost inside the decode wall.  Becomes invalid if any frame
    fails, is skipped, or arrives out of stream order — callers then fall
    back to hashing the assembled samples."""

    def __init__(self, bps: int):
        self.h = native.MD5()
        self.bps = bps
        self.valid = native.AVAILABLE
        self.nframes = 0
        self._next = 0

    def _chain(self, idxs) -> bool:
        if not self.valid:
            return False
        if list(idxs) != list(range(self._next, self._next + len(idxs))):
            self.valid = False
            return False
        self._next += len(idxs)
        self.nframes += len(idxs)
        return True

    def add_span(self, view, idxs) -> None:
        """view: [C, n] int32 span of the final PCM array (any channel
        stride) covering frames idxs — hashed in place, no copies."""
        if self._chain(idxs):
            self.h.update_pcm(view, self.bps)

    def add_packed(self, pcm, idxs) -> None:
        """pcm: [F, C, N] int32 decoded chunk for frame indices idxs."""
        if self._chain(idxs):
            for j in range(len(idxs)):
                self.h.update_pcm(pcm[j], self.bps)

    def digest(self) -> bytes:
        return self.h.digest()


def decode_frame_list_host(data, st: DecodedStream, frames: list, *,
                           verify_crc: bool = True,
                           on_crc_error: str = "raise",
                           workers: int | None = None,
                           md5_hasher: StreamHasher | None = None) -> list:
    """All-CPU decode path: ONE fused native pass per frame (parse +
    in-place restore + stereo undo + range check, ft_decode_frames),
    frame chunks split across a thread pool (ctypes releases the GIL),
    decoding straight into the final channel-major PCM array (no
    assembly pass; st._assembled exposes it to decode_stream_tpu).
    The host twin of the reference's single-threaded read_frame_ loop —
    but data-parallel over the frame table, so it scales with cores.
    Used by engine="auto" whenever the host↔device link would be the
    bottleneck, and for seeks/tooling."""
    results: list[np.ndarray | None] = [None] * len(frames)
    groups: dict[tuple, list[int]] = {}
    for i, f in enumerate(frames):
        groups.setdefault((f["blocksize"], f["channels"]), []).append(i)
    arr = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data
    import os
    from concurrent.futures import ThreadPoolExecutor
    nw = workers or min(8, os.cpu_count() or 1)
    chunk = 64

    # uniform channel count => decode all groups straight into one final
    # [C, total] array at each frame's cumulative sample offset
    st._assembled = None
    offs = np.zeros(len(frames) + 1, np.int64)
    for i, f in enumerate(frames):
        offs[i + 1] = offs[i] + f["blocksize"]
    chans = {f["channels"] for f in frames}
    full = None
    if len(chans) == 1:
        full = np.empty((chans.pop(), int(offs[-1])), np.int32)

    def run_chunk(idxs, blocksize, channels):
        offsets, start_bits, sizes, asg, ch_bps = _group_arrays(
            frames, idxs, channels)
        return native.decode_frames_full(
            arr, offsets, start_bits, sizes, ch_bps, blocksize, asg,
            check_bps=st.bits_per_sample, verify_crc=verify_crc,
            out=full, out_off=None if full is None else offs[list(idxs)])

    jobs = []
    with ThreadPoolExecutor(max_workers=nw) as pool:
        for (blocksize, channels), idxs in groups.items():
            for lo in range(0, len(idxs), chunk):
                sub = idxs[lo:lo + chunk]
                jobs.append((sub, blocksize,
                             pool.submit(run_chunk, sub, blocksize,
                                         channels)))
        all_ok = True
        for sub, blocksize, fut in jobs:
            pcm, _end_bits, status = fut.result()
            chunk_ok = True
            for j, i in enumerate(sub):
                s = int(status[j])
                ok = s in (native.FT_OK, native.FT_EXTENT_MISMATCH) or \
                    (s == native.FT_CRC16_BAD and not verify_crc)
                if not ok:
                    chunk_ok = all_ok = False
                    label = ("FRAME_CRC_MISMATCH"
                             if s == native.FT_CRC16_BAD else "LOST_SYNC")
                    if on_crc_error == "raise":
                        kind = ("CRC16 mismatch"
                                if s == native.FT_CRC16_BAD
                                else "parse failure (lost sync)")
                        raise FlacDecodeError(
                            f"frame {kind} at frame {frames[i]['number']}")
                    if not hasattr(st, "errors"):
                        st.errors = []
                    st.errors.append((label, frames[i]["number"]))
                    continue
                results[i] = (full[:, offs[i]:offs[i] + blocksize]
                              if full is not None else pcm[j])
            if md5_hasher is not None:
                if not chunk_ok:
                    md5_hasher.valid = False
                elif full is not None:
                    md5_hasher.add_span(
                        full[:, offs[sub[0]]:offs[sub[-1] + 1]], sub)
                else:
                    md5_hasher.add_packed(pcm, sub)
        if full is not None and all_ok:
            st._assembled = full
    return results


def _undo_stereo_np(sig, assignment):
    """numpy twin of decoder._undo_stereo; sig [B, 2, N] int64."""
    a, b = sig[:, 0], sig[:, 1]
    asg = assignment[:, None]
    left = np.where(asg == fmt.CHANNEL_ASSIGNMENT_LEFT_SIDE, a,
             np.where(asg == fmt.CHANNEL_ASSIGNMENT_RIGHT_SIDE, b + a,
              np.where(asg == fmt.CHANNEL_ASSIGNMENT_MID_SIDE,
                       (((a << 1) | (b & 1)) + b) >> 1, a)))
    right = np.where(asg == fmt.CHANNEL_ASSIGNMENT_LEFT_SIDE, a - b,
              np.where(asg == fmt.CHANNEL_ASSIGNMENT_RIGHT_SIDE, b,
               np.where(asg == fmt.CHANNEL_ASSIGNMENT_MID_SIDE,
                        (((a << 1) | (b & 1)) - b) >> 1, b)))
    return np.stack([left, right], axis=1)


def repair_frame_table(data, st: DecodedStream, frames: list) -> list:
    """Strict-mode false-sync recovery (stream_decoder.c:2443-2480's
    decode-then-CRC16 rejection, batched): when a frame's payload happens
    to contain a byte pattern that scans as a valid next-numbered header,
    the scan truncates the real frame at the fake header and the frame
    fails to parse/CRC.  Re-parse such frames with an open-ended limit to
    find their true extent, drop the phantom scan entries the real frame
    swallowed, and rescan from the corrected end.
    """
    if not native.AVAILABLE or not frames:
        return frames
    arr = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data
    from .decoder import scan_frames
    out = list(frames)
    changed = True
    rounds = 0
    max_rounds = 64
    while changed and rounds < max_rounds:
        changed = False
        rounds += 1
        groups: dict[tuple, list[int]] = {}
        for i, f in enumerate(out):
            groups.setdefault((f["blocksize"], f["channels"]), []).append(i)
        bad_i = None
        for (blocksize, channels), idxs in groups.items():
            offsets, start_bits, sizes, asg, ch_bps = _group_arrays(
                out, idxs, channels)
            pg = native.parse_frames(arr, offsets, start_bits, sizes,
                                     ch_bps, blocksize)
            for j, i in enumerate(idxs):
                if int(pg.status[j]) in (native.FT_PARSE_ERR,
                                         native.FT_CRC16_BAD):
                    bad_i = i if bad_i is None else min(bad_i, i)
        if bad_i is None:
            return out
        f = out[bad_i]
        # re-parse with the limit extended to the end of the stream
        open_sizes = np.asarray([len(arr) - f["offset"]], np.int64)
        offsets, start_bits, _, asg, ch_bps = _group_arrays(
            out, [bad_i], f["channels"])
        pg = native.parse_frames(arr, offsets, start_bits, open_sizes,
                                 ch_bps, f["blocksize"])
        if int(pg.status[0]) not in (native.FT_OK,
                                     native.FT_EXTENT_MISMATCH):
            return out      # genuinely corrupt: leave for error handling
        true_end = (int(pg.end_bits[0]) + 7) // 8 + 2
        f = dict(f)
        f["size"] = true_end - f["offset"]
        tail = scan_frames(data if isinstance(data, (bytes, bytearray))
                           else arr.tobytes(), st, true_end)
        # keep frames before the repaired one, then the rescanned tail
        # chained onto its numbering
        nxt = (f["number"] + 1 if not f["variable"]
               else f["number"] + f["blocksize"])
        tail = [t for t in tail if t["number"] >= nxt] if tail else []
        if tail and tail[0]["number"] != nxt:
            return out
        out = out[:bad_i] + [f] + tail
        for i2, g in enumerate(out):
            end = out[i2 + 1]["offset"] if i2 + 1 < len(out) else len(arr)
            if i2 != bad_i:
                g["size"] = end - g["offset"]
        changed = True
    if changed:
        # ran out of repair rounds with repairs still pending: surface
        # it instead of silently returning a still-broken table (the
        # caller will fail strict decode; this says why)
        import warnings
        warnings.warn(
            f"repair_frame_table gave up after {max_rounds} rounds with "
            "false-sync repairs still pending; stream has pervasive "
            "in-payload sync patterns", RuntimeWarning, stacklevel=2)
    return out
