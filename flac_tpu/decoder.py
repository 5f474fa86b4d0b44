"""Batched FLAC decoder: host frame scan + device subframe decode.

TPU-native counterpart of src/libFLAC/stream_decoder.c.  The host finds
frame boundaries (byte-aligned sync + CRC-8 verified headers — the cheap,
I/O-bound part, cf. frame_sync_ stream_decoder.c:2321) and ships padded
byte buffers to the device, where all frames decode in parallel:

  - subframe headers/warmup/coefficients: fixed slot sequence with
    per-lane dynamic bit consumption (0-bit reads for absent fields),
    mirroring the encoder's field layout;
  - residuals + prediction: one `lax.scan` over samples, vectorized over
    the frame batch — Rice unary via clz on 64-bit windows, the order-p
    IIR restore carried as a 32-sample history (lpc.c:978 restore and
    bitreader.c:834 Rice reader, fused);
  - CRC-16 validation: parallel tree-fold over frame bytes.

Channels run sequentially (their bit ranges chain), frames in parallel —
the exact transpose of the reference's per-frame sequential decode.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from . import format as fmt
from .ops import bitpack
from .ops.crc import crc8 as _crc8
from .ref_decoder import (_BLOCKSIZE_TABLE, _BPS_TABLE, _SAMPLE_RATE_TABLE,
                          DecodedStream, FlacDecodeError, parse_metadata)
from .utils.bits import utf8_decode_int

_U64 = jnp.uint64
_FIXED_TAPS = np.zeros((5, 4), np.int64)
_FIXED_TAPS[1, :1] = [1]
_FIXED_TAPS[2, :2] = [2, -1]
_FIXED_TAPS[3, :3] = [3, -3, 1]
_FIXED_TAPS[4, :4] = [4, -6, 4, -1]


# ---------------------------------------------------------------------------
# Device bit-reading primitives (batched over lanes)
# ---------------------------------------------------------------------------

def _read_bits(buf, cursor, nbits):
    """Read `nbits` (<= 32, may be 0) MSB-first bits at bit offset `cursor`.

    buf:    [B, M] uint8 zero-padded frame bytes
    cursor: [B] int32 bit offsets
    nbits:  [B] int32
    Returns (value [B] uint32, new_cursor).
    """
    val, cur = _read_bits_wide(buf, cursor, nbits)
    return val.astype(jnp.uint32), cur


def _read_bits_wide(buf, cursor, nbits):
    """Like _read_bits but up to 33 bits (33-bit side-channel warmup/
    constant/verbatim fields, stream_decoder.c:3250-3293); returns int64."""
    byte0 = (cursor >> 3).astype(jnp.int32)
    bitoff = (cursor & 7).astype(jnp.int64)
    M = buf.shape[-1]
    win = jnp.zeros(cursor.shape, jnp.int64)
    for i in range(6):
        b = jnp.take_along_axis(
            buf, jnp.clip(byte0 + i, 0, M - 1)[..., None], axis=-1)[..., 0]
        win = (win << 8) | b.astype(jnp.int64)
    nb = nbits.astype(jnp.int64)
    sh = 48 - bitoff - nb
    val = (win >> sh) & ((jnp.int64(1) << nb) - 1)
    return val, cursor + nbits


def _read_unary(buf, cursor):
    """Count zero bits until the stop bit; consume through it.

    Returns (q [B] int32, new_cursor).  Uses clz over 64-bit windows; loops
    only while some lane's run crosses a window (rare).
    """
    M = buf.shape[-1]

    def window64(cur):
        byte0 = (cur >> 3).astype(jnp.int32)
        w = jnp.zeros(cur.shape, _U64)
        for i in range(8):
            b = jnp.take_along_axis(
                buf, jnp.clip(byte0 + i, 0, M - 1)[..., None],
                axis=-1)[..., 0]
            w = (w << 8) | b.astype(_U64)
        return w

    def cond(state):
        _q, _cur, done = state
        return ~jnp.all(done)

    def body(state):
        q, cur, done = state
        bitoff = (cur & 7).astype(_U64)
        w = window64(cur) << bitoff          # align: current bit at MSB
        usable = (64 - (cur & 7)).astype(jnp.int32)
        nz = jax.lax.clz(w).astype(jnp.int32)
        hit = nz < usable
        step_q = jnp.where(hit, nz, usable)
        q = jnp.where(done, q, q + step_q)
        cur = jnp.where(done, cur, cur + step_q + jnp.where(hit, 1, 0))
        done = done | hit
        return q, cur, done

    q0 = jnp.zeros_like(cursor)
    done0 = jnp.zeros(cursor.shape, bool)
    q, cur, _ = jax.lax.while_loop(cond, body, (q0, cursor, done0))
    return q, cur


# ---------------------------------------------------------------------------
# Batched frame decode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("blocksize", "channels",
                                             "max_bytes"))
def decode_frames_device(buf, start_bits, ch_bps, blocksize: int,
                         channels: int, max_bytes: int):
    """Decode subframes for a batch of same-blocksize frames.

    buf:        [B, max_bytes] uint8 (frame bytes, zero-padded)
    start_bits: [B] int32 — bit offset of the first subframe
    ch_bps:     [B, C] int32 — per-channel subframe bps (side gets +1)
    Returns (subframe signals [B, C, N] int64 (wasted bits already undone),
             end_bits [B] — cursor after the last subframe).
    """
    B = buf.shape[0]
    N = blocksize
    cursor = start_bits.astype(jnp.int32)
    outputs = []

    for c in range(channels):
        bps = ch_bps[:, c]
        # subframe header byte
        hdr, cursor = _read_bits(buf, cursor, jnp.full((B,), 8, jnp.int32))
        hdr = hdr.astype(jnp.int32)
        type6 = (hdr >> 1) & 0x3F
        wflag = hdr & 1
        wasted = jnp.zeros((B,), jnp.int32)
        q, cur2 = _read_unary(buf, cursor)
        cursor = jnp.where(wflag == 1, cur2, cursor)
        wasted = jnp.where(wflag == 1, q + 1, 0)
        ebps = bps - wasted

        is_const = type6 == 0
        is_verb = type6 == 1
        is_fixed = (type6 & 0x38) == 0x08
        is_lpc = (type6 & 0x20) != 0
        order = jnp.where(is_fixed, type6 & 0x07,
                          jnp.where(is_lpc, (type6 & 0x1F) + 1, 0))
        has_res = is_fixed | is_lpc

        def read_signed(nbits):
            nonlocal cursor
            v, cursor = _read_bits_wide(buf, cursor, nbits)
            nb = nbits.astype(jnp.int64)
            sign = (v >> jnp.maximum(nb - 1, 0)) & jnp.where(nb > 0, 1, 0)
            return v - (sign << nb)

        # constant value (reuses the warmup slot position semantics)
        const_val = read_signed(jnp.where(is_const, ebps, 0))

        # warmup samples
        warm_list = []
        for j in range(fmt.MAX_LPC_ORDER):
            nb = jnp.where(has_res & (j < order), ebps, 0)
            warm_list.append(read_signed(nb))
        warmup = jnp.stack(warm_list, axis=-1)          # [B, 32] int64

        # LPC precision/shift/coefficients
        v, cursor = _read_bits(buf, cursor, jnp.where(is_lpc, 4, 0))
        prec = v.astype(jnp.int32) + 1
        shift = read_signed(jnp.where(is_lpc, 5, 0)).astype(jnp.int32)
        qlp_list = []
        for j in range(fmt.MAX_LPC_ORDER):
            nb = jnp.where(is_lpc & (j < order), prec, 0)
            qlp_list.append(read_signed(nb))
        qlp = jnp.stack(qlp_list, axis=-1)              # [B, 32] int64

        # residual method + partition order
        v, cursor = _read_bits(buf, cursor, jnp.where(has_res, 6, 0))
        method = (v >> 4).astype(jnp.int32)
        po = (v & 0xF).astype(jnp.int32)
        plen = jnp.where(method == 1, 5, 4)
        esc = (jnp.int32(1) << plen) - 1
        m = N >> po                                      # [B]

        taps = jnp.asarray(_FIXED_TAPS)
        fixed_taps = taps[jnp.clip(order, 0, 4)]         # [B, 4]
        pred_coeffs = jnp.where(is_lpc[:, None], qlp,
                                jnp.pad(fixed_taps, ((0, 0), (0, 28))))
        pred_shift = jnp.where(is_lpc, shift, 0).astype(jnp.int64)

        n_idx = jnp.arange(N, dtype=jnp.int32)

        def sample_step(carry, n):
            cur, hist, k, rawbits = carry
            # partition boundary: read the next parameter
            at_start = (n == order) | ((n % m == 0) & (n > 0))
            do_param = has_res & at_start
            pv, cur_p = _read_bits(buf, cur, jnp.where(do_param, plen, 0))
            k_new = pv.astype(jnp.int32)
            # escape: 5-bit raw width follows
            is_esc = do_param & (k_new == esc)
            rw, cur_p = _read_bits(buf, cur_p, jnp.where(is_esc, 5, 0))
            k = jnp.where(do_param, k_new, k)
            rawbits = jnp.where(do_param,
                                jnp.where(is_esc, rw.astype(jnp.int32), -1),
                                rawbits)
            cur = cur_p
            in_res = has_res & (n >= order)
            escaped = in_res & (rawbits >= 0)
            riced = in_res & (rawbits < 0)

            # Rice code: unary q, then k LSBs
            uq, cur_u = _read_unary(buf, cur)
            cur = jnp.where(riced, cur_u, cur)
            lsb, cur_l = _read_bits(buf, cur, jnp.where(riced, k, 0))
            cur = cur_l
            u = (uq.astype(jnp.int64) << k.astype(jnp.int64)) \
                | lsb.astype(jnp.int64)
            rice_res = (u >> 1) ^ -(u & 1)

            # escaped partition: raw signed rawbits
            rv, cur = _read_bits(buf, cur, jnp.where(escaped, rawbits, 0))
            nb = rawbits.astype(jnp.int64)
            rvs = rv.astype(jnp.int64)
            raw_res = rvs - (((rvs >> jnp.maximum(nb - 1, 0)) & 1) << nb)

            res = jnp.where(escaped, raw_res, rice_res)

            # verbatim sample
            vv = jnp.where(is_verb, ebps, 0)
            vraw = read_signed_scan(buf, cur, vv)
            cur = cur + vv

            pred = jnp.sum(pred_coeffs * hist, axis=-1) >> pred_shift
            xn = jnp.where(is_const, const_val,
                  jnp.where(is_verb, vraw,
                   jnp.where(in_res, res + pred,
                             jnp.take_along_axis(
                                 warmup, jnp.minimum(n, 31)[None].repeat(
                                     B, 0)[:, None], axis=-1)[:, 0])))
            hist = jnp.concatenate([xn[:, None], hist[:, :-1]], axis=-1)
            return (cur, hist, k, rawbits), xn

        def read_signed_scan(b, cur, nbits):
            v, _ = _read_bits_wide(b, cur, nbits)
            nb = nbits.astype(jnp.int64)
            sign = (v >> jnp.maximum(nb - 1, 0)) & jnp.where(nb > 0, 1, 0)
            return v - (sign << nb)

        hist0 = jnp.zeros((B, fmt.MAX_LPC_ORDER), jnp.int64)
        carry0 = (cursor, hist0, jnp.zeros((B,), jnp.int32),
                  jnp.full((B,), -1, jnp.int32))
        (cursor, _, _, _), xs = jax.lax.scan(sample_step, carry0, n_idx)
        sig = jnp.moveaxis(xs, 0, -1)                   # [B, N] int64
        sig = sig << wasted[:, None].astype(jnp.int64)
        outputs.append(sig)

    out = jnp.stack(outputs, axis=1)                    # [B, C, N]
    return out, cursor


def _undo_stereo(sig, assignment):
    """sig [B, 2, N] int64, assignment [B] -> [B, 2, N]
    (stream_decoder.c:3476-3526)."""
    a, b = sig[:, 0], sig[:, 1]
    asg = assignment[:, None]
    left = jnp.where(asg == fmt.CHANNEL_ASSIGNMENT_LEFT_SIDE, a,
            jnp.where(asg == fmt.CHANNEL_ASSIGNMENT_RIGHT_SIDE, b + a,
             jnp.where(asg == fmt.CHANNEL_ASSIGNMENT_MID_SIDE,
                       (((a << 1) | (b & 1)) + b) >> 1, a)))
    right = jnp.where(asg == fmt.CHANNEL_ASSIGNMENT_LEFT_SIDE, a - b,
             jnp.where(asg == fmt.CHANNEL_ASSIGNMENT_RIGHT_SIDE, b,
              jnp.where(asg == fmt.CHANNEL_ASSIGNMENT_MID_SIDE,
                        (((a << 1) | (b & 1)) - b) >> 1, b)))
    return jnp.stack([left, right], axis=1)


# ---------------------------------------------------------------------------
# Host: frame table scan
# ---------------------------------------------------------------------------

def parse_frame_header(data: bytes, pos: int, st: DecodedStream):
    """Parse one byte-aligned frame header; returns dict or None."""
    try:
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            return None
        b1 = data[pos + 1]
        variable = b1 & 1
        b2 = data[pos + 2]
        bs_code, sr_code = b2 >> 4, b2 & 0xF
        b3 = data[pos + 3]
        ch_code, bps_code = b3 >> 4, (b3 >> 1) & 0x7
        if bs_code == 0 or sr_code == 15 or ch_code > 10 or (b3 & 1):
            return None
        if bps_code == 3 or (bps_code == 0 and st.bits_per_sample == 0):
            return None
        number, nb = utf8_decode_int(data, pos + 4)
        p = pos + 4 + nb
        if bs_code == 6:
            blocksize = data[p] + 1; p += 1
        elif bs_code == 7:
            blocksize = int.from_bytes(data[p:p + 2], "big") + 1; p += 2
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            sample_rate = data[p] * 1000; p += 1
        elif sr_code == 13:
            sample_rate = int.from_bytes(data[p:p + 2], "big"); p += 2
        elif sr_code == 14:
            sample_rate = int.from_bytes(data[p:p + 2], "big") * 10; p += 2
        elif sr_code == 0:
            sample_rate = st.sample_rate
        else:
            sample_rate = _SAMPLE_RATE_TABLE[sr_code]
        if _crc8(data[pos:p]) != data[p]:
            return None
        channels = ch_code + 1 if ch_code < 8 else 2
        assignment = (fmt.CHANNEL_ASSIGNMENT_INDEPENDENT if ch_code < 8
                      else ch_code - 7)
        bps = st.bits_per_sample if bps_code == 0 else _BPS_TABLE[bps_code]
        return dict(offset=pos, number=number, blocksize=blocksize,
                    sample_rate=sample_rate, channels=channels,
                    assignment=assignment, bps=bps, variable=variable,
                    header_end_bits=(p + 1) * 8)
    except (IndexError, KeyError, ValueError):
        return None


def skip_id3v2(data: bytes) -> int:
    """Byte offset past a leading ID3v2 tag, 0 if none
    (skip_id3v2_tag_, stream_decoder.c:2299-2320): 10-byte header with a
    28-bit synchsafe size."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        size = (size << 7) | (b & 0x7F)
    return min(10 + size, len(data))


def scan_frames_tolerant(data: bytes, st: DecodedStream, start: int):
    """Resyncing frame scan: accepts a mid-stream first frame and frame-
    number gaps (lost/corrupt frames), the scan-ahead equivalent of the
    reference's SEARCH_FOR_FRAME_SYNC recovery loop (stream_decoder.c:
    2321-2380, 2476-2480).

    A candidate that breaks the expected numbering chain is only accepted
    when a later CRC8-valid header continues from it (or it covers the
    stream tail) — scan-ahead confirmation replaces the reference's
    decode-then-CRC16 rejection of false sync patterns.
    """
    arr = np.frombuffer(data, np.uint8)
    cand = np.where((arr[:-1] == 0xFF) & ((arr[1:] & 0xFC) == 0xF8))[0]
    cand = cand[cand >= start]
    headers = {}

    def hdr_at(pos):
        if pos not in headers:
            headers[pos] = parse_frame_header(data, int(pos), st)
        return headers[pos]

    def next_number(h):
        return (h["number"] + 1 if not h["variable"]
                else h["number"] + h["blocksize"])

    def confirmed(pos, h):
        """A later candidate chains from h, or h plausibly reaches EOF."""
        i0 = int(np.searchsorted(cand, pos + 10))
        for q in cand[i0:i0 + 512]:
            if q > pos + (1 << 20):
                break
            h2 = hdr_at(q)
            if h2 is not None and h2["number"] == next_number(h):
                return True
        # tail frame: minimal sanity — it must fit a subframe + CRC
        return len(data) - pos >= 10 and \
            len(data) - pos < h["blocksize"] * h["channels"] * 5 + 1024

    frames = []
    expected = None
    for pos in cand:
        if frames and pos < frames[-1]["offset"] + 10:
            continue
        h = hdr_at(pos)
        if h is None:
            continue
        if expected is None or h["number"] != expected:
            in_future = (expected is None or h["number"] > expected)
            if not (in_future and confirmed(pos, h)):
                continue
        frames.append(h)
        expected = next_number(h)
    for i, f in enumerate(frames):
        end = frames[i + 1]["offset"] if i + 1 < len(frames) else len(data)
        f["size"] = end - f["offset"]
    return frames


def stream_params_from_frames(data: bytes, start: int) -> DecodedStream:
    """Bootstrap stream parameters from the first valid frame header —
    decoding streams with no STREAMINFO (stream_decoder.c:2712-2718).
    Frames must carry explicit bps and sample-rate codes."""
    st = DecodedStream()
    st.bits_per_sample = 0
    st.sample_rate = 0
    arr = np.frombuffer(data, np.uint8)
    cand = np.where((arr[:-1] == 0xFF) & ((arr[1:] & 0xFC) == 0xF8))[0]
    for pos in cand[cand >= start]:
        h = parse_frame_header(data, int(pos), st)
        if h is not None:
            st.sample_rate = h["sample_rate"]
            st.channels = h["channels"]
            st.bits_per_sample = h["bps"]
            st.total_samples = 0
            st.md5 = b"\x00" * 16
            return st
    raise FlacDecodeError("no valid frame header found in stream")


def scan_frames(data: bytes, st: DecodedStream, start: int):
    """Locate all frames via vectorized sync search + header verification.

    Returns list of header dicts with 'size' filled in.  False sync
    patterns inside frame payloads are rejected by requiring consecutive
    frame/sample numbers (the fixed-blocksize stream invariant,
    format.h:403-406).  Uses the native C++ scanner when available
    (flac_tpu/native), falling back to the Python implementation.
    """
    from . import native
    if native.AVAILABLE:
        frames = native.scan_frames(data, start, st.bits_per_sample,
                                    st.sample_rate)
        for i, f in enumerate(frames):
            end = frames[i + 1]["offset"] if i + 1 < len(frames) else len(data)
            f["size"] = end - f["offset"]
        return frames
    arr = np.frombuffer(data, np.uint8)
    cand = np.where((arr[:-1] == 0xFF) & ((arr[1:] & 0xFC) == 0xF8))[0]
    cand = cand[cand >= start]
    frames = []
    expected = None     # any first number is legal (trimmed streams)
    for pos in cand:
        if frames and pos < frames[-1]["offset"] + 10:
            continue  # 10 = minimal possible frame size (header+subframe+crc)
        hdr = parse_frame_header(data, int(pos), st)
        if hdr is None:
            continue
        want = expected if not hdr["variable"] else None
        if want is not None and hdr["number"] != want:
            continue
        if hdr["variable"]:
            # variable-blocksize: numbers are sample offsets
            if frames and hdr["number"] != frames[-1]["number"] + \
                    frames[-1]["blocksize"]:
                continue
        frames.append(hdr)
        expected = hdr["number"] + 1
    for i, f in enumerate(frames):
        end = frames[i + 1]["offset"] if i + 1 < len(frames) else len(data)
        f["size"] = end - f["offset"]
    return frames


# ---------------------------------------------------------------------------
# Top-level decode
# ---------------------------------------------------------------------------

_LINK_BW_MBPS: float | None = None


def probe_link_bandwidth() -> float:
    """Effective host<->device transfer bandwidth in MB/s, measured once
    per process (one 4 MB round trip after warm-up) and cached.  Returns
    inf on the CPU platform (host IS the device) and 0.0 when no device
    is reachable.  Override with FLAC_TPU_LINK_MBPS for deterministic
    engine-policy tests."""
    global _LINK_BW_MBPS
    if _LINK_BW_MBPS is not None:
        return _LINK_BW_MBPS
    import os
    import time
    env = os.environ.get("FLAC_TPU_LINK_MBPS")
    if env:
        _LINK_BW_MBPS = float(env)
        return _LINK_BW_MBPS
    try:
        import jax
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            _LINK_BW_MBPS = float("inf")
            return _LINK_BW_MBPS
        f = jax.jit(lambda x, s: x + s)
        buf = jax.device_put(np.zeros((4 << 20,), np.uint8))
        np.asarray(f(buf, np.uint8(1)))      # pays cold spin-up + compile
        t0 = time.perf_counter()
        np.asarray(f(buf, np.uint8(2)))
        dt = max(time.perf_counter() - t0, 1e-9)
        _LINK_BW_MBPS = (4 << 20) / dt / 1e6
    except Exception:
        _LINK_BW_MBPS = 0.0
    return _LINK_BW_MBPS


# measured all-CPU fused-decode rate per core on this class of hardware
# (PERF.md) — the engine policy's host-side wall model
_HOST_DECODE_MBPS_PER_CORE = 150.0


def _pick_engine(frames: list) -> str:
    """Route engine="auto" by a wall-clock model instead of blind device
    preference (the round-4 policy decoded 6x slower than the repo's own
    host path whenever the link was the bottleneck).

    Device decode moves ~2x PCM over the link (residuals up + PCM down);
    the host engine runs at ~_HOST_DECODE_MBPS_PER_CORE x cores.  Small
    streams always go host: jit compiles + the link's cold-start cost
    dominate any device win.
    """
    import os
    pcm_bytes = sum(f["blocksize"] * f["channels"] * 2 for f in frames)
    if pcm_bytes < (32 << 20):
        return "host"
    bw = probe_link_bandwidth()
    if bw == float("inf"):      # CPU platform: device path == host memory
        return "fast"
    cores = os.cpu_count() or 1
    host_mbps = _HOST_DECODE_MBPS_PER_CORE * min(cores, 8)
    # device engine moves ~0.55x PCM up + 1x PCM down (~1.6x total)
    return "device" if bw / 1.6 > host_mbps else "host"


def decode_frame_list(data: bytes, st: DecodedStream, frames: list,
                      *, verify_crc: bool = True,
                      max_batch: int = 1024,
                      on_crc_error: str = "raise",
                      engine: str = "auto",
                      md5_hasher=None) -> list[np.ndarray]:
    """Batched device decode of an explicit frame-header list.

    Each entry needs offset/size/assignment/bps/channels/blocksize (as
    produced by scan_frames).  Returns per-frame [C, N] int32 arrays in
    list order.  Frames are grouped by shape so each distinct
    (blocksize, channels) compiles once.

    on_crc_error: "raise" aborts on the first CRC-16 mismatch; "drop"
    leaves the bad frame's slot as None and records the frame number in
    st.errors — the resync-and-continue behavior of the reference
    (stream_decoder.c:2476-2480, error callback + SEARCH_FOR_FRAME_SYNC).

    engine: "auto" picks by a measured wall-clock model (_pick_engine):
    the fused all-CPU engine when the host<->device link would be the
    bottleneck (or the stream is small), else a device engine; "device"
    forces the on-chip Rice decoder (host tile scan + compressed-bytes
    upload + fused Rice+restore kernel, decoder_device), "fast" forces
    native bit-parse + device restore (decoder_fast), "host" the
    all-CPU path, "scan" the all-device per-sample scan (the
    correctness oracle).  Falls back to "scan" when the native library
    is unavailable.
    """
    from . import native as _native
    if engine == "auto" and _native.AVAILABLE and frames:
        engine = _pick_engine(frames)
    if engine == "device" and _native.AVAILABLE and frames:
        from .decoder_device import decode_frame_list_device
        return decode_frame_list_device(
            data, st, frames, verify_crc=verify_crc, max_batch=max_batch,
            on_crc_error=on_crc_error, md5_hasher=md5_hasher)
    if engine == "fast" and _native.AVAILABLE and frames:
        from .decoder_fast import decode_frame_list_fast
        return decode_frame_list_fast(
            data, st, frames, verify_crc=verify_crc, max_batch=max_batch,
            on_crc_error=on_crc_error)
    if engine == "host" and _native.AVAILABLE:
        from .decoder_fast import decode_frame_list_host
        return decode_frame_list_host(
            data, st, frames, verify_crc=verify_crc,
            on_crc_error=on_crc_error, md5_hasher=md5_hasher)
    results: list[np.ndarray | None] = [None] * len(frames)
    # group equal-shape frames for batched decode
    groups: dict[tuple, list[int]] = {}
    for i, f in enumerate(frames):
        groups.setdefault((f["blocksize"], f["channels"]), []).append(i)

    arr = np.frombuffer(data, np.uint8)
    for (blocksize, channels), idxs in groups.items():
        for lo in range(0, len(idxs), max_batch):
            batch = idxs[lo:lo + max_batch]
            maxlen = max(frames[i]["size"] for i in batch)
            # pad to a power-of-two word count (crc16_words tree fold)
            maxlen = 4 << max(0, int(np.ceil(np.log2(max(maxlen, 4) / 4))))
            B = len(batch)
            buf = np.zeros((B, maxlen), np.uint8)
            starts = np.zeros(B, np.int32)
            asg = np.zeros(B, np.int32)
            ch_bps = np.zeros((B, channels), np.int32)
            for j, i in enumerate(batch):
                f = frames[i]
                buf[j, :f["size"]] = arr[f["offset"]:f["offset"] + f["size"]]
                starts[j] = f["header_end_bits"] - f["offset"] * 8
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
            sig, end_bits = decode_frames_device(
                jnp.asarray(buf), jnp.asarray(starts), jnp.asarray(ch_bps),
                blocksize, channels, maxlen)
            if channels == 2:
                sig = _undo_stereo(sig, jnp.asarray(asg))
            if verify_crc:
                # the ACTUAL frame extent comes from the decode cursor
                # (last subframe end -> byte-align -> 2 CRC bytes), not the
                # scan span: a lost next-header inflates the scan span and
                # must not shift where this frame's CRC16 is read
                sizes = ((np.asarray(end_bits) + 7) // 8) + 2
                scan_sizes = np.array(
                    [frames[i]["size"] for i in batch], np.int64)
                sizes = np.minimum(sizes, scan_sizes)    # truncation guard
                stored = np.array(
                    [int.from_bytes(
                        bytes(buf[j, sizes[j] - 2:sizes[j]]), "big")
                     for j in range(B)], np.uint32)
                # mask bytes beyond each frame's CRC region before CRC
                bufm = buf.copy()
                for j in range(B):
                    bufm[j, sizes[j] - 2:] = 0
                wordsm = jnp.asarray(np.ascontiguousarray(bufm).view(">u4")
                                     .astype(np.uint32))
                got = np.asarray(bitpack.crc16_words(
                    wordsm, jnp.asarray(sizes.astype(np.int32)) - 2))
                bad = set(np.nonzero(got != stored)[0].tolist())
                if bad and on_crc_error == "raise":
                    j = min(bad)
                    raise FlacDecodeError(
                        f"frame CRC16 mismatch at frame "
                        f"{frames[batch[j]]['number']}")
            else:
                bad = set()
            sig_np = np.asarray(sig)
            # decoded-sample range check (stream_decoder.c:2458-2472): a
            # sample outside the stream's bps range means lost sync
            lim = 1 << (st.bits_per_sample - 1)
            oor = np.nonzero(np.any((sig_np < -lim) | (sig_np >= lim),
                                    axis=(1, 2)))[0]
            labels = {j: "FRAME_CRC_MISMATCH" for j in bad}
            for j in oor:
                if j in bad:
                    continue
                if on_crc_error == "raise":
                    raise FlacDecodeError(
                        "decoded sample out of bps range (lost sync) at "
                        f"frame {frames[batch[j]]['number']}")
                bad.add(int(j))
                labels[int(j)] = "LOST_SYNC"
            for j, i in enumerate(batch):
                if j in bad:
                    if not hasattr(st, "errors"):
                        st.errors = []
                    st.errors.append((labels[j], frames[i]["number"]))
                    continue
                results[i] = sig_np[j].astype(np.int32)
    return results


def decode_frames_selected(data: bytes, st: DecodedStream,
                           frames: list) -> np.ndarray:
    """Decode a contiguous frame run and concatenate (seek read path)."""
    return np.concatenate(decode_frame_list(data, st, frames), axis=1)


def decode_stream_tpu(data: bytes, *, verify_md5: bool = True,
                      verify_crc: bool = True,
                      max_batch: int = 1024,
                      tolerant: bool = False,
                      engine: str = "auto") -> DecodedStream:
    """Full stream decode with batched device subframe decoding.

    tolerant=True enables the reference's error-recovery behaviors
    (`flac -F` + stream_decoder.c resilience): leading ID3v2 skip
    (:2299), streams without a fLaC marker / STREAMINFO (:2712-2718),
    a mid-stream first frame, CRC-mismatch resync (:2476-2480), and
    silence insertion for missing frames (:2484-2520) with the same
    5-second / 50-frame repair cap.  Recovered errors are listed in
    st.errors; MD5 mismatch then marks st.md5_ok instead of raising.
    """
    head = skip_id3v2(data)
    if head and not tolerant:
        data = data[head:]
        head = 0
    if data[head:head + 4] == fmt.STREAM_SYNC_STRING:
        st, pos = parse_metadata(data, head + 4)
    elif tolerant:
        st = stream_params_from_frames(data, head)
        pos = head
    else:
        raise FlacDecodeError("missing fLaC marker")
    frames = scan_frames_tolerant(data, st, pos) if tolerant else \
        scan_frames(data, st, pos)
    st.frames = frames
    st.errors = []
    if not frames:
        st.samples = np.zeros((max(st.channels, 1), 0), np.int32)
        return st

    hasher = None
    if verify_md5 and not tolerant and st.md5 != b"\x00" * 16:
        from . import native as _native
        if _native.AVAILABLE:
            from .decoder_fast import StreamHasher
            hasher = StreamHasher(st.bits_per_sample)
    try:
        results = decode_frame_list(
            data, st, frames, verify_crc=verify_crc, max_batch=max_batch,
            on_crc_error="drop" if tolerant else "raise", engine=engine,
            md5_hasher=hasher)
    except FlacDecodeError:
        if tolerant:
            raise
        # strict-mode false-sync recovery: a payload byte pattern that
        # scans as a valid next header truncates the real frame; re-find
        # true frame extents by decode (stream_decoder.c:2443-2480's
        # decode-then-CRC16 rejection) and retry once
        from .decoder_fast import repair_frame_table
        repaired = repair_frame_table(data, st, frames)
        if repaired == frames:
            raise
        frames = st.frames = repaired
        hasher = None    # first attempt's partial hash is stale
        results = decode_frame_list(
            data, st, frames, verify_crc=verify_crc, max_batch=max_batch,
            on_crc_error="raise", engine=engine)

    if tolerant:
        st.samples = _assemble_with_concealment(st, frames, results)
    elif getattr(st, "_assembled", None) is not None:
        st.samples = st._assembled      # host engine decoded in place
        st._assembled = None
    else:
        st.samples = np.concatenate(results, axis=1) if results else \
            np.zeros((st.channels, 0), np.int32)
    if st.total_samples:
        st.samples = st.samples[:, :st.total_samples]
    st.md5_ok = True
    if verify_md5 and st.md5 != b"\x00" * 16:
        got = None
        if (hasher is not None and hasher.valid
                and hasher.nframes == len(frames)
                and (not st.total_samples or st.total_samples
                     == sum(f["blocksize"] for f in frames))):
            got = hasher.digest()    # hashed in-stream during decode
        if got is None:
            from . import native as _native
            if _native.AVAILABLE:
                h = _native.MD5()
                h.update_pcm(np.ascontiguousarray(st.samples),
                             st.bits_per_sample)
                got = h.digest()
            else:
                from .encoder import interleave_for_md5
                got = hashlib.md5(interleave_for_md5(
                    st.samples, st.bits_per_sample)).digest()
        if got != st.md5:
            if tolerant:
                st.md5_ok = False
                st.errors.append(("MD5_MISMATCH", None))
            else:
                raise FlacDecodeError("stream MD5 mismatch")
    return st


def _assemble_with_concealment(st: DecodedStream, frames: list,
                               results: list) -> np.ndarray:
    """Place decoded frames on the sample timeline; fill gaps (missing or
    CRC-dropped frames) with silence, capped like the reference at
    min(5 s, 50 frames) per gap (stream_decoder.c:2505-2520)."""
    C = frames[0]["channels"]
    rate = frames[0]["sample_rate"] or st.sample_rate
    pieces = []
    expected_start = None
    for f, sig in zip(frames, results):
        start = (f["number"] if f["variable"]
                 else f["number"] * frames[0]["blocksize"])
        if expected_start is None:
            expected_start = start
        if start > expected_start:
            gap = start - expected_start
            cap = min(5 * max(rate, 1), 50 * frames[0]["blocksize"])
            fill = min(gap, cap)
            st.errors.append(("MISSING_FRAME", expected_start))
            pieces.append(np.zeros((C, fill), np.int32))
            expected_start = start
        if sig is None:                      # CRC-dropped: conceal
            pieces.append(np.zeros((C, f["blocksize"]), np.int32))
        else:
            pieces.append(sig)
        expected_start += f["blocksize"]
    return np.concatenate(pieces, axis=1) if pieces else \
        np.zeros((C, 0), np.int32)


def decode_stream_auto(data: bytes, **kw) -> DecodedStream:
    """Container-sniffing decode: native FLAC or Ogg FLAC by magic."""
    from .ogg import decode_ogg_flac, is_ogg
    if is_ogg(data):
        kw.pop("tolerant", None)    # Ogg layer has its own CRC resync
        return decode_ogg_flac(data, **kw)
    return decode_stream_tpu(data, **kw)
