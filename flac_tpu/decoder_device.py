"""Device-engine decode pipeline: host tile scan + on-chip Rice decode.

The third decode engine (after decoder_fast's parse+restore and the
all-CPU fused path): phase 1 shrinks to a native skip-walk that finds
code boundaries (ft_tile_scan — no residuals ever materialize on the
host), the COMPRESSED stream uploads (~0.55x PCM instead of 1x PCM of
parsed residuals), and the chip runs the fused Rice-decode + LPC-restore
kernel (ops/bitunpack.py).  Reference counterpart: the read_frame_ ->
read_residual_partitioned_rice_ -> restore pipeline of
stream_decoder.c:2373-3420, transposed to frames-in-parallel.

Frames whose tiles overflow the segment table (partition order > 8 on
large blocks) or whose unary runs overrun the gather window fall back to
the fused host decoder frame-by-frame — the hot graph carries no
pathological-case branches.
"""

from __future__ import annotations

import numpy as np

from . import native
from .decoder_fast import StreamHasher, _group_arrays
from .ref_decoder import DecodedStream, FlacDecodeError

_ORDER_BUCKETS = (1, 2, 4, 8, 12, 16, 32)
_NROW_BUCKETS = (2, 3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64)
_SEG_BUCKETS = (2, 4, 6, 8)


def _bucket(v: int, buckets) -> int:
    for b in buckets:
        if v <= b:
            return b
    return buckets[-1]


def _tile_T(N: int) -> int:
    """Tile size: 128 samples (= scan length) except for tiny blocks."""
    if N >= 128:
        return 128
    t = 16
    while t < N:
        t *= 2
    return t


def _prep_batch(arr, frames, idxs, blocksize, channels):
    """Phase 1 (native skip-walk) for one batch; thread-pool friendly."""
    offsets, start_bits, sizes, asg, ch_bps = _group_arrays(
        frames, idxs, channels)
    tg = native.tile_scan(arr, offsets, start_bits, sizes, ch_bps,
                          blocksize, T=_tile_T(blocksize))
    return tg, offsets, sizes, asg


def _dispatch(arr, idxs, blocksize, channels, bps, prep):
    """Build the device upload for one batch and launch the fused kernel.
    Returns ((pcm, oor, lane_ovf) device values, tg, asg)."""
    import jax.numpy as jnp

    from .ops.bitunpack import rice_decode_restore
    tg, offsets, sizes, asg = prep
    F = len(idxs)
    T = _tile_T(blocksize)
    tiles = tg.tiles
    wide = bool(tg.wide.any())

    # stream window: 64-byte-aligned slice covering the batch's frames,
    # viewed as big-endian words in 16-word rows (+1 guard row for the
    # extractor's 2-word overread)
    base = int(offsets.min()) & ~63
    end = (int((offsets + sizes).max()) + 63) & ~63
    wb = arr[base:end]
    if len(wb) < end - base:
        wb = np.concatenate([wb, np.zeros(end - base - len(wb), np.uint8)])
    words2d = np.pad(
        np.ascontiguousarray(wb).view(">u4").astype(np.uint32)
        .reshape(-1, 16), ((0, 1), (0, 0)))
    lane_start = (tg.lane_start - base * 8).astype(np.int32)

    # window rows: tile bits + 511 alignment slack + 160 extractor
    # overread (second unary stage at cur+64 reading 3 words)
    NROW = _bucket(-(-(tg.max_tile_bits + 511 + 160) // 512),
                   _NROW_BUCKETS)
    SEGb = _bucket(tg.max_segs + 1, _SEG_BUCKETS)
    segs = tg.segs[:, :SEGb]

    # pad the subframe axis to a power of two for compile-key reuse
    Fp = max(8, 1 << (F - 1).bit_length())
    S, Sp = F * channels, Fp * channels
    L, Lp = S * tiles, Sp * tiles
    mo = _bucket(int(tg.order.max(initial=0)), _ORDER_BUCKETS)
    pad_s = (0, Sp - S)
    lane_start = np.pad(lane_start, (0, Lp - L))
    segs = np.pad(segs, ((0, Lp - L), (0, 0)),
                  constant_values=native.SEG_INERT)
    out = rice_decode_restore(
        jnp.asarray(words2d), jnp.asarray(lane_start), jnp.asarray(segs),
        jnp.asarray(np.pad(tg.order, pad_s)),
        jnp.asarray(np.pad(tg.shift, pad_s)),
        jnp.asarray(np.pad(tg.qlp[:, :mo], (pad_s, (0, 0)))),
        jnp.asarray(np.pad(tg.wasted, pad_s)),
        jnp.asarray(np.pad(asg, (0, Fp - F))),
        T=T, NROW=NROW, SEG=SEGb, blocksize=blocksize, channels=channels,
        max_order=mo, wide=wide, out16=(bps <= 16 and not wide), bps=bps)
    return out, tg, asg


def decode_frame_list_device(data, st: DecodedStream, frames: list, *,
                             verify_crc: bool = True,
                             max_batch: int = 1024,
                             on_crc_error: str = "raise",
                             pipeline_depth: int = 3,
                             md5_hasher: StreamHasher | None = None) -> list:
    """Batched device-Rice decode of an explicit frame-header list; same
    contract as decoder.decode_frame_list."""
    from concurrent.futures import ThreadPoolExecutor
    results: list[np.ndarray | None] = [None] * len(frames)
    groups: dict[tuple, list[int]] = {}
    for i, f in enumerate(frames):
        groups.setdefault((f["blocksize"], f["channels"]), []).append(i)
    arr = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data

    batches = []
    for (blocksize, channels), idxs in groups.items():
        for lo in range(0, len(idxs), max_batch):
            batches.append((blocksize, channels, idxs[lo:lo + max_batch]))

    def host_fallback(i):
        """Single-frame fused host decode (pathological/overflow lanes)."""
        f = frames[i]
        offsets, start_bits, sizes, asg, ch_bps = _group_arrays(
            frames, [i], f["channels"])
        pcm, _eb, stt = native.decode_frames_full(
            arr, offsets, start_bits, sizes, ch_bps, f["blocksize"], asg,
            check_bps=st.bits_per_sample, verify_crc=verify_crc)
        return pcm[0], int(stt[0])

    def commit(fut, tg, asg, idxs, blocksize, channels):
        F = len(idxs)
        tiles = tg.tiles
        sig_np, oor_flags, lane_ovf = fut.result()
        lane_bad = lane_ovf[:F * channels * tiles].reshape(
            F, channels * tiles).any(axis=1)
        bad: dict[int, str] = {}
        redo: list[int] = []
        for j in range(F):
            s = int(tg.status[j])
            if s == native.FT_SEG_OVERFLOW or \
                    (lane_bad[j] and s in (native.FT_OK,
                                           native.FT_EXTENT_MISMATCH)):
                redo.append(j)
                continue
            if s in (native.FT_OK, native.FT_EXTENT_MISMATCH):
                if oor_flags[j]:
                    if on_crc_error == "raise":
                        raise FlacDecodeError(
                            "decoded sample out of bps range (lost sync) "
                            f"at frame {frames[idxs[j]]['number']}")
                    bad[j] = "LOST_SYNC"
                continue
            if s == native.FT_CRC16_BAD and not verify_crc:
                continue
            label = ("FRAME_CRC_MISMATCH" if s == native.FT_CRC16_BAD
                     else "LOST_SYNC")
            if on_crc_error == "raise":
                kind = ("CRC16 mismatch" if s == native.FT_CRC16_BAD
                        else "parse failure (lost sync)")
                raise FlacDecodeError(
                    f"frame {kind} at frame {frames[idxs[j]]['number']}")
            bad[j] = label
        if sig_np.dtype != np.int32:
            sig_np = sig_np.astype(np.int32)
        redo_pcm: dict[int, np.ndarray] = {}
        for j in redo:
            pcm, stt = host_fallback(idxs[j])
            if stt in (native.FT_OK, native.FT_EXTENT_MISMATCH) or \
                    (stt == native.FT_CRC16_BAD and not verify_crc):
                redo_pcm[j] = pcm
            else:
                label = ("FRAME_CRC_MISMATCH"
                         if stt == native.FT_CRC16_BAD else "LOST_SYNC")
                if on_crc_error == "raise":
                    raise FlacDecodeError(
                        f"frame decode failure ({label}) at frame "
                        f"{frames[idxs[j]]['number']}")
                bad[j] = label
        chunk_ok = not bad
        for j, i in enumerate(idxs):
            if j in bad:
                if not hasattr(st, "errors"):
                    st.errors = []
                st.errors.append((bad[j], frames[i]["number"]))
                continue
            results[i] = redo_pcm[j] if j in redo_pcm else sig_np[j]
        if md5_hasher is not None:
            if not chunk_ok:
                md5_hasher.valid = False
            else:
                md5_hasher.add_packed(
                    [redo_pcm[j] if j in redo_pcm else sig_np[j]
                     for j in range(F)], idxs)

    prep_pool = ThreadPoolExecutor(max_workers=2)
    fetch_pool = ThreadPoolExecutor(max_workers=3)
    inflight = []
    try:
        prep_futs: dict[int, object] = {}

        def ensure_prepped(upto: int):
            for j in range(upto + 1):
                if j < len(batches) and j not in prep_futs:
                    bs_j, ch_j, idx_j = batches[j]
                    prep_futs[j] = prep_pool.submit(
                        _prep_batch, arr, frames, idx_j, bs_j, ch_j)

        for bi, (blocksize, channels, idxs) in enumerate(batches):
            ensure_prepped(bi + pipeline_depth)
            bps = st.bits_per_sample or max(frames[i]["bps"] for i in idxs)
            out, tg, asg = _dispatch(arr, idxs, blocksize, channels, bps,
                                     prep_futs.pop(bi).result())
            for dv in out:
                try:
                    dv.copy_to_host_async()
                except AttributeError:
                    pass
            fut = fetch_pool.submit(
                lambda o=out: tuple(np.asarray(v) for v in o))
            inflight.append((fut, tg, asg, idxs, blocksize, channels))
            while len(inflight) > pipeline_depth:
                commit(*inflight.pop(0))
        while inflight:
            commit(*inflight.pop(0))
    finally:
        prep_pool.shutdown(wait=False, cancel_futures=True)
        fetch_pool.shutdown(wait=False, cancel_futures=True)
    return results
