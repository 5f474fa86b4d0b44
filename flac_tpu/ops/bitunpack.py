"""Device Rice decoder: batched on-chip bit-parse + LPC restore.

TPU-native counterpart of the reference's Rice reader + restore pair
(src/libFLAC/bitreader.c:834 read_rice_signed_block /
deduplication/bitreader_read_rice_signed_block.c clz loop, and
lpc.c:978 restore_signal) — the SURVEY §2.1 BitReader row's "Pallas
parallel bitreader: unary decode via clz on 64-bit windows".

Decomposition (the hardware boundary differs from decoder_fast's):

  host (C++, ft_tile_scan): a skip-walk finds WHERE codes live — each
    subframe's N samples split into tiles of T samples; per tile the
    host emits a start bit + a tiny segment table {skip, count, param,
    kind}.  No residual is materialized on the host: the upload is the
    COMPRESSED stream (~0.55x PCM) plus kilobytes of tables, not 1x PCM
    of parsed residuals.

  device (this module, one jit):
    1. window gather — each lane (= tile) pulls NROW aligned 16-word
       rows of the stream (row-blocked gather: ~4 ms for 32k lanes vs
       ~18 ms for a scalar gather, measured);
    2. a T-step lax.scan decodes one code per lane per step: segment
       advance, 64-bit window extraction by one-hot word selection
       (gather-free), unary via clz (+ rare while_loop for >64-bit
       runs), k-bit tail, zigzag unfold — all vectorized over lanes;
    3. lanes reshape straight to the [S, N] residual matrix (tiles are
       contiguous sample ranges: NO scatter), which feeds the same
       batched restore + stereo undo used by the fast engine.

Raw segments (escapes, verbatim, warmup, constants) share the machinery:
kind=1 decodes fixed-width signed values, width 0 synthesizes zeros.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .. import format as fmt

# segment packing (must mirror flac_native.cpp tile_run):
#   int32 = skip:16 @15 | count:8 @7 | param:6 @1 | kind:1 @0
SEG_INERT = (255 << 7) | (0 << 1) | 1      # raw width-0 x255: idle padding


# ---------------------------------------------------------------------------
# Restore + stereo undo body (shared: decoder_fast jit-wraps this too)
# ---------------------------------------------------------------------------

def restore_undo_body(res, order, shift, qlp, wasted, assignment, *,
                      blocksize: int, channels: int, max_order: int,
                      unroll: int = 16, wide: bool = False,
                      out16: bool = False, bps: int = 0):
    """Uniform batched subframe restore + stereo undo (lpc.c:978 and
    stream_decoder.c:3476-3526, one scan over all subframes).

    res: [S, N] residuals (int16/int32, int64 when wide); order/shift/
    wasted: [S]; qlp: [S, max_order]; assignment: [B] (S = B*channels).
    Returns ([B, channels, N] PCM, [B] bool out-of-range flags computed
    BEFORE any narrowing; bps=0 disables the range check).
    """
    S = res.shape[0]
    N = blocksize
    U = unroll
    NB = (N + U - 1) // U
    xdt = jnp.int64 if wide else jnp.int32
    x0 = res.astype(xdt)
    if NB * U != N:
        x0 = jnp.pad(x0, ((0, 0), (0, NB * U - N)))
    resb = x0.reshape(S, NB, U).transpose(1, 0, 2)      # [NB, S, U]
    qlp64 = [qlp[:, i].astype(jnp.int64) for i in range(max_order)]
    shift64 = shift.astype(jnp.int64)
    base_idx = jnp.arange(NB, dtype=jnp.int32) * U

    def block(hist, inp):
        resu, base = inp
        cols = list(hist)
        outs = []
        for j in range(U):
            n = base + j
            acc = jnp.zeros((S,), jnp.int64)
            for i in range(max_order):
                acc = acc + qlp64[i] * cols[i].astype(jnp.int64)
            pred = (acc >> shift64).astype(xdt)
            rj = resu[:, j]
            xn = jnp.where(n < order, rj, rj + pred)
            outs.append(xn)
            if max_order:
                cols = [xn] + cols[:-1]
        return tuple(cols), jnp.stack(outs, axis=1)

    hist0 = tuple(jnp.zeros((S,), xdt) for _ in range(max_order))
    _, xs = jax.lax.scan(block, hist0, (resb, base_idx))
    x = xs.transpose(1, 0, 2).reshape(S, NB * U)[:, :N]
    x = x << wasted[:, None].astype(xdt)

    sig = x.reshape(-1, channels, N)
    if channels == 2:
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
        sig = jnp.stack([left, right], axis=1)
    if bps:
        lim = jnp.asarray(1 << (bps - 1), sig.dtype)
        oor = jnp.any((sig < -lim) | (sig >= lim), axis=(1, 2))
    else:
        oor = jnp.zeros((sig.shape[0],), bool)
    if out16:
        return sig.astype(jnp.int16), oor
    return (sig if wide else sig.astype(jnp.int32)), oor


# ---------------------------------------------------------------------------
# On-chip Rice/raw code decode
# ---------------------------------------------------------------------------

def _extractor(win):
    """Build a gather-free 64-bit window extractor over win [L, W] uint32.

    Returns extract(cur [L] int32 bit offsets) -> (hi, lo) uint32 pair
    holding bits [cur, cur+64) MSB-first.  Word selection is one-hot
    multiply-reduce (the VPU chews through it; a per-lane gather would
    serialize), and all math stays in uint32 — the TPU emulates 64-bit
    integers as u32 pairs, which doubled the kernel cost (measured)."""
    wi = jnp.arange(win.shape[1], dtype=jnp.int32)[None, :]

    def extract(cur):
        w = (cur >> 5)[:, None]
        w0 = jnp.sum(jnp.where(wi == w, win, 0), axis=1, dtype=jnp.uint32)
        w1 = jnp.sum(jnp.where(wi == w + 1, win, 0), axis=1,
                     dtype=jnp.uint32)
        w2 = jnp.sum(jnp.where(wi == w + 2, win, 0), axis=1,
                     dtype=jnp.uint32)
        off = (cur & 31).astype(jnp.uint32)
        sh2 = (jnp.uint32(32) - off) & jnp.uint32(31)   # safe when off==0
        pos = off > 0
        hi = jnp.where(pos, (w0 << off) | (w1 >> sh2), w0)
        lo = jnp.where(pos, (w1 << off) | (w2 >> sh2), w1)
        return hi, lo

    return extract


def _clz64(hi, lo):
    """Count leading zeros of the (hi, lo) u32 pair (0..64)."""
    return jnp.where(hi != 0, jax.lax.clz(hi).astype(jnp.int32),
                     32 + jax.lax.clz(lo).astype(jnp.int32))


# ---------------------------------------------------------------------------
# Pallas backend for the code scan: windows live in VMEM
# ---------------------------------------------------------------------------
#
# The XLA scan re-reads every lane's [W]-word window from HBM at each of
# the ~3 extractions per code (measured: one extraction ~20 ms/128 codes
# at 65k lanes — pure HBM traffic; the arithmetic is ~2 ms).  The Pallas
# kernel loads each lane block's windows into VMEM ONCE and runs the
# whole T-code loop against them — the decode twin of the MXU pack
# kernel's "one-hot stays in VMEM" move (ops/pack_pallas.py).

_BL = 256           # lanes per grid cell ([BL, W] u32 window <= 128 KiB)


@functools.cache
def rice_pallas_available() -> bool:
    """Probe: Pallas + the ops this kernel needs (clz, u32 shifts) lower
    on this backend.  FLAC_TPU_RICE=xla forces the XLA scan."""
    if os.environ.get("FLAC_TPU_RICE", "auto") == "xla":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
        import numpy as np
        from jax.experimental import pallas as pl

        def probe(x_ref, o_ref):
            v = x_ref[:].astype(jnp.uint32)
            o_ref[:] = (jax.lax.clz(v) + (v >> (v & jnp.uint32(7)))) \
                .astype(jnp.int32)

        with jax.enable_x64(False):
            out = pl.pallas_call(
                probe,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )(jnp.full((8, 128), 16, jnp.int32))
        return int(np.asarray(out)[0, 0]) == 27 + 16
    except Exception:
        return False


def _rice_kernel(win_ref, ls_ref, *refs, T: int, W: int, SEG: int,
                 BL: int):
    # Mosaic layout rules shape this kernel (every one found by compile
    # error on real hardware):
    #   - lanes-last everywhere ([*, BL] with BL on the vector lane
    #     axis); the 1-D lanes-first form hits relayout errors;
    #   - sublane broadcast of a [1, BL] row goes through pltpu.repeat;
    #   - the per-lane segment table CANNOT be indexed (any [1, BL] row
    #     extracted from a taller ref inside the loop trips an
    #     unsupported {0,0}->{*,*} relayout) — so the segments ride the
    #     loop CARRY as a register queue popped on advance, and each row
    #     arrives as its own (1, L)-shaped input.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    seg_refs = refs[:SEG]
    res_ref, ovf_ref = refs[SEG], refs[SEG + 1]
    win = win_ref[:]                                    # [W, BL] int32
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, BL), 0)
    max_bits = jnp.int32(W * 32)
    zero_u = jnp.zeros((1, BL), jnp.uint32)
    one = jnp.uint32(1)

    def extract(cur):
        # one-hot sums stay int32 (Mosaic lacks unsigned reductions),
        # reinterpreted to u32 after — same bits
        w = pltpu.repeat(cur >> 5, W, axis=0)           # [W, BL]
        w0 = jnp.sum(jnp.where(wi == w, win, 0), axis=0, keepdims=True,
                     dtype=jnp.int32).astype(jnp.uint32)
        w1 = jnp.sum(jnp.where(wi == w + 1, win, 0), axis=0,
                     keepdims=True, dtype=jnp.int32).astype(jnp.uint32)
        w2 = jnp.sum(jnp.where(wi == w + 2, win, 0), axis=0,
                     keepdims=True, dtype=jnp.int32).astype(jnp.uint32)
        off = (cur & 31).astype(jnp.uint32)
        sh2 = (jnp.uint32(32) - off) & jnp.uint32(31)
        pos = off > 0
        hi = jnp.where(pos, (w0 << off) | (w1 >> sh2), w0)
        lo = jnp.where(pos, (w1 << off) | (w2 >> sh2), w1)
        return hi, lo

    def code(t, state):
        cur, rem, param, kind, ovf, sq = state
        adv = rem == 0
        head = sq[0]
        cur = jnp.where(adv, cur + ((head >> 15) & 0xFFFF), cur)
        rem = jnp.where(adv, (head >> 7) & 0xFF, rem)
        param = jnp.where(adv, (head >> 1) & 0x3F, param)
        kind = jnp.where(adv, head & 1, kind)
        sq = tuple(
            jnp.where(adv,
                      sq[k + 1] if k + 1 < SEG else jnp.int32(SEG_INERT),
                      sq[k])
            for k in range(SEG))

        hi, lo = extract(cur)
        is_raw = kind == 1
        pu = param.astype(jnp.uint32)
        sh32 = jnp.where(param > 0, 32 - jnp.minimum(param, 32), 0) \
            .astype(jnp.uint32)
        pm1 = jnp.where(param > 0, param - 1, 0).astype(jnp.uint32)

        rv = jnp.where(param > 0, hi >> sh32, zero_u)
        sgn = jnp.where(param > 0, (rv >> pm1) & one, zero_u)
        sgn_term = jnp.where(param > 0, sgn << pm1, zero_u) \
            .astype(jnp.int32)
        raw_val = rv.astype(jnp.int32) - sgn_term - sgn_term

        nz0 = _clz64(hi, lo)
        hi2, lo2 = extract(cur + 64)
        nz1 = _clz64(hi2, lo2)
        more = ~is_raw & (nz0 >= 64)
        q = jnp.where(more, 64 + jnp.minimum(nz1, 64), nz0)
        cq = cur + q
        ovf = ovf | jnp.where(
            ~is_raw & ((more & (nz1 >= 64)) | (cq > max_bits)),
            jnp.int32(1), jnp.int32(0))

        thi, _ = extract(cq + 1)
        lsb = jnp.where(param > 0, thi >> sh32, zero_u)
        u = (q.astype(jnp.uint32) << pu) | lsb
        rice_val = (u >> 1).astype(jnp.int32) ^ -(u & one).astype(jnp.int32)

        val = jnp.where(is_raw, raw_val, rice_val)
        cur = jnp.where(is_raw, cur + param, cq + 1 + param)
        rem = rem - 1
        res_ref[pl.ds(t, 1), :] = val
        return cur, rem, param, kind, ovf, sq

    ls = ls_ref[:]
    z = ls ^ ls                 # zeros with a non-replicated layout
    q0 = tuple(seg_refs[k][:] for k in range(SEG))
    state = jax.lax.fori_loop(0, T, code, (ls, z, z, z, z, q0))
    ovf_ref[:] = state[4]


def _codes_pallas(win, local0, segs, *, T: int, SEG: int):
    """Run the code scan as a Pallas kernel.  win: [L, W] uint32 (W
    padded to a 128 multiple); local0: [L] int32; segs: [L, SEG].
    Returns (res [T, L] int32, ovf [L] int32)."""
    from jax.experimental import pallas as pl
    L, W = win.shape
    Lp = -(-L // _BL) * _BL
    if Lp != L:
        win = jnp.pad(win, ((0, Lp - L), (0, 0)))
        local0 = jnp.pad(local0, (0, Lp - L))
        segs = jnp.pad(segs, ((0, Lp - L), (0, 0)),
                       constant_values=SEG_INERT)
    seg_rows = [segs[:, k][None, :] for k in range(SEG)]
    with jax.enable_x64(False):
        res, ovf = pl.pallas_call(
            functools.partial(_rice_kernel, T=T, W=W, SEG=SEG, BL=_BL),
            out_shape=(jax.ShapeDtypeStruct((T, Lp), jnp.int32),
                       jax.ShapeDtypeStruct((1, Lp), jnp.int32)),
            grid=(Lp // _BL,),
            in_specs=[
                pl.BlockSpec((W, _BL), lambda i: (0, i)),
                pl.BlockSpec((1, _BL), lambda i: (0, i)),
            ] + [pl.BlockSpec((1, _BL), lambda i: (0, i))
                 for _ in range(SEG)],
            out_specs=(pl.BlockSpec((T, _BL), lambda i: (0, i)),
                       pl.BlockSpec((1, _BL), lambda i: (0, i))),
        )(jax.lax.bitcast_convert_type(win, jnp.int32).T,
          local0[None, :].astype(jnp.int32), *seg_rows)
    return res[:, :L], ovf[0, :L]


@functools.partial(
    jax.jit,
    static_argnames=("T", "NROW", "SEG", "blocksize", "channels",
                     "max_order", "unroll", "wide", "out16", "bps"))
def rice_decode_restore(words2d, lane_start, segs, order, shift, qlp,
                        wasted, assignment, *, T: int, NROW: int, SEG: int,
                        blocksize: int, channels: int, max_order: int,
                        unroll: int = 16, wide: bool = False,
                        out16: bool = False, bps: int = 0):
    """Fused device decode: Rice/raw code extraction + LPC restore +
    stereo undo, one jit.

    words2d:    [R, 16] uint32 — the stream as big-endian words in
                aligned 16-word rows (64-byte granules)
    lane_start: [L] int32 — absolute bit offset of each lane's first
                segment (L = S * ceil(N/T), S = B*channels)
    segs:       [L, SEG] int32 packed segment tables (ft_tile_scan)
    order/shift/wasted: [S]; qlp: [S, max_order]; assignment: [B]
    Returns (pcm [B, C, N], oor [B] bool, lane_ovf [L] bool).  lane_ovf
    flags lanes whose unary run overran the gather window (corrupt or
    pathological input — the caller re-decodes those frames on host).
    """
    L = lane_start.shape[0]
    S = order.shape[0]
    N = blocksize
    tiles = L // S

    # 1. window gather (row-blocked)
    base_row = lane_start >> 9                       # 512-bit granules
    ridx = base_row[:, None] + jnp.arange(NROW, dtype=jnp.int32)[None, :]
    win = words2d[ridx].reshape(L, NROW * 16)
    local0 = lane_start - (base_row << 9)            # [L] bits into window

    if not wide and rice_pallas_available():
        # VMEM-resident code scan (see _rice_kernel)
        Wp = -(-win.shape[1] // 128) * 128
        if Wp != win.shape[1]:
            win = jnp.pad(win, ((0, 0), (0, Wp - win.shape[1])))
        xs_tl, ovf_i = _codes_pallas(win, local0.astype(jnp.int32), segs,
                                     T=T, SEG=SEG)
        res = xs_tl.transpose(1, 0).reshape(S, tiles * T)[:, :N]
        pcm, oor = restore_undo_body(
            res, order, shift, qlp, wasted, assignment, blocksize=N,
            channels=channels, max_order=max_order, unroll=unroll,
            wide=wide, out16=out16, bps=bps)
        return pcm, oor, ovf_i.astype(bool)

    extract = _extractor(win)
    max_bits = jnp.int32(NROW * 512)

    si = jnp.arange(SEG, dtype=jnp.int32)[None, :]

    # 2. decode codes, UC per lane per scan step (unrolling amortizes the
    # per-step dispatch overhead, which dominates the arithmetic here —
    # same finding as the restore scan's sample unroll)
    UC = 4 if T % 4 == 0 else 1

    def code(carry):
        cur, seg_i, rem, param, kind, ovf = carry
        adv = rem == 0
        nxt = jnp.where(adv, seg_i + 1, seg_i)
        pk = jnp.sum(jnp.where(si == nxt[:, None], segs, 0), axis=1,
                     dtype=jnp.int32)
        cur = jnp.where(adv, cur + ((pk >> 15) & 0xFFFF), cur)
        rem = jnp.where(adv, (pk >> 7) & 0xFF, rem)
        param = jnp.where(adv, (pk >> 1) & 0x3F, param)
        kind = jnp.where(adv, pk & 1, kind)
        seg_i = nxt

        hi, lo = extract(cur)
        is_raw = kind == 1
        pu = param.astype(jnp.uint32)
        # shift amounts pre-clamped: XLA evaluates both where() branches
        # and out-of-range shifts are undefined
        sh32 = jnp.where(param > 0, 32 - jnp.minimum(param, 32), 0) \
            .astype(jnp.uint32)
        one = jnp.uint32(1)

        # raw value: top `param` bits, sign-extended (width 0 -> 0)
        if wide:
            w64 = (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)
            sh64 = jnp.where(param > 0, 64 - param, 0).astype(jnp.uint64)
            rv = jnp.where(param > 0, w64 >> sh64, jnp.uint64(0))
            sgn = jnp.where(
                param > 0,
                (rv >> jnp.where(param > 0, param - 1, 0)
                 .astype(jnp.uint64)) & 1, jnp.uint64(0))
            raw_val = rv.astype(jnp.int64) \
                - (sgn << param.astype(jnp.uint64)).astype(jnp.int64)
        else:
            # narrow mode: param <= 32, value fits u32
            rv = jnp.where(param > 0, hi >> sh32, jnp.uint32(0))
            sgn = jnp.where(
                param > 0,
                (rv >> jnp.where(param > 0, param - 1, 0)
                 .astype(jnp.uint32)) & one, jnp.uint32(0))
            # (sgn << param) for param == 32 overflows u32: lift the sign
            # term via int64-free trick — sgn<<param == sgn<<(param-1)<<1
            sgn_term = jnp.where(
                param > 0,
                (sgn << jnp.where(param > 0, param - 1, 0)
                 .astype(jnp.uint32)), jnp.uint32(0))
            raw_val = rv.astype(jnp.int32) - sgn_term.astype(jnp.int32) \
                - sgn_term.astype(jnp.int32)

        # unary: clz over the 64-bit window.  A second static stage covers
        # runs of 64..127 zeros; longer runs (no legal encoder output —
        # escapes cap them — but possible adversarially) flag the lane
        # for host fallback.  Static stages beat a while_loop: the loop's
        # per-step cond reduction cost ~40% of the kernel (measured).
        nz0 = _clz64(hi, lo)
        hi2, lo2 = extract(cur + 64)
        nz1 = _clz64(hi2, lo2)
        more = ~is_raw & (nz0 >= 64)
        q = jnp.where(more, 64 + jnp.minimum(nz1, 64), nz0)
        cq = cur + q
        ovf = ovf | (~is_raw & ((more & (nz1 >= 64)) | (cq > max_bits)))

        # k-bit tail after the stop bit (k <= 30 < 32)
        thi, _tlo = extract(cq + 1)
        lsb = jnp.where(param > 0, thi >> sh32, jnp.uint32(0))
        if wide:
            u = (q.astype(jnp.uint64) << param.astype(jnp.uint64)) \
                | lsb.astype(jnp.uint64)
            rice_val = (u >> 1).astype(jnp.int64) \
                ^ -(u & 1).astype(jnp.int64)
        else:
            u = (q.astype(jnp.uint32) << pu) | lsb
            rice_val = (u >> 1).astype(jnp.int32) \
                ^ -(u & one).astype(jnp.int32)

        val = jnp.where(is_raw, raw_val, rice_val)
        cur = jnp.where(is_raw, cur + param, cq + 1 + param)
        rem = rem - 1
        return (cur, seg_i, rem, param, kind, ovf), val

    def step(carry, _):
        outs = []
        for _j in range(UC):
            carry, v = code(carry)
            outs.append(v)
        return carry, jnp.stack(outs, axis=1)        # [L, UC]

    carry0 = (local0.astype(jnp.int32), jnp.full((L,), -1, jnp.int32),
              jnp.zeros((L,), jnp.int32), jnp.zeros((L,), jnp.int32),
              jnp.zeros((L,), jnp.int32), jnp.zeros((L,), bool))
    (_, _, _, _, _, lane_ovf), xs = jax.lax.scan(
        step, carry0, None, length=T // UC)          # xs: [T//UC, L, UC]

    # 3. lanes -> residual matrix (pure reshape: tiles tile the samples)
    res = xs.transpose(1, 0, 2).reshape(S, tiles * T)[:, :N]

    pcm, oor = restore_undo_body(
        res, order, shift, qlp, wasted, assignment, blocksize=N,
        channels=channels, max_order=max_order, unroll=unroll, wide=wide,
        out16=out16, bps=bps)
    return pcm, oor, lane_ovf
