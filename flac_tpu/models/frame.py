"""Frame assembly: subframe choices -> field lists -> packed FLAC frames.

This is the TPU-native replacement for the reference's per-frame sequential
framing (stream_encoder_framing.c + bitwriter.c): every frame in the batch
is described as a fixed-shape list of (nzeros, payload, pbits) fields which
ops/bitpack.py scatters into word buffers in parallel, then CRC-8/16 are
computed on-device and OR-deposited into their (zero) slots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import format as fmt
from ..config import EncoderConfig
from ..ops import bitpack, rice as rice_ops
from .subframe import SubframeChoice

_UTF8_SLOTS = 7


class PackedFrames(NamedTuple):
    words: jnp.ndarray       # [B, W] uint32 big-endian packed frames
    byte_len: jnp.ndarray    # [B] int32
    bits: jnp.ndarray        # [B] int64 diagnostic: pre-padding frame bits
    ok: jnp.ndarray          # [B] bool: packed exactly (quad layout fit);
    #                          False -> re-encode the frame via the safe
    #                          layout on the host (rare: pathological k/q)


def _utf8_fields(n):
    """Device-side FLAC UTF-8 number coding -> 7 byte fields.

    n: [B] int64 (< 2^36).  Returns (payload [B,7] uint32, pbits [B,7]).
    Mirrors bitwriter.c:832-930.
    """
    n = n.astype(jnp.int64)
    thresholds = jnp.asarray([0x80, 0x800, 0x10000, 0x200000, 0x4000000,
                              0x80000000, 0x1000000000], jnp.int64)
    L = 1 + jnp.sum(n[:, None] >= thresholds[None, :], axis=1)  # [B] 1..7
    lead_mask = jnp.asarray([0, 0, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0xFE],
                            jnp.int64)
    payloads = []
    pbits = []
    for j in range(_UTF8_SLOTS):
        sh = 6 * (L - 1 - j)
        sh = jnp.clip(sh, 0, 63)
        chunk = (n >> sh) & 0x3F
        lead_bits = jnp.clip(7 - L, 0, 7)  # payload bits in lead byte
        lead_val = lead_mask[L] | (n >> sh) & ((1 << lead_bits) - 1)
        b = jnp.where(j == 0,
                      jnp.where(L == 1, n, lead_val),
                      0x80 | chunk)
        valid = j < L
        payloads.append(jnp.where(valid, b, 0).astype(jnp.uint32))
        pbits.append(jnp.where(valid, 8, 0).astype(jnp.int32))
    return jnp.stack(payloads, 1), jnp.stack(pbits, 1), L


def assemble_frames(choice: SubframeChoice, signal, assignment,
                    frame_numbers, cfg: EncoderConfig,
                    blocksize: int, layout: str = "auto") -> PackedFrames:
    """Build and pack one batch of frames.

    choice:        SubframeChoice gathered to output channels [B, C, ...]
    signal:        [B, C, N] int32 wasted-shifted signals (verbatim payloads)
    assignment:    [B] int32 channel assignment (0..3), 0 for non-stereo
    frame_numbers: [B] int64
    blocksize:     static N for this batch (the final partial block gets its
                   own trace)
    layout:        "safe"  — one field per residual sample (always exact);
                   "quad"  — four Rice codes fused per 64-bit field
                             (2.4x fewer scatter elements, the pack-stage
                             hot path); frames whose codes don't fit 63
                             payload bits come back with ok=False and the
                             caller re-encodes them via "safe";
                   "auto"  — quad when statically eligible.
    """
    B, C, N = signal.shape
    P = choice.params.shape[-1]
    max_po_all = int(P).bit_length() - 1
    m_min_all = max(N >> max_po_all, 1)
    if layout == "auto":
        layout = "quad" if (cfg.max_subframe_bps <= 32
                            and cfg.bits_per_sample <= 26
                            and N % 4 == 0 and m_min_all % 4 == 0) \
            else "safe"
    quad = layout == "quad"

    nz_list, pay_list, pb_list = [], [], []
    fit_list = []

    pay_dtype = jnp.uint64 if quad else jnp.uint32

    def add(nzeros, payload, pbits):
        nz_list.append(nzeros.astype(jnp.int32))
        pay_list.append(payload.astype(pay_dtype))
        pb_list.append(pbits.astype(jnp.int32))

    zeros = jnp.zeros((B,), jnp.int32)

    # ---- frame header: first 4 bytes ----
    bs_code, bs_tail, bs_tail_bits = fmt.blocksize_code(blocksize)
    sr_code, sr_tail, sr_tail_bits = fmt.sample_rate_code(cfg.sample_rate)
    bps_code = fmt.bps_code(cfg.bits_per_sample)
    if C == 2:
        ch_code = jnp.where(assignment == 0, 1, 7 + assignment)
    else:
        ch_code = jnp.full((B,), C - 1, jnp.int32)
    hdr32 = ((fmt.FRAME_HEADER_SYNC << 18)  # sync(14) res(1) blocking(1)=0
             | (bs_code << 12) | (sr_code << 8)
             | (ch_code.astype(jnp.int64) << 4) | (bps_code << 1))
    add(zeros[:, None], hdr32[:, None].astype(jnp.uint32),
        jnp.full((B, 1), 32, jnp.int32))

    # ---- UTF-8 frame number ----
    u8_pay, u8_pb, u8_len = _utf8_fields(frame_numbers)
    add(jnp.zeros_like(u8_pb), u8_pay, u8_pb)

    # ---- blocksize / sample-rate tails ----
    add(zeros[:, None], jnp.full((B, 1), bs_tail, jnp.uint32),
        jnp.full((B, 1), bs_tail_bits, jnp.int32))
    add(zeros[:, None], jnp.full((B, 1), sr_tail, jnp.uint32),
        jnp.full((B, 1), sr_tail_bits, jnp.int32))

    # ---- CRC-8 slot (value deposited after packing) ----
    add(zeros[:, None], jnp.zeros((B, 1), jnp.uint32),
        jnp.full((B, 1), 8, jnp.int32))
    hdr_bytes = 4 + u8_len.astype(jnp.int32) + (bs_tail_bits // 8) \
        + (sr_tail_bits // 8)            # bytes covered by CRC-8

    # ---- per-channel subframes ----
    n_idx = jnp.arange(N, dtype=jnp.int32)
    for c in range(C):
        t = choice.type_[:, c]
        order = choice.order[:, c]
        wasted = choice.wasted[:, c]
        bps_eff = choice.bps_eff[:, c]
        prec = choice.precision[:, c]
        shift = choice.shift[:, c]
        po = choice.po[:, c]
        params = choice.params[:, c]      # [B, P]
        rice2 = choice.use_rice2[:, c]
        residual = choice.residual[:, c]  # [B, N] int32
        warm = choice.warmup[:, c]        # [B, 32]
        sig = signal[:, c]

        is_c = t == fmt.SUBFRAME_TYPE_CONSTANT
        is_v = t == fmt.SUBFRAME_TYPE_VERBATIM
        is_f = t == fmt.SUBFRAME_TYPE_FIXED
        is_l = t == fmt.SUBFRAME_TYPE_LPC
        has_res = is_f | is_l

        # subframe header byte: pad(1)+type(6)+wasted_flag(1)
        type_byte = jnp.where(
            is_c, 0x00, jnp.where(
                is_v, 0x02, jnp.where(
                    is_f, 0x10 | (order << 1), 0x40 | ((order - 1) << 1))))
        wflag = (wasted > 0).astype(jnp.int32)
        add(zeros[:, None], (type_byte | wflag)[:, None],
            jnp.full((B, 1), 8, jnp.int32))
        # wasted unary: (w-1) zeros + stop bit
        add(jnp.maximum(wasted - 1, 0)[:, None],
            wflag[:, None].astype(jnp.uint32),
            wflag[:, None])

        # warmup samples (bps_eff bits each) / constant value — warmup
        # precedes the LPC precision/shift/coefficient fields in the spec.
        # In the 33-bit-side config (bps=32 mid-side) a warmup sample can
        # need 33 bits, beyond the packer's 32-bit payload: split into a
        # (high, low-16) field pair (stream_encoder.c:152 33-bit side).
        wide = cfg.max_subframe_bps > 32
        j_idx = jnp.arange(fmt.MAX_LPC_ORDER, dtype=jnp.int32)
        wmask = (jnp.int64(1) << bps_eff.astype(jnp.int64)) - 1
        wm64 = warm.astype(jnp.int64) & wmask[:, None]
        w_active = (has_res[:, None] & (j_idx < order[:, None])) \
            | (is_c[:, None] & (j_idx == 0))
        if wide:
            hi_bits = jnp.clip(bps_eff - 16, 0, 17)[:, None]
            lo_bits = jnp.minimum(bps_eff, 16)[:, None]
            w_hi = (wm64 >> 16).astype(jnp.uint32)
            w_lo = (wm64 & 0xFFFF).astype(jnp.uint32)
            pair_pay = jnp.stack([w_hi, w_lo], axis=-1)
            pair_pb = jnp.stack(
                [jnp.where(w_active, jnp.broadcast_to(
                    hi_bits, w_active.shape), 0),
                 jnp.where(w_active, jnp.broadcast_to(
                     lo_bits, w_active.shape), 0)], axis=-1)
            M2 = 2 * fmt.MAX_LPC_ORDER
            add(jnp.zeros((B, M2), jnp.int32), pair_pay.reshape(B, M2),
                pair_pb.reshape(B, M2))
        else:
            wpay = wm64.astype(jnp.uint32)
            wpb = jnp.where(w_active, bps_eff[:, None], 0)
            add(jnp.zeros_like(wpb), wpay, wpb)

        # LPC precision-1 (4 bits) + shift (5 bits)
        add(zeros[:, None],
            (((prec - 1) << 5) | shift)[:, None].astype(jnp.uint32),
            jnp.where(is_l, 9, 0)[:, None].astype(jnp.int32))

        # LPC coefficients (prec bits each, signed two's complement)
        cmask = (jnp.int64(1) << prec) - 1
        qpay = (choice.qcoeffs[:, c].astype(jnp.int64)
                & cmask[:, None]).astype(jnp.uint32)
        cpb = jnp.where(is_l[:, None] & (j_idx < order[:, None]),
                        prec[:, None], 0)
        add(jnp.zeros_like(cpb), qpay, cpb)

        # residual method (2) + partition order (4)
        add(zeros[:, None],
            ((rice2.astype(jnp.uint32) << 4) | po.astype(jnp.uint32))[:, None],
            jnp.where(has_res, 6, 0)[:, None].astype(jnp.int32))

        # samples: Rice codes (fixed/lpc) or raw (verbatim).
        u = rice_ops.zigzag(residual)                     # [B, N] uint32
        m = (N >> po)[:, None]                            # partition length
        # per-sample parameter: params repeated m times.  Expanded per
        # static partition order and selected — per-row gathers lower to
        # serialized dynamic slices on TPU, masked selects stay vector.
        max_po_here = int(params.shape[-1]).bit_length() - 1
        k_n = jnp.broadcast_to(params[:, :1], (B, N))
        for p_o in range(max_po_here + 1):
            parts_o = 1 << p_o
            if N % parts_o:
                continue
            expand = jnp.repeat(params[:, :parts_o], N // parts_o, axis=1)
            k_n = jnp.where(po[:, None] == p_o, expand, k_n)
        # escaped partitions (k sentinel >= ESCAPE_K_BASE): raw n-bit
        # signed residuals instead of rice codes (decoder at
        # stream_decoder.c:3338-3352)
        esc_n = k_n >= rice_ops.ESCAPE_K_BASE
        rawb_n = jnp.where(esc_n, k_n - rice_ops.ESCAPE_K_BASE, 0)
        k_s = jnp.where(esc_n, 0, k_n).astype(jnp.uint32)
        q = (u >> k_s).astype(jnp.int32)
        rice_pay = (jnp.uint32(1) << k_s) | (u & ((jnp.uint32(1) << k_s)
                                                  - 1))
        raw_pay = residual.astype(jnp.uint32) & \
            ((jnp.uint32(1) << jnp.clip(rawb_n, 0, 31).astype(jnp.uint32))
             - 1)
        in_res = n_idx[None, :] >= order[:, None]
        active = has_res[:, None] & in_res
        s_nz = jnp.where(active & ~esc_n, q, 0)
        if quad:
            # fused-quad layout: each field carries 4 samples' codes —
            # sample 4g's unary zeros stay free in nzeros, the rest of
            # the run (stop+LSBs, inner unary zeros) concatenates into
            # one <=63-bit payload.  Frames that don't fit are flagged.
            smask = jnp.where(bps_eff >= 32, jnp.uint32(0xFFFFFFFF),
                              (jnp.uint32(1) << jnp.clip(bps_eff, 0, 31)
                               .astype(jnp.uint32)) - 1)[:, None]
            verb_pay = sig.astype(jnp.uint32) & smask
            pay_n = jnp.where(active,
                              jnp.where(esc_n, raw_pay, rice_pay),
                              jnp.where(is_v[:, None], verb_pay, 0))
            pb_n = jnp.where(active,
                             jnp.where(esc_n, rawb_n, k_n + 1),
                             jnp.where(is_v[:, None], bps_eff[:, None], 0))
            pre4 = s_nz.reshape(B, N // 4, 4)
            pay4 = pay_n.reshape(B, N // 4, 4).astype(jnp.uint64)
            pb4 = pb_n.reshape(B, N // 4, 4)
            pay64 = pay4[:, :, 0]
            pb64 = pb4[:, :, 0]
            for i4 in range(1, 4):
                step = pre4[:, :, i4] + pb4[:, :, i4]
                pay64 = (pay64 << jnp.clip(step, 0, 63).astype(jnp.uint64)) \
                    | pay4[:, :, i4]
                pb64 = pb64 + step
            fit_list.append(jnp.all(pb64 <= 63, axis=1))
            s_nz_q = pre4[:, :, 0]
        if wide:
            # verbatim payloads can be 33-bit: (high, low-16) slot pairs
            sig64 = sig.astype(jnp.int64) & wmask[:, None]
            v_hi = (sig64 >> 16).astype(jnp.uint32)
            v_lo = (sig64 & 0xFFFF).astype(jnp.uint32)
            s_pay = jnp.where(active, jnp.where(esc_n, raw_pay, rice_pay),
                              jnp.where(is_v[:, None], v_hi, 0))
            s_pb = jnp.where(active, jnp.where(esc_n, rawb_n, k_n + 1),
                             jnp.where(is_v[:, None],
                                       jnp.broadcast_to(hi_bits,
                                                        active.shape), 0))
            sl_pay = jnp.where(is_v[:, None], v_lo, 0)
            sl_pb = jnp.where(is_v[:, None],
                              jnp.broadcast_to(lo_bits, active.shape), 0)
        elif not quad:
            smask = jnp.where(bps_eff >= 32, jnp.uint32(0xFFFFFFFF),
                              (jnp.uint32(1) << jnp.clip(bps_eff, 0, 31)
                               .astype(jnp.uint32)) - 1)[:, None]
            verb_pay = sig.astype(jnp.uint32) & smask
            s_pay = jnp.where(active, jnp.where(esc_n, raw_pay, rice_pay),
                              jnp.where(is_v[:, None], verb_pay, 0))
            s_pb = jnp.where(active, jnp.where(esc_n, rawb_n, k_n + 1),
                             jnp.where(is_v[:, None], bps_eff[:, None], 0))

        # partition parameter prefixes.  The scatter deposit costs ~9 ns
        # per FIELD on TPU regardless of activity, so parameter slots are
        # not paired with every sample (2N fields) but placed at the only
        # positions partitions can start: partition 0's prefix precedes
        # the first coded sample (slots < order are empty, so a single
        # field before the sample array lands correctly), and starts p*m
        # (p >= 1) are always multiples of m_min = N >> max_po — one
        # static slot per m_min samples.
        plen = jnp.where(rice2, 5, 4)
        esc_mark = ((jnp.uint32(1) << plen.astype(jnp.uint32)) - 1) << 5

        def prefix_fields(kvals):
            """Parameter-prefix payload/width from sentinel-encoded k:
            normal -> (k, plen); escaped -> (1..1 marker ++ 5-bit raw
            width, plen+5)."""
            e = kvals >= rice_ops.ESCAPE_K_BASE
            raw = (kvals - rice_ops.ESCAPE_K_BASE).astype(jnp.uint32)
            pay = jnp.where(e, esc_mark[:, None] | raw,
                            kvals.astype(jnp.uint32))
            pb = jnp.where(e, plen[:, None] + 5, plen[:, None])
            return pay, pb

        p0_pay, p0_pb = prefix_fields(params[:, :1])
        add(zeros[:, None], p0_pay,
            jnp.where(has_res[:, None], p0_pb, 0))
        m_min = max(N >> max_po_here, 1)
        G = N // m_min
        g_idx = jnp.arange(G, dtype=jnp.int32)[None, :]           # [1, G]
        # group g starts a partition iff g is a multiple of m/m_min
        # = 2^(max_po - po) (a power of two even when N is not)
        ratio = ((1 << max_po_here) >> po)[:, None]               # [B, 1]
        b_active = has_res[:, None] & (g_idx > 0) & \
            ((g_idx & (ratio - 1)) == 0)
        b_pay, b_pb_all = prefix_fields(k_n[:, ::m_min])          # [B, G]
        b_pb = jnp.where(b_active, b_pb_all, 0)
        if wide:
            # (main, low) pair per sample so 33-bit verbatim fits
            sm_nz = jnp.stack([s_nz, jnp.zeros_like(s_nz)], axis=-1)
            sm_pay = jnp.stack([s_pay, sl_pay], axis=-1)
            sm_pb = jnp.stack([s_pb, sl_pb], axis=-1)
            per = 2 * m_min
            s_nz_g = sm_nz.reshape(B, G, per)
            s_pay_g = sm_pay.reshape(B, G, per)
            s_pb_g = sm_pb.reshape(B, G, per)
        elif quad:
            per = m_min // 4
            s_nz_g = s_nz_q.reshape(B, G, per)
            s_pay_g = pay64.reshape(B, G, per)
            s_pb_g = pb64.reshape(B, G, per)
        else:
            per = m_min
            s_nz_g = s_nz.reshape(B, G, per)
            s_pay_g = s_pay.reshape(B, G, per)
            s_pb_g = s_pb.reshape(B, G, per)
        grp_nz = jnp.concatenate(
            [jnp.zeros((B, G, 1), jnp.int32), s_nz_g], axis=2)
        grp_pay = jnp.concatenate(
            [b_pay[:, :, None].astype(s_pay_g.dtype), s_pay_g], axis=2)
        grp_pb = jnp.concatenate([b_pb[:, :, None], s_pb_g], axis=2)
        add(grp_nz.reshape(B, G * (1 + per)),
            grp_pay.reshape(B, G * (1 + per)),
            grp_pb.reshape(B, G * (1 + per)))

    # ---- byte-align padding + CRC-16 slot ----
    bits_so_far = sum(jnp.sum(nz + pb, axis=1, dtype=jnp.int32)
                      for nz, pb in zip(nz_list, pb_list))
    pad = ((-bits_so_far) % 8).astype(jnp.int32)
    add(pad[:, None], jnp.zeros((B, 1), jnp.uint32),
        jnp.zeros((B, 1), jnp.int32))
    add(zeros[:, None], jnp.zeros((B, 1), jnp.uint32),
        jnp.full((B, 1), 16, jnp.int32))

    nzeros = jnp.concatenate(nz_list, axis=1)
    payload = jnp.concatenate(pay_list, axis=1)
    pbits = jnp.concatenate(pb_list, axis=1)

    # worst case: verbatim subframes + full headers, rounded to pow2 words
    worst_bits = 64 * 8 + C * (N * (cfg.max_subframe_bps) + 16 * 8
                               + 32 * (fmt.MAX_QLP_COEFF_PRECISION + 33)
                               + P * 10)
    max_words = 1 << int(np.ceil(np.log2(worst_bits / 32 + 2)))

    if quad:
        from ..ops import pack_pallas
        if pack_pallas.available():
            words, total_bits = pack_pallas.pack_fields64_mxu(
                nzeros, payload, pbits, max_words)
            # frames beyond the kernel's word capacity take the safe path
            fit_list.append(total_bits
                            <= pack_pallas.capacity_bits(max_words) - 16)
        else:
            words, total_bits = bitpack.pack_fields64(nzeros, payload,
                                                      pbits, max_words)
    else:
        words, total_bits = bitpack.pack_fields(nzeros, payload, pbits,
                                                max_words)
    byte_len = total_bits // 8

    # CRC-8 over the header prefix, deposited as the last header byte
    hdr_bytes_view = bitpack.words_to_bytes(words[:, :4])
    crc8 = bitpack.crc8_prefix(hdr_bytes_view, hdr_bytes, 16)
    words = bitpack.deposit_byte(words, hdr_bytes, crc8)

    # CRC-16 over everything before the 2-byte CRC field
    crc16 = bitpack.crc16_words(words, byte_len - 2)
    words = bitpack.deposit_byte(words, byte_len - 2, crc16 >> 8)
    words = bitpack.deposit_byte(words, byte_len - 1, crc16 & 0xFF)

    if quad and fit_list:
        ok = fit_list[0]
        for f in fit_list[1:]:
            ok = ok & f
    else:
        ok = jnp.ones((B,), bool)
    return PackedFrames(words=words, byte_len=byte_len,
                        bits=bits_so_far, ok=ok)
