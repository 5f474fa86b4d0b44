"""Stereo decorrelation search and wasted-bits analysis.

Mirrors process_subframes_ (stream_encoder.c:3747-3971): build the four
channel candidates (left, right, mid, side), compute wasted bits per
candidate, and after the subframe search pick the channel assignment with
the smallest total.  All four candidates are evaluated unconditionally as
one batched CH axis — the TPU-native replacement for the reference's
sequential per-channel loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import format as fmt
from ..config import EncoderConfig

# channel-candidate indices on the CH axis
L, R, M, S = 0, 1, 2, 3

# per-assignment (ch0, ch1) candidate indices
# (frame_add_header channel codes: independent / left-side / right-side /
#  mid-side, stream_encoder_framing.c:320-345)
_ASSIGN_CH0 = (L, L, S, M)
_ASSIGN_CH1 = (R, S, R, S)


def wasted_bits(x):
    """Common trailing-zero count over each subframe's samples
    (get_wasted_bits_, stream_encoder.c:5077-5100): 0 when the signal is
    all-zero, else ctz of the OR of all samples."""
    acc = jax.lax.reduce(x.astype(jnp.int32), jnp.int32(0),
                         jax.lax.bitwise_or, (x.ndim - 1,))
    nz = acc != 0
    low = acc & -acc
    ctz = jax.lax.population_count(low.astype(jnp.uint32) - 1)
    return jnp.where(nz, ctz.astype(jnp.int32), 0)


def build_channel_candidates(pcm, cfg: EncoderConfig):
    """pcm [B, C, N] int32 -> candidate signals + per-candidate bps.

    For stereo with mid-side search: [B, 4, N] (L, R, M, S), bps
    [bps, bps, bps, bps+1]; otherwise the channels pass through.
    mid = (L+R)>>1 (arithmetic), side = L-R (stream_encoder.c:3823-3836).

    At bps=32 the side channel is 33-bit (integer_signal_33bit_side,
    stream_encoder.c:152,3823-3836).  Rather than paying TPU's x64
    rewrite on the hot tensors, the candidate tensor switches to f64 —
    exact for 33-bit integers — and the wasted-bit count comes from the
    wrapped int32 view (low 32 bits determine ctz unless they are all
    zero).  Residuals remain int32, gated by the exact range analysis.
    """
    B, C, N = pcm.shape
    bps = cfg.bits_per_sample
    if C == 2 and cfg.do_mid_side and cfg.max_subframe_bps > 32:
        left, right = pcm[:, 0], pcm[:, 1]
        lf = left.astype(jnp.float64)
        rf = right.astype(jnp.float64)
        mid = jnp.floor((lf + rf) / 2)            # == (L+R)>>1, exact
        side = lf - rf                            # 33-bit, exact in f64
        x = jnp.stack([lf, rf, mid, side], axis=1)
        # wasted bits: ctz over the int32 wrap; a channel whose low 32
        # bits OR to zero but holds nonzero +-2^32 values has ctz 32
        x_lo = jnp.stack([left, right, mid.astype(jnp.int32),
                          left - right], axis=1)  # int32 two's-comp wrap
        w = wasted_bits(x_lo)
        lo_zero = jax.lax.reduce(x_lo, jnp.int32(0), jax.lax.bitwise_or,
                                 (2,)) == 0
        any_nz = jnp.any(x != 0, axis=-1)
        w = jnp.where(lo_zero & any_nz, 32, w)
        from ..ops.lpc import _pow2
        x_shifted = jnp.floor(x * _pow2(-w[..., None]))
        ch_bps = jnp.asarray([bps, bps, bps, bps + 1], jnp.int32)
        return x_shifted, ch_bps[None, :] - w, w
    if C == 2 and cfg.do_mid_side:
        left = pcm[:, 0]
        right = pcm[:, 1]
        mid = (left + right) >> 1
        side = left - right
        x = jnp.stack([left, right, mid, side], axis=1)
        ch_bps = jnp.asarray([bps, bps, bps, bps + 1], jnp.int32)
    else:
        x = pcm
        ch_bps = jnp.full((C,), bps, jnp.int32)
    w = wasted_bits(x)                       # [B, CH]
    x_shifted = x >> w[..., None]
    bps_eff = ch_bps[None, :] - w
    return x_shifted, bps_eff, w


def loose_assignment(pcm, cfg: EncoderConfig):
    """Loose mid-side heuristic (stream_encoder.c:3777-3812): pick
    INDEPENDENT vs MID_SIDE per frame from first-difference abs sums,
    skipping the exact 4-way comparison.  Exact f64 sums stand in for the
    reference's int64 accumulators (values < 2^34, totals < 2^50)."""
    dL = (pcm[:, 0, 1:] - pcm[:, 0, :-1]).astype(jnp.float64)
    dR = (pcm[:, 1, 1:] - pcm[:, 1, :-1]).astype(jnp.float64)
    sum_lr = jnp.sum(jnp.abs(dL) + jnp.abs(dR), axis=-1)
    sum_ms = jnp.sum(jnp.abs(jnp.floor((dL + dR) / 2))
                     + jnp.abs(dL - dR), axis=-1)
    assignment = jnp.where(sum_lr < sum_ms, 0, 3).astype(jnp.int32)
    ch0 = jnp.where(assignment == 0, L, M).astype(jnp.int32)
    ch1 = jnp.where(assignment == 0, R, S).astype(jnp.int32)
    return assignment, jnp.stack([ch0, ch1], axis=1)


def select_assignment(bits, cfg: EncoderConfig):
    """Choose the channel assignment minimizing total bits.

    bits: [B, 4] best subframe bits per candidate (L, R, M, S).
    Returns (assignment [B] int32, ch_index [B, 2] int32) where ch_index
    maps output channel slots to candidate rows.

    Mirrors the 4-way argmin at stream_encoder.c:3944-3971.
    """
    totals = jnp.stack([
        bits[:, L] + bits[:, R],     # independent
        bits[:, L] + bits[:, S],     # left-side
        bits[:, R] + bits[:, S],     # right-side
        bits[:, M] + bits[:, S],     # mid-side
    ], axis=1)
    assignment = jnp.argmin(totals, axis=1).astype(jnp.int32)
    ch0 = jnp.zeros_like(assignment)
    ch1 = jnp.zeros_like(assignment)
    for a in range(4):
        ch0 = jnp.where(assignment == a, _ASSIGN_CH0[a], ch0)
        ch1 = jnp.where(assignment == a, _ASSIGN_CH1[a], ch1)
    ch_index = jnp.stack([ch0, ch1], axis=1)
    return assignment, ch_index


def gather_channels(choice_tree, ch_index):
    """Select the winning channel-candidates from a SubframeChoice pytree.

    choice_tree: pytree of arrays with axis 1 = CH (4 candidates)
    ch_index:    [B, C_out] int32
    Returns the same pytree with axis 1 = C_out.

    Implemented as a chain of masked selects rather than take_along_axis:
    XLA lowers per-row gathers on TPU to serialized dynamic slices (~100x
    slower than the equivalent dense select over a 4-entry axis).
    """
    def pick(a):
        idx = ch_index
        while idx.ndim < a.ndim:
            idx = idx[..., None]
        out = jnp.broadcast_to(a[:, :1], a.shape[:1] + (ch_index.shape[1],)
                               + a.shape[2:])
        for ch in range(1, a.shape[1]):
            out = jnp.where(idx == ch, a[:, ch:ch + 1], out)
        return out
    return jax.tree.map(pick, choice_tree)
