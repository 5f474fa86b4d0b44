"""MXU bit-pack deposit: the scatter as a one-hot matmul Pallas kernel.

TPU has no hardware scatter; XLA lowers the word deposit to serialized
per-element updates (~9 ns/element, the encode pipeline's largest single
cost).  But the deposit IS a segment-sum over a monotone field->word
map — i.e. a matmul against a one-hot matrix — and the MXU eats that if
the one-hot never leaves VMEM (materializing it through HBM in plain
XLA would move ~100x the useful bytes; the kernel builds each [S, WT]
one-hot tile in VMEM and contracts it immediately).

Exactness: contributions are carry-free by construction (fields occupy
disjoint bit ranges of the stream), so per-BYTE-plane column sums stay
<= 255; four bf16 planes per contribution word accumulate in f32
(integers < 2^24: exact) and reconstruct the exact uint32 words.

The package enables jax_enable_x64 globally (frame numbers are int64),
which Mosaic's lowering rejects (i64 scalars in index maps); the
pallas_call is traced under jax.enable_x64(False) with int32-pinned
kernel scalars.

Replaces bitpack.pack_fields64 for the quad layout when a TPU backend
is live (2.4 ms vs 8.2 ms per 128-frame batch, measured); capacity is
capped at _W_PACK words per frame — longer frames flag ok=False and take
the host safe-path re-encode like any other quad misfit.

Status (round 5): RETAINED AS A VALIDATED REFERENCE KERNEL, opt-in via
FLAC_TPU_PACK=mxu.  Head-to-head on the full -8 encode the quad-layout
scatter wins (99.9 vs 94.6 MB/s device PCM) because the quad layout
already runs the deposit off the critical path; no measured field-count
regime on this hardware flips that.  The kernel's core lesson — keep
the one-hot selection in VMEM instead of streaming it through HBM —
became the design center of the DECODE-side Pallas kernel
(ops/bitunpack.py _rice_kernel), which is on by default and wins 1.8x
over its XLA form.  Interpret-mode tests keep this kernel correct so a
future hardware generation (or a wider-field format change) can
re-evaluate the crossover with one env flip.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_WT = 2048          # words per output tile (VMEM: one-hot ~11 MB bf16)
_W_PACK = 4096      # per-frame word capacity of the kernel
_FB = 8             # frames per grid cell (block sublane requirement)


def capacity_bits(max_words: int) -> int:
    return min(max_words, _W_PACK) * 32


@functools.cache
def available() -> bool:
    """True when the MXU pack kernel should be used.

    Opt-in via FLAC_TPU_PACK=mxu: head-to-head on the full -8 encode the
    quad-layout scatter already runs the deposit off the critical path
    (99.9 vs 94.6 MB/s device PCM, measured), so the scatter stays the
    default; the kernel is kept as a validated backend for field-count
    regimes where the one-hot matmul wins (and as the scatter-free path
    for future hardware where it matters more)."""
    mode = os.environ.get("FLAC_TPU_PACK", "auto")
    if mode != "mxu":
        return False
    try:
        if jax.default_backend() in ("cpu",):
            return False

        def probe(x_ref, o_ref):
            o_ref[:] = x_ref[:] * jnp.int32(2)

        with jax.enable_x64(False):
            out = pl.pallas_call(
                probe,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )(jnp.ones((8, 128), jnp.int32))
        return int(np.asarray(out)[0, 0]) == 2
    except Exception:
        return False


def _kernel(w0_ref, a_ref, o_ref, *, WT, WTP, S, FB):
    t = pl.program_id(1)
    base = t * jnp.int32(WT)
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, WTP), 1)
    for f in range(FB):
        # +2 so contributions that spill backward across the tile edge
        # (c1/c2 of a field ending in the previous tile) stay in range
        wrel = w0_ref[f, :] - base + jnp.int32(2)
        O = (iota == wrel[:, None]).astype(jnp.bfloat16)     # [S, WTP]
        R = jnp.dot(a_ref[f], O,
                    preferred_element_type=jnp.float32)      # [16, WTP]
        out = jnp.zeros((WT,), jnp.int32)
        for plane in range(4):
            s = (R[plane, 2:WT + 2] + R[4 + plane, 1:WT + 1]
                 + R[8 + plane, 0:WT])
            out = out | (s.astype(jnp.int32) << jnp.int32(8 * plane))
        o_ref[f, :] = out


def pack_fields64_mxu(nzeros, payload64, pbits, max_words: int):
    """Drop-in for bitpack.pack_fields64 (same contract) via the MXU.

    Frames whose stream exceeds capacity_bits(max_words) get arbitrary
    words — the caller must gate on total_bits (assemble_frames folds
    this into the quad ok flag).
    """
    from .bitpack import _field_contribs64

    B, S = nzeros.shape
    w0, cs, total_bits = _field_contribs64(nzeros, payload64, pbits)
    rows = [((c >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            for c in cs for p in range(4)]
    rows += [jnp.zeros_like(rows[0])] * 4
    A = jnp.stack(rows, axis=1)                       # [B, 16, S]
    w0 = w0.astype(jnp.int32)

    # pad the field axis to a sublane multiple and frames to the block
    Sp = -(-S // 16) * 16
    if Sp != S:
        w0 = jnp.pad(w0, ((0, 0), (0, Sp - S)),
                     constant_values=_W_PACK + 8)     # park out of range
        A = jnp.pad(A, ((0, 0), (0, 0), (0, Sp - S)))
    FB = _FB if B % _FB == 0 else min(B, _FB)
    Bp = -(-B // FB) * FB
    if Bp != B:
        w0 = jnp.pad(w0, ((0, Bp - B), (0, 0)))
        A = jnp.pad(A, ((0, Bp - B), (0, 0), (0, 0)))

    W = min(max_words, _W_PACK)
    wt = min(_WT, W)
    wtp = wt + 128
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, WT=wt, WTP=wtp, S=Sp, FB=FB),
            out_shape=jax.ShapeDtypeStruct((Bp, W), jnp.int32),
            grid=(Bp // FB, W // wt),
            in_specs=[
                pl.BlockSpec((FB, Sp), lambda b, t: (b, 0)),
                pl.BlockSpec((FB, 16, Sp), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((FB, wt), lambda b, t: (b, t)),
        )(w0, A)
    words = jax.lax.bitcast_convert_type(out[:B], jnp.uint32)
    if W != max_words:
        words = jnp.pad(words, ((0, 0), (0, max_words - W)))
    return words, total_bits
