"""Data-parallel frame sharding over a device mesh.

The reference's only parallelism is a frame-level thread pool with ordered
writeout (stream_encoder.c:3490-3614).  The TPU-native equivalent
(SURVEY.md §2.3): frames are independent by format design, so the batch
axis shards over a 1-D mesh with `jax.sharding`; XLA inserts no
collectives in the encode path at all (every frame's bytes stay on its
chip), and the ordered gather is just the host reading back the naturally
ordered output buffer.  Multi-host runs shard files/frame-ranges per host
and splice byte ranges — only tiny length metadata crosses DCN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncoderConfig
from ..encoder import encode_batch


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'frames'."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("frames",))


@functools.partial(jax.jit, static_argnames=("cfg", "blocksize", "mesh"))
def encode_batch_sharded(pcm, first_frame_number, cfg: EncoderConfig,
                         blocksize: int, mesh: Mesh):
    """encode_batch with the batch axis sharded over the mesh.

    pcm: [B, C, N] with B divisible by mesh size.  The whole pipeline is
    embarrassingly parallel over frames; sharding constraints at the
    boundary keep XLA from gathering intermediate tensors.
    """
    pcm = jax.lax.with_sharding_constraint(
        pcm, NamedSharding(mesh, P("frames", None, None)))
    out = encode_batch(pcm, first_frame_number, cfg, blocksize)
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(*(("frames",) + (None,) *
                                       (a.ndim - 1))))), out)


def encode_blocks_dp(blocks: np.ndarray, first_frame_number: int,
                     cfg: EncoderConfig, mesh: Mesh | None = None):
    """Host helper: pad the batch to the mesh size, encode sharded, return
    (words [B, W] np.uint32, byte_len [B] np.int32) for the real B."""
    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    B = blocks.shape[0]
    Bp = -(-B // n_dev) * n_dev
    if Bp != B:
        pad = np.repeat(blocks[-1:], Bp - B, axis=0)
        blocks = np.concatenate([blocks, pad], axis=0)
    out = encode_batch_sharded(jnp.asarray(blocks),
                               np.int64(first_frame_number), cfg,
                               blocks.shape[-1], mesh)
    words = np.asarray(out.words)[:B]
    lens = np.asarray(out.byte_len)[:B]
    ok = np.asarray(out.ok)[:B]
    if not ok.all():
        # quad-layout misfit on this content: splice in exact safe-layout
        # re-encodes of just the flagged frames
        words = np.array(words, copy=True)
        lens = np.array(lens, copy=True)
        for i in np.nonzero(~ok)[0]:
            i = int(i)
            pf = encode_batch(jnp.asarray(blocks[i:i + 1]),
                              np.int64(first_frame_number + i), cfg,
                              blocks.shape[-1], layout="safe")
            w = np.asarray(pf.words)[0]
            if w.shape[0] > words.shape[1]:
                words = np.pad(words,
                               ((0, 0), (0, w.shape[0] - words.shape[1])))
            words[i, :w.shape[0]] = w
            lens[i] = int(np.asarray(pf.byte_len)[0])
    return words, lens


# ---------------------------------------------------------------------------
# Data-parallel decode (restore phase sharded over the mesh)
# ---------------------------------------------------------------------------

def decode_frames_dp(data, st, frames, mesh: Mesh | None = None,
                     channels: int | None = None) -> np.ndarray:
    """Sharded batched decode of a same-shape frame list.

    Phase 1 (native bit-parse) runs on the host; phase 2 — the uniform
    LPC restore over all subframes — shards its subframe axis over the
    mesh, the decode twin of encode_blocks_dp (each frame's samples stay
    on its chip; no collectives).  Returns [C, F*N] int32 PCM,
    byte-identical to the single-device path.
    """
    import jax

    from .. import native
    from ..decoder_fast import _group_arrays, restore_and_undo, \
        _bucket_order

    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    blocksize = frames[0]["blocksize"]
    channels = channels or frames[0]["channels"]
    idxs = list(range(len(frames)))
    offsets, start_bits, sizes, asg, ch_bps = _group_arrays(
        frames, idxs, channels)
    pg = native.parse_frames(
        data if isinstance(data, np.ndarray)
        else np.frombuffer(data, np.uint8),
        offsets, start_bits, sizes, ch_bps, blocksize)
    F = len(idxs)
    Fp = -(-F // n_dev) * n_dev          # pad frames to the mesh size
    S, Sp = F * channels, Fp * channels
    pad_s = ((0, Sp - S),)
    mo = _bucket_order(int(pg.order.max(initial=0)))

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    res = np.pad(pg.res, (pad_s[0], (0, 0)))
    out = restore_and_undo(
        put(res, P("frames", None)),
        put(np.pad(pg.order, pad_s), P("frames")),
        put(np.pad(pg.shift, pad_s), P("frames")),
        put(np.pad(pg.qlp[:, :mo], (pad_s[0], (0, 0))), P("frames", None)),
        put(np.pad(pg.wasted, pad_s), P("frames")),
        put(np.pad(asg, (0, Fp - F)), P("frames")),
        blocksize=blocksize, channels=channels, max_order=mo,
        wide=pg.wide, out16=False)[0]
    sig = np.asarray(out)[:F].astype(np.int32)       # [F, C, N]
    return sig.transpose(1, 0, 2).reshape(channels, F * blocksize)
