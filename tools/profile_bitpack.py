#!/usr/bin/env python
"""Micro-profile of assemble_frames internals on the real chip (dev tool)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from flac_tpu import EncoderConfig
from flac_tpu.encoder import _bank_for
from flac_tpu.models import stereo as stereo_mod
from flac_tpu.models import subframe as subframe_mod
from flac_tpu.models import frame as frame_mod
from flac_tpu.ops import bitpack

PRESET = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
cfg = EncoderConfig.from_preset(PRESET).resolve()
bank = _bank_for(cfg, N)

rng = np.random.default_rng(0)
t = np.arange(B * N) / 44100
sig = (20000 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 800, B * N))
pcm = np.stack([sig, 0.8 * sig]).astype(np.int32).reshape(2, B, N).transpose(1, 0, 2)
x = jax.device_put(jnp.asarray(pcm))


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit(name, fn, *args, reps=4):
    def looped(k, *a):
        first = a[0]
        def body(i, acc):
            pert = jax.tree_util.tree_map(
                lambda l: l + i.astype(l.dtype) if jnp.issubdtype(
                    l.dtype, jnp.integer) else l, first)
            return acc + _scalarize(fn(pert, *a[1:]))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    g = jax.jit(looped, static_argnums=0)
    float(np.asarray(g(1, *args)))
    t0 = time.perf_counter(); float(np.asarray(g(1, *args)))
    t1 = time.perf_counter() - t0
    float(np.asarray(g(reps + 1, *args)))
    t0 = time.perf_counter(); float(np.asarray(g(reps + 1, *args)))
    tr = time.perf_counter() - t0
    per = (tr - t1) / reps
    print(f"{name:38s} {per*1e3:9.2f} ms")
    return fn(*args)


# build the real inputs to assemble_frames
xc, bps_eff, wasted = stereo_mod.build_channel_candidates(x, cfg)
choice = subframe_mod.search_and_realize(xc, bps_eff, wasted, cfg, bank)
assignment, ch_index = stereo_mod.select_assignment(choice.bits, cfg)
choice = stereo_mod.gather_channels(choice, ch_index)
signal = stereo_mod.gather_channels(xc, ch_index)
choice = jax.device_put(choice); signal = jax.device_put(signal)
assignment = jax.device_put(assignment)
fns = jnp.arange(B, dtype=jnp.int64)

f_all = lambda ch, sig, asn: frame_mod.assemble_frames(ch, sig, asn, fns, cfg, N)
timeit("assemble_frames (all)", f_all, choice, signal, assignment)

# fields only (monkeypatch pack+crc away): time the field-list construction
import flac_tpu.models.frame as fr

def fields_only(ch, sig, asn):
    # replicate assemble up to the concatenate by calling internals
    out = frame_mod.assemble_frames(ch, sig, asn, fns, cfg, N)
    return out
# instead: time pack_fields / crc16 on realistic shapes directly
S = 4 + 7 + 2 + 2 + 2 * (3 + 32 + 1 + 32 + 1 + 2 * N)
W = 8192
print(f"fields S = {S}, words W = {W}")
nz = jnp.zeros((B, S), jnp.int32)
pay = jnp.ones((B, S), jnp.uint32)
pb = jnp.full((B, S), 1, jnp.int32)
nz = jax.device_put(nz); pay = jax.device_put(pay); pb = jax.device_put(pb)

f_pack = lambda a, b, c: bitpack.pack_fields(a, b, c, W)
words, total_bits = timeit("pack_fields (scatter)", f_pack, nz, pay, pb)
words = jax.device_put(words)
blen = jnp.full((B,), 11000, jnp.int32)

f_crc16 = lambda w, l: bitpack.crc16_words(w, l)
timeit("crc16_words", f_crc16, words, blen)

f_w2b = lambda w: bitpack.words_to_bytes(w[:, :4])
timeit("words_to_bytes[:, :4]", f_w2b, words)

f_dep = lambda w: bitpack.deposit_byte(w, blen, jnp.full((B,), 7, jnp.uint32))
timeit("deposit_byte", f_dep, words)

# cumsum part of pack alone
def cumsum_only(a, b, c):
    nbits = a + c
    end = jnp.cumsum(nbits, axis=1, dtype=jnp.int32)
    return end
timeit("  pack: cumsum only", cumsum_only, nz, pay, pb)

# scatter part alone (fixed offsets)
end = jnp.cumsum(nz + pb, axis=1, dtype=jnp.int32)
pos = jax.device_put(end - pb)
def scatter_only(p, payv, pbv):
    w = (p >> 5).astype(jnp.int32)
    sh = p & 31
    t2 = sh + pbv
    payu = payv.astype(jnp.uint32)
    hi = jnp.where(t2 <= 32, payu << jnp.clip(32 - t2, 0, 31).astype(jnp.uint32),
                   payu >> jnp.clip(t2 - 32, 0, 31).astype(jnp.uint32))
    lo = jnp.where(t2 <= 32, jnp.uint32(0),
                   payu << jnp.clip(64 - t2, 0, 31).astype(jnp.uint32))
    wordsz = jnp.zeros((B, W), jnp.uint32)
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, S))
    wordsz = wordsz.at[b_idx, w].add(hi, mode="drop")
    wordsz = wordsz.at[b_idx, w + 1].add(lo, mode="drop")
    return wordsz
timeit("  pack: scatter only", scatter_only, pos, pay, pb)
