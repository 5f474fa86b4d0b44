"""Partitioned Rice coding: exact parameter + partition-order search.

TPU-native counterpart of the reference's residual entropy search
(stream_encoder.c:4701-5075).  The reference estimates the Rice parameter
from each partition's |residual| sum and merges sums bottom-up through the
partition tree.  Here we compute *exact* code lengths for every
(partition-order, partition, parameter) triple in one batched pass:

    bits(p, k) = n_p * (k + 1) + sum_{i in p} (fold(r_i) >> k)

which is the exact partitioned-Rice cost (cf. the
EXACT_RICE_BITS_CALCULATION variant, stream_encoder.c:4913-4927).  The
minimum over k per partition and over partition orders is therefore never
worse than the reference's estimate-driven choice — the foundation of the
"<= libFLAC size" guarantee — and `rice_parameter_search_dist` is subsumed
(a ±dist search around an estimate can never beat the exact optimum).

Exactness at any bit depth without int64 hot tensors: each folded value
u < 2^32 is split into 16-bit halves u = u_hi*2^16 + u_lo.  Because
u >> k == u_hi*2^(16-k) + (u_lo >> k) for k <= 16 and u >> k == u_hi >>
(k-16) for k >= 16 (both exact identities for the floor shift), every
shifted partition sum is recovered exactly from int32-safe half sums:
sum(u_lo >> k) <= N*2^16 and sum(u_hi >> t) <= N*2^16 fit int32 for any
N <= 2^15.  The halves merge up the partition tree in int32; the k-cost
combination happens in float64 on the small [..., P, K] tensors (values
< 2^45, exact in f64).  This replaces the round-1 capped-int32 fast path,
whose clamp silently mis-picked Rice parameters for >24-bit residuals.
"""

from __future__ import annotations

import jax.numpy as jnp

# Sentinel cost for invalid configurations.  Far above any real frame
# (max ~2^21 bits) and far below int32 overflow even when two sentinels
# are summed across channels.
BIG = 1 << 28


def zigzag(residual):
    """Fold signed residual to unsigned: u = (r<<1) ^ (r>>31)
    (bitwriter.c:616-625).  Returned in an unsigned dtype wide enough for
    the input."""
    dt = residual.dtype
    nbits = jnp.iinfo(dt).bits
    folded = (residual << 1) ^ (residual >> (nbits - 1))
    return folded.astype(jnp.uint32 if nbits <= 32 else jnp.uint64)


# best_k entries >= ESCAPE_K_BASE mark an escaped partition; the raw bit
# width is (entry - ESCAPE_K_BASE)
ESCAPE_K_BASE = 64


def _bit_length(x):
    """Exact bit length of uint32 values (0 for 0)."""
    import jax
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return jax.lax.population_count(x).astype(jnp.int32)


def partition_cost_table(u, order, N: int, max_po: int, kmax: int,
                         plen: int = 4, escape: bool = False):
    """Exact Rice cost over all partition orders and parameters.

    u:      [..., N] uint32 zigzag-folded residual (any magnitude up to
            2^32-1); positions < order MUST be zero (warmup positions,
            excluded from coding).
    order:  [...] int32 predictor order (traced).
    max_po: static int — highest partition order to consider.
    kmax:   static int — highest Rice parameter (14 for RICE, 30 for RICE2).
    plen:   parameter field width (4 RICE / 5 RICE2).

    Returns:
      best_bits [..., max_po+1] int32 — total residual-coding bits at each
          partition order (per-partition best cost incl. parameter-field
          bits), or BIG if invalid; excludes the 2-bit method + 4-bit
          order fields.
      best_k    [..., max_po+1, 2^max_po] int32 — best parameter per
          partition at each order (entries beyond 2^po unused).
    """
    assert N <= (1 << 15), "blocksize cap for int32-exact half sums"
    P = 1 << max_po
    m = N >> max_po                        # finest partition length
    batch = u.shape[:-1]
    K = kmax + 1

    u32 = u.astype(jnp.uint32)
    u_lo = (u32 & jnp.uint32(0xFFFF)).astype(jnp.int32)
    u_hi = (u32 >> 16).astype(jnp.int32)
    u_lo = u_lo.reshape(batch + (P, m))
    u_hi = u_hi.reshape(batch + (P, m))
    if escape:
        # raw width for an escaped partition: zigzag u < 2^n iff the
        # residual fits n-bit signed raw, so width = bit_length(max u)
        # = bit_length(OR over the partition); OR pair-merges up the tree
        import jax
        orv = jax.lax.reduce(u32.reshape(batch + (P, m)), jnp.uint32(0),
                             jax.lax.bitwise_or, (len(batch) + 1,))

    # finest-level half sums (int32-exact); one plane per needed shift.
    # ONE reduce over a broadcast [..., m, K] expression — XLA fuses the
    # shift into the reduction and reads u once total; a python loop of
    # per-k sums re-reads u every pass (measured 6 ms vs ~0 on v5e)
    ks_lo = jnp.arange(min(kmax, 16) + 1, dtype=jnp.int32)
    ks_hi = jnp.arange(max(kmax - 16, 0) + 1, dtype=jnp.int32)
    lo = jnp.sum(u_lo[..., None] >> ks_lo, axis=-2)
    hi = jnp.sum(u_hi[..., None] >> ks_hi, axis=-2)

    order_f = order.astype(jnp.float64)
    ks = jnp.arange(K, dtype=jnp.float64)
    levels_bits, levels_k = [], []

    for po in range(max_po, -1, -1):
        parts = 1 << po
        # exact shifted sums in f64 from the int32 halves
        planes = []
        for k in range(K):
            if k <= 16:
                s = (hi[..., 0].astype(jnp.float64) * float(1 << (16 - k))
                     + lo[..., k].astype(jnp.float64))
            else:
                s = hi[..., k - 16].astype(jnp.float64)
            planes.append(s)
        sums = jnp.stack(planes, axis=-1)               # [..., parts, K]

        n_p = jnp.full((parts,), N >> po, dtype=jnp.float64)
        # partition 0 excludes the predictor warmup samples
        n_eff = jnp.broadcast_to(n_p, batch + (parts,)).at[..., 0].add(
            -order_f)
        cost = n_eff[..., None] * (ks + 1) + sums + plen
        best = jnp.minimum(jnp.min(cost, axis=-1), float(BIG))
        bk = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        if escape:
            # escaped partition: plen-bit all-ones marker + 5-bit width +
            # n raw bits each (stream_encoder.c:4854-4910 precompute +
            # writer; decoder at stream_decoder.c:3338-3352)
            rawb = _bit_length(orv)
            esc_cost = (n_eff * rawb.astype(jnp.float64)
                        + plen + 5)
            use_esc = esc_cost < best
            best = jnp.minimum(best, esc_cost)
            bk = jnp.where(use_esc, ESCAPE_K_BASE + rawb, bk)
        total = jnp.sum(best, axis=-1)
        # validity: partition 0 must retain samples after warmup exclusion
        # (format.c:541-553 / set_partitioned_rice_ semantics)
        valid = n_eff[..., 0] > 0
        total32 = jnp.where(valid, jnp.minimum(total, float(BIG)),
                            float(BIG)).astype(jnp.int32)
        levels_bits.append(total32)
        bk_p = jnp.pad(bk, [(0, 0)] * (bk.ndim - 1) + [(0, P - parts)])
        levels_k.append(bk_p)
        if po > 0:
            # pair-merge the int32 half sums for the next (coarser) level;
            # max value N*2^16 <= 2^31 so no overflow at any level
            lo = lo.reshape(batch + (parts // 2, 2, lo.shape[-1])).sum(-2)
            hi = hi.reshape(batch + (parts // 2, 2, hi.shape[-1])).sum(-2)
            if escape:
                orv = orv.reshape(batch + (parts // 2, 2))
                orv = orv[..., 0] | orv[..., 1]

    best_bits = jnp.stack(levels_bits[::-1], axis=-1)   # [..., max_po+1]
    best_k = jnp.stack(levels_k[::-1], axis=-2)         # [..., max_po+1, P]
    return best_bits, best_k
