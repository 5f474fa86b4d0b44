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
"<= libFLAC size" guarantee.

Everything is pure tensor math over [..., N] residual batches: zigzag fold,
K shifted partition-sum reductions at the finest level, then log-depth
pair-merges up the tree — no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

# Sentinel cost for invalid configurations.  All cost math stays int32:
# int64 reductions/argmins trigger pathological TPU x64-rewrite compiles.
# 2^28 bits is far above any real frame (max ~2^21); sums of two sentinels
# still fit int32.
BIG = 1 << 28


def zigzag(residual):
    """Fold signed residual to unsigned: u = (r<<1) ^ (r>>31)
    (bitwriter.c:616-625).  Returned in an unsigned dtype wide enough for
    the input."""
    dt = residual.dtype
    nbits = jnp.iinfo(dt).bits
    folded = (residual << 1) ^ (residual >> (nbits - 1))
    return folded.astype(jnp.uint32 if nbits <= 32 else jnp.uint64)


def partition_cost_table(u, order, N: int, max_po: int, kmax: int,
                         plen: int = 4):
    """Dispatch: int32 fast path when magnitudes provably fit, else int64.

    The int32 path caps folded values at CAP = (2^31-1)/N so that every
    partition sum fits int32 *exactly* when uncapped; any candidate that
    hits the cap shows a cost >= CAP-1 > max verbatim bits (requires
    CAP-1 > 34*N, i.e. N <= 7936) and thus can never win — capping is
    therefore decision-safe.  The int64 path is exact everywhere and is
    used for very large blocksizes.  int64 on big tensors makes the TPU
    x64-rewrite pass explode (~30x compile time), hence this split.
    """
    if N <= 7936 and max_po <= 11:
        return _partition_cost_table_i32(u, order, N, max_po, kmax, plen)
    return _partition_cost_table_i64(u, order, N, max_po, kmax, plen)


# Per-partition cost clamp: above any winning candidate's cost (verbatim is
# at most 34*7936 < 2^19 bits) yet small enough that 2^max_po partitions of
# clamped cost still fit int32.  Clamping only affects candidates that lose
# to verbatim regardless, so decisions stay exact.
_COST_CLAMP = 1 << 19


def _partition_cost_table_i32(u, order, N: int, max_po: int, kmax: int,
                              plen: int):
    P = 1 << max_po
    m = N >> max_po
    batch = u.shape[:-1]
    cap = (2 ** 31 - 1) // N
    uc = jnp.minimum(u, jnp.uint32(cap)).astype(jnp.int32)

    uf = uc.reshape(batch + (P, m))
    fin = jnp.stack([jnp.sum(uf >> k, axis=-1) for k in range(kmax + 1)],
                    axis=-1)                       # [..., P, K] int32

    K = kmax + 1
    levels_bits = []
    levels_k = []
    order32 = order.astype(jnp.int32)

    sums = fin
    for po in range(max_po, -1, -1):
        parts = 1 << po
        n_p = jnp.full((parts,), N >> po, dtype=jnp.int32)
        n_eff = jnp.broadcast_to(n_p, batch + (parts,)).at[..., 0].add(
            -order32)
        ks = jnp.arange(K, dtype=jnp.int32)
        cost = (n_eff[..., None] * (ks + 1)
                + jnp.minimum(sums, _COST_CLAMP) + plen)
        best = jnp.minimum(jnp.min(cost, axis=-1), _COST_CLAMP)
        bk = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        total = jnp.sum(best, axis=-1)
        valid = n_eff[..., 0] > 0
        total32 = jnp.where(valid, jnp.minimum(total, BIG), BIG)
        levels_bits.append(total32)
        bk_p = jnp.pad(bk, [(0, 0)] * (bk.ndim - 1) + [(0, P - parts)])
        levels_k.append(bk_p)
        if po > 0:
            # root-level sum < 2^31 by cap construction; no overflow
            sums = sums.reshape(batch + (parts // 2, 2, K)).sum(axis=-2)

    best_bits = jnp.stack(levels_bits[::-1], axis=-1)
    best_k = jnp.stack(levels_k[::-1], axis=-2)
    return best_bits, best_k


def _partition_cost_table_i64(u, order, N: int, max_po: int, kmax: int,
                              plen: int = 4):
    """Exact Rice cost machinery over all partition orders and parameters.

    u:      [..., N] uint32 zigzag-folded residual; positions < order MUST
            be zero (they're warmup positions, excluded from coding).
    order:  [...] int32 predictor order (traced).
    max_po: static int — highest partition order to consider (blocksize
            divisibility cap already applied; per-candidate order limits
            are masked here).
    kmax:   static int — highest Rice parameter (14 for RICE, 30 for RICE2).

    Returns:
      best_bits [..., max_po+1] int64 — total residual-coding bits at each
          partition order (sum over partitions of per-partition best cost,
          each including its parameter-field bits), or BIG if invalid;
          does NOT include the 2-bit method + 4-bit order fields.
      best_k    [..., max_po+1, 2^max_po] int32 — best parameter per
          partition at each order (entries beyond 2^po unused).
    """
    P = 1 << max_po
    m = N >> max_po                       # finest partition length
    batch = u.shape[:-1]

    # finest-level sums of (u >> k) for every k: [..., P, K]
    uf = u.reshape(batch + (P, m)).astype(jnp.int64)
    sums_k = []
    for k in range(kmax + 1):
        sums_k.append(jnp.sum(uf >> k, axis=-1))
    fin = jnp.stack(sums_k, axis=-1)      # [..., P, K]

    K = kmax + 1
    levels_bits = []
    levels_k = []
    order64 = order.astype(jnp.int64)

    sums = fin
    for po in range(max_po, -1, -1):
        parts = 1 << po
        n_p = jnp.full((parts,), N >> po, dtype=jnp.int64)
        # partition 0 excludes the predictor warmup samples
        n_eff = jnp.broadcast_to(n_p, batch + (parts,)).at[..., 0].add(
            -order64)
        ks = jnp.arange(K, dtype=jnp.int64)
        # cost per (partition, k): n*(k+1) + sum(u>>k) + parameter field
        cost = n_eff[..., None] * (ks + 1) + sums + plen
        best = jnp.min(cost, axis=-1)                   # [..., parts]
        bk = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        total = jnp.sum(best, axis=-1)                  # [...]
        # validity: every partition must have more samples than... only
        # partition 0 shrinks; require n_eff[0] > 0 (the reference requires
        # partition_samples > predictor_order at the max order via
        # format.c:541-553 and > 0 here, set_partitioned_rice_:5005)
        valid = n_eff[..., 0] > 0
        total = jnp.where(valid, jnp.minimum(total, BIG), BIG)
        levels_bits.append(total.astype(jnp.int32))
        # pad best_k to P entries
        pad = P - parts
        bk_p = jnp.pad(bk, [(0, 0)] * (bk.ndim - 1) + [(0, pad)])
        levels_k.append(bk_p)
        if po > 0:
            # merge pairs for the next (coarser) level
            sums = sums.reshape(batch + (parts // 2, 2, K)).sum(axis=-2)

    # levels were built from max_po down to 0; index result by po directly
    best_bits = jnp.stack(levels_bits[::-1], axis=-1)   # [..., max_po+1]
    best_k = jnp.stack(levels_k[::-1], axis=-2)         # [..., max_po+1, P]
    return best_bits, best_k


