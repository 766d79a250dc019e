"""Scan-based building blocks shared by the expansion phases.

TPU-tuned replacements for patterns that are natural on GPUs but slow under
XLA-on-TPU:

  * segment_ids_from_offsets — turns an exclusive-scan offset table into
    per-slot segment ids with a scatter + cumsum (O(n) vector work) instead
    of a binary search per slot (jnp.searchsorted costs ~100ms per 500k
    queries on v5e; this costs ~1ms).
  * pack_sort_pairs / unpack — lexicographic (hi, lo) sort as a single
    int32 key sort when both fields fit in 16 bits, using the sign-bit
    flip to make signed comparison match unsigned order.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_ids_from_offsets(offsets, total_cap: int):
    """offsets: (n_seg+1,) exclusive scan. Returns (total_cap,) i32 segment
    id per slot: id[k] = the segment s with offsets[s] <= k < offsets[s+1].

    Slots beyond offsets[-1] get id >= n_seg (clamp/mask downstream).
    Empty segments are handled: several segments starting at one slot
    accumulate in the scatter-add, so the cumsum skips them correctly.
    """
    starts = jnp.minimum(offsets[:-1], total_cap)
    ind = jnp.zeros((total_cap + 1,), jnp.int32).at[starts].add(
        1, mode="drop")
    return (jnp.cumsum(ind[:-1], dtype=jnp.int32) - 1).astype(jnp.int32)


# 16-bit packed lexicographic sort keys ------------------------------------

PACK_LIMIT = 1 << 16


def can_pack(n_hi: int, n_lo: int) -> bool:
    """True when fields in [0, n_hi) x [0, n_lo) pack losslessly AND the
    all-ones sentinel (0xFFFF, 0xFFFF) stays reserved for padding."""
    return n_hi < PACK_LIMIT and n_lo < PACK_LIMIT


def pack_key(hi, lo):
    """(hi, lo) -> single int32 whose SIGNED order equals the lexicographic
    order of the unsigned fields (sign-bit flip trick)."""
    return ((hi << 16) | (lo & 0xFFFF)) ^ jnp.int32(-0x80000000)


def unpack_key(key):
    k = key ^ jnp.int32(-0x80000000)
    hi = (k >> 16) & 0xFFFF
    lo = k & 0xFFFF
    return hi, lo
