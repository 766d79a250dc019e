"""Pallas segment sort + dedup: the binned element engine's hot loop
entirely in VMEM.

`lax.sort` on TPU pays an HBM round trip per comparator substep family —
measured ~1.9 Gelem/s for batched short-row sorts (NOTES.md), i.e. ~27
effective passes for 1024-wide rows.  But one bucket row (<= 128KB)
fits VMEM comfortably, so the whole bitonic network can run on-chip:
HBM sees each slot exactly once in and once out, and the ~log2(P)^2/2
compare-exchange substeps run at VPU speed.

Each substep's partner exchange uses two lane ROLLS + selects (partner
of i at distance d under the XOR pattern is i+d on the low half and i-d
on the high half; rotation wrap-around never survives the half masks),
which Mosaic lowers natively — no gathers, no dynamic indexing.  The
dedup scan (group totals at first slots, bounded by the plan's measured
max duplicate run) rides the same VMEM residency.

Contract matches ops/binned.bucket_multiply's sort+dedup stage: keys
ascending per row (SENTINEL padding last), values with each duplicate
group's total at its first slot, first-flags.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 0x7FFFFFFF       # plain int: pallas kernels cannot capture
                            # jax-array constants
VMEM_ELEMS = 1 << 19        # target live elements per grid step


def _kernel(cols_ref, vals_ref, keys_out, vals_out, first_out,
            *, mw, p2, rounds, presorted_w=0):
    k = cols_ref[:]
    v = vals_ref[:]
    rb = k.shape[0]
    if p2 > mw:
        k = jnp.pad(k, ((0, 0), (0, p2 - mw)), constant_values=SENTINEL)
        v = jnp.pad(v, ((0, 0), (0, p2 - mw)))
    idx = jax.lax.broadcasted_iota(jnp.int32, (rb, p2), 1)

    # bitonic sort, ascending; SENTINEL padding sorts last.
    # presorted_w > 0 runs the MERGE phases only: the caller guarantees
    # every presorted_w-lane run is sorted, run c ascending iff c is
    # even (the binned engine's chunks are ascending B-row slices with
    # odd chunks lane-reversed at the take) — exactly the bitonic
    # invariant after stage log2(presorted_w), so those stages are
    # skipped.  Sentinel pad runs are constant, hence sorted either
    # way.  Cuts the substep count 1.4x (wide) .. 4x (two-chunk
    # segments).
    n_stages = int(np.log2(p2))
    first_stage = 1 + int(np.log2(presorted_w)) if presorted_w else 1
    for stage in range(first_stage, n_stages + 1):
        asc = (idx & (1 << stage)) == 0 if stage < n_stages \
            else jnp.ones_like(idx, jnp.bool_)
        for sub in reversed(range(stage)):
            d = 1 << sub
            isleft = (idx & d) == 0
            pk = jnp.where(isleft, jnp.roll(k, -d, axis=1),
                           jnp.roll(k, d, axis=1))
            pv = jnp.where(isleft, jnp.roll(v, -d, axis=1),
                           jnp.roll(v, d, axis=1))
            takemin = ~(asc ^ isleft)    # asc == isleft, as mask algebra
            # keep_self = takemin ? (k <= pk) : (k >= pk), written as
            # boolean algebra: Mosaic cannot select between 1-bit vectors
            # ("Unsupported target bitwidth for truncation")
            keep_self = (k == pk) | (takemin ^ (k > pk))
            k = jnp.where(keep_self, k, pk)
            v = jnp.where(keep_self, v, pv)

    # dedup: group totals at first slots (right-to-left Hillis-Steele
    # with segment boundaries at `last`).  Flags ride as int32 0/1:
    # Mosaic's roll/select support for 1-bit vectors is partial.
    valid = k != SENTINEL
    prev_k = jnp.roll(k, 1, axis=1)
    first = valid & ((idx == 0) | (k != prev_k))
    next_k = jnp.roll(k, -1, axis=1)
    s = v
    fl = ((idx == p2 - 1) | (k != next_k)).astype(jnp.int32)
    for r in range(rounds):
        sh = 1 << r
        if sh >= p2:
            break
        in_range = idx < p2 - sh
        s_sh = jnp.where(in_range, jnp.roll(s, -sh, axis=1), 0.0)
        f_sh = jnp.where(in_range, jnp.roll(fl, -sh, axis=1), 1)
        s = s + jnp.where(fl != 0, 0.0, s_sh)
        fl = fl | f_sh

    keys_out[:] = k[:, :mw]
    vals_out[:] = s[:, :mw]
    first_out[:] = first[:, :mw].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rounds", "interpret",
                                             "presorted_w"))
def segment_sort_dedup(cols, vals, *, rounds, interpret=False,
                       presorted_w=0):
    """(keys, vals, first) with the bucket_multiply sort+dedup contract.

    cols/vals: (R, MW); every row is one independent segment.  rounds
    bounds the dedup scan depth (ceil_log2 of the max duplicate run).
    presorted_w: run the bitonic MERGE phases only — every
    presorted_w-lane run of the input must be sorted, odd runs
    descending (see _kernel); requires mw % presorted_w == 0 and
    presorted_w a power of two.
    """
    r, mw = cols.shape
    if presorted_w:
        assert mw % presorted_w == 0 and \
            presorted_w & (presorted_w - 1) == 0, (mw, presorted_w)
    p2 = 1 << max(1, int(np.ceil(np.log2(mw))))
    rb = min(max(8, VMEM_ELEMS // p2), r)
    # pad R to a multiple of the block height
    g = -(-r // rb)
    r_pad = g * rb
    if r_pad > r:
        cols = jnp.pad(cols, ((0, r_pad - r), (0, 0)),
                       constant_values=SENTINEL)
        vals = jnp.pad(vals, ((0, r_pad - r), (0, 0)))
    kernel = functools.partial(_kernel, mw=mw, p2=p2, rounds=rounds,
                               presorted_w=presorted_w)
    keys, out_vals, first = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((rb, mw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, mw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, mw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, mw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, mw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, mw), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, mw), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, mw), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cols, vals)
    return keys[:r], out_vals[:r], first[:r].astype(jnp.bool_)
