"""Probe: one-hot MXU slab routing vs per-row XLA gather.

The hypersparse takes are DMA-issue-bound (~11 ns per table-row gather).
Routing candidate: fetch ALIGNED 128-row slabs of a (NT, 2w) table (one
issue per slab) and distribute rows to product slots with an exact
one-hot einsum  (G,P,128) @ (G,128,2w)  at precision=HIGHEST (one-hot is
exactly representable; keys < 2^24 and f32 values route exactly).

Measures, pipelined (N dispatches, one sync):
  - flat per-row take of R refs          (the current fast path)
  - slab take + one-hot build + einsum   (the candidate)
  - the einsum alone (one-hot prebuilt)  (routing floor)

Shapes modeled on uniform-1M: NT=1M table rows, w=8 (2w=16 lanes),
refs about 4M sorted by row id.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from pem_spgemm_tpu.utils.timing import force_sync
    print("devices:", jax.devices())

    NT = 1 << 20
    W2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16   # lanes (2w)
    R = 4_000_000
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 128   # refs per block
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 128   # slab height
    rs = np.random.default_rng(0)

    table = jnp.asarray(rs.standard_normal((NT, W2)), jnp.float32)
    refs = np.sort(rs.integers(0, NT, R)).astype(np.int32)

    # plan: group refs by slab (id >> 7), pad each slab's refs to P,
    # splitting overfull slabs
    slab = refs // K
    local = (refs & (K - 1)).astype(np.int32)
    uniq, counts = np.unique(slab, return_counts=True)
    blocks_per_slab = -(-counts // P)
    G = int(blocks_per_slab.sum())
    block_ids = np.repeat(uniq, blocks_per_slab).astype(np.int32)
    loc = np.zeros((G, P), np.int32)
    val = np.zeros((G, P), np.float32)
    msk = np.zeros((G, P), np.float32)
    # fill: walk refs slab by slab
    starts = np.concatenate([[0], np.cumsum(counts)])
    bstart = np.concatenate([[0], np.cumsum(blocks_per_slab)])
    for si in range(len(uniq)):
        ref_lo, ref_hi = starts[si], starts[si + 1]
        for bi in range(blocks_per_slab[si]):
            g = bstart[si] + bi
            lo = ref_lo + bi * P
            hi = min(ref_hi, lo + P)
            n = hi - lo
            loc[g, :n] = local[lo:hi]
            val[g, :n] = 1.0
            msk[g, :n] = 1.0
    print(f"refs={R} slabs={len(uniq)} blocks={G} "
          f"(pad {G*P/R:.2f}x)")

    refs_d = jnp.asarray(refs)
    block_ids_d = jnp.asarray(block_ids)
    loc_d = jnp.asarray(loc)
    msk_d = jnp.asarray(msk)

    @jax.jit
    def flat_take(table, refs):
        return table[refs]

    @jax.jit
    def slab_route(table, block_ids, loc, msk):
        slabs = table.reshape(NT // K, K * W2)[block_ids]
        T = slabs.reshape(-1, K, W2)
        oh = (loc[:, :, None] ==
              lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
              ).astype(jnp.float32) * msk[:, :, None]
        return jnp.einsum("gpk,gkw->gpw", oh, T,
                          precision=lax.Precision.HIGHEST)

    @jax.jit
    def build_oh(loc, msk):
        return (loc[:, :, None] ==
                lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
                ).astype(jnp.float32) * msk[:, :, None]

    @jax.jit
    def route_only(table, block_ids, oh):
        slabs = table.reshape(NT // K, K * W2)[block_ids]
        T = slabs.reshape(-1, K, W2)
        return jnp.einsum("gpk,gkw->gpw", oh, T,
                          precision=lax.Precision.HIGHEST)

    @jax.jit
    def slab_route_bf16oh(table, block_ids, loc, msk):
        slabs = table.reshape(NT // K, K * W2)[block_ids]
        T = slabs.reshape(-1, K, W2)
        oh = ((loc[:, :, None] ==
               lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
               ).astype(jnp.bfloat16) * msk[:, :, None].astype(jnp.bfloat16))
        return jnp.einsum("gpk,gkw->gpw", oh, T,
                          precision=lax.Precision.HIGHEST)

    def pipe(label, fn, n=10):
        out = fn()
        force_sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        force_sync(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:>34}: {dt:8.2f} ms", flush=True)
        return out

    # exactness first
    got = np.asarray(slab_route(table, block_ids_d, loc_d, msk_d))
    want = np.asarray(flat_take(table, refs_d))
    live = msk.astype(bool)
    np.testing.assert_array_equal(got[live], want)
    print("exact: one-hot HIGHEST routing == gather, bit-for-bit")

    pipe("flat per-row take (R rows)",
         lambda: flat_take(table, refs_d))
    pipe("slab take + onehot + einsum",
         lambda: slab_route(table, block_ids_d, loc_d, msk_d))
    pipe("slab take + bf16 onehot + einsum",
         lambda: slab_route_bf16oh(table, block_ids_d, loc_d, msk_d))
    oh = build_oh(loc_d, msk_d)
    oh.block_until_ready()
    pipe("einsum only (prebuilt onehot)",
         lambda: route_only(table, block_ids_d, oh))
    pipe("onehot build only",
         lambda: build_oh(loc_d, msk_d))


if __name__ == "__main__":
    main()
