"""Probe: bitonic MERGE-ONLY network vs lax.sort on chunked segments.

The binned engine's sort-path segments are concatenations of m w-wide
chunks that are each ALREADY sorted by j (chunk = a slice of one B row's
column-sorted elements).  lax.sort ignores this and pays the full
bitonic network, (log L)(log L + 1)/2 substeps; a merge-only network
(reverse odd chunks, run phases k = 2w .. L) pays only
sum_{k=log2(2w)}^{log2(L)} k substeps:

    L=128,w=64:  28 -> 7  substeps (4.0x fewer)
    L=256,w=64:  36 -> 15           (2.4x)
    L=4096,w=64: 78 -> 57           (1.4x)

Usage: python scripts/probe_merge_sort.py [R] [m] [w] [reps]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def merge_network(key, val, w):
    """Merge-only bitonic: rows of (R, L) with ascending w-runs.

    Odd runs must be PRE-REVERSED by the caller (direction rule: run c
    ascending iff c even).  Returns fully ascending rows."""
    import jax.numpy as jnp
    r, l = key.shape
    k = 2 * w
    while k <= l:
        s = k // 2
        while s >= 1:
            kk = key.reshape(r, l // (2 * s), 2, s)
            vv = val.reshape(r, l // (2 * s), 2, s)
            ka, kb = kk[:, :, 0], kk[:, :, 1]
            va, vb = vv[:, :, 0], vv[:, :, 1]
            # up iff (i & k) == 0; i & k is constant over each 2s-group
            q = np.arange(l // (2 * s)) * (2 * s)
            up = jnp.asarray((q & k) == 0)[None, :, None]
            sw = jnp.where(up, ka > kb, ka < kb)
            key = jnp.stack(
                [jnp.where(sw, kb, ka), jnp.where(sw, ka, kb)],
                axis=2).reshape(r, l)
            val = jnp.stack(
                [jnp.where(sw, vb, va), jnp.where(sw, va, vb)],
                axis=2).reshape(r, l)
            s //= 2
        k *= 2
    return key, val


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from pem_spgemm_tpu.utils.timing import force_sync
    print("devices:", jax.devices(), flush=True)

    L = m * w
    rs = np.random.default_rng(0)
    # chunk-sorted rows: sort each w-run ascending
    keys = np.sort(
        rs.integers(0, 1 << 20, (R, m, w)), axis=2).astype(np.int32)
    vals = rs.standard_normal((R, m, w)).astype(np.float32)
    keys_d = jnp.asarray(keys.reshape(R, L))
    vals_d = jnp.asarray(vals.reshape(R, L))
    # pre-reversed odd runs for the merge path
    krev = keys.copy()
    krev[:, 1::2] = krev[:, 1::2, ::-1]
    vrev = vals.copy()
    vrev[:, 1::2] = vrev[:, 1::2, ::-1]
    krev_d = jnp.asarray(krev.reshape(R, L))
    vrev_d = jnp.asarray(vrev.reshape(R, L))

    sort_fn = jax.jit(lambda k, v: lax.sort((k, v), num_keys=1,
                                            dimension=1))
    merge_fn = jax.jit(partial(merge_network, w=w))

    k0, v0 = sort_fn(keys_d, vals_d)
    k1, v1 = merge_fn(krev_d, vrev_d)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    # vals may tie-permute within equal keys; compare sums per row
    np.testing.assert_allclose(np.asarray(v0).sum(1), np.asarray(v1).sum(1),
                               rtol=1e-4, atol=1e-5)
    print(f"R={R} m={m} w={w} L={L}: merge == sort (keys exact)",
          flush=True)

    for name, fn, a, b in (("lax.sort", sort_fn, keys_d, vals_d),
                           ("merge", merge_fn, krev_d, vrev_d)):
        out = fn(a, b)
        force_sync(out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(a, b)
        force_sync(out[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        rate = R * L / (dt / 1e3) / 1e9
        print(f"{name:>10}: {dt:8.2f} ms  ({rate:.2f} Gslot/s)",
              flush=True)


if __name__ == "__main__":
    main()
