"""Hardware A/B: bucket_multiply (lax.sort) vs bucket_multiply_vmem
(Pallas merge-only bitonic) on synthetic chunk-table buckets.

Usage: python scripts/probe_vmem_merge.py [R] [m] [w] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from pem_spgemm_tpu.ops import binned
    from pem_spgemm_tpu.utils.timing import force_sync
    print("devices:", jax.devices(), flush=True)

    rs = np.random.default_rng(0)
    # synthetic chunk table: NC chunks of sorted keys + value bits
    NC = 1 << 18
    keys = np.sort(rs.integers(0, 1 << 16, (NC, w)), axis=1)
    bvals = rs.standard_normal((NC, w)).astype(np.float32)
    table = np.concatenate(
        [keys.astype(np.int32), bvals.view(np.int32)], axis=1)
    # sentinel dummy row
    dummy = np.full((1, 2 * w), 0, np.int32)
    dummy[0, :w] = 0x7FFFFFFF
    table = np.concatenate([table, dummy], axis=0)
    table_d = jnp.asarray(table.reshape(NC + 1, 2, w)
                          .transpose(0, 2, 1).reshape(NC + 1, 2 * w))
    # ^ wrong layout guard: binned's table is [cols | vals] halves
    table_d = jnp.asarray(table)

    src = jnp.asarray(rs.integers(0, NC, (R, m)).astype(np.int32))
    avals = jnp.asarray(rs.standard_normal((R, m)).astype(np.float32))

    k0, v0, f0, c0 = binned.bucket_multiply(table_d, src, avals, m, w, 2)
    k1, v1, f1, c1 = binned.bucket_multiply_vmem(table_d, src, avals,
                                                 m, w, 2)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    fm = np.asarray(f0)
    np.testing.assert_allclose(np.asarray(v1)[fm], np.asarray(v0)[fm],
                               rtol=1e-4, atol=1e-5)
    assert int(c0) == int(c1)
    print(f"R={R} m={m} w={w}: vmem-merge == lax.sort path "
          f"(keys/first exact, count {int(c0)})", flush=True)

    for name, fn in (
            ("lax.sort", lambda: binned.bucket_multiply(
                table_d, src, avals, m, w, 2)),
            ("vmem-merge", lambda: binned.bucket_multiply_vmem(
                table_d, src, avals, m, w, 2))):
        out = fn()
        force_sync(out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        force_sync(out[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        rate = R * m * w / (dt / 1e3) / 1e9
        print(f"{name:>12}: {dt:8.2f} ms  ({rate:.2f} Gslot/s)",
              flush=True)


if __name__ == "__main__":
    main()
