"""Measure the DIA pairbands multiply: XLA path vs the pairwise Pallas
kernel, device-true (pipelined: N dispatches, one sync).

Usage: python scripts/probe_dia_pairs.py [n] [repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices())

    from pem_spgemm_tpu.ops.dia import _dia_multiply_xla, _plan_maps
    from pem_spgemm_tpu.ops.pallas_dia import dia_multiply_pallas
    from pem_spgemm_tpu.utils.timing import force_sync

    bands = (0, 1, 600, 601, -600, -601, 1200, 1201, -1200, -1201)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((len(bands), n)).astype(np.float32)
    aj = jnp.asarray(a)
    dc_list, idx_map = _plan_maps(bands, bands)
    d = len(bands)
    products = d * d * n            # upper bound; flop metric analog
    print(f"n={n} D={d} dc={len(dc_list)} products~{products/1e6:.0f}M")

    def bench(label, fn):
        out = fn()
        force_sync(out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        force_sync(out[0])
        dt = (time.perf_counter() - t0) / reps
        gf = 2 * products / dt / 1e9
        print(f"{label:>28}: {dt*1e3:8.2f} ms  ({gf:6.1f} GF upper-bound)",
              flush=True)
        return out

    ox = bench("xla full", lambda: _dia_multiply_xla(
        aj, aj, offs_a=bands, idx_map=idx_map, dc_count=len(dc_list),
        n_out=n))
    bench("xla values-only", lambda: _dia_multiply_xla(
        aj, aj, offs_a=bands, idx_map=idx_map, dc_count=len(dc_list),
        n_out=n, values_only=True))
    op = bench("pallas pairs full", lambda: dia_multiply_pallas(
        aj, aj, offs_a=bands, offs_b=bands, mode="pairs",
        dc_list=dc_list, n_out=n))
    bench("pallas pairs values-only", lambda: dia_multiply_pallas(
        aj, aj, offs_a=bands, offs_b=bands, mode="pairs",
        dc_list=dc_list, n_out=n, values_only=True))

    err = float(jnp.max(jnp.abs(op[0] - ox[0])))
    denom = float(jnp.max(jnp.abs(ox[0])))
    cnt_err = float(jnp.max(jnp.abs(op[1] - ox[1])))
    print(f"parity: rel_err={err/max(denom,1e-30):.2e} cnt_err={cnt_err}")


if __name__ == "__main__":
    main()
