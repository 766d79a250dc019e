"""BASELINE config 5 at reduced scale: sharded A^2 of a 10^8-nnz banded
matrix on the virtual 8-device CPU mesh.

Exercises every scale cliff the 2048^2 dryrun cannot see: 10^8-nnz device
conversion, device-native ring planning (host memory must stay O(shard)),
the ppermute ring at real slab sizes, and assembly of a ~2.5x10^8-nnz C.
Validation: analytic C_nnz for the band algebra + sampled C rows against
scipy (full-matrix scipy oracle at this scale would dominate the run).

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python scripts/run_config5.py [n_rows] [half_bandwidth]
Results are recorded in BASELINE.md section 5.
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the virtual mesh timeshares ONE core: at 10^8 nnz a ring stage's matmuls
# exceed the CPU collectives' default 40s termination timeout
flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
        " --xla_cpu_collective_timeout_seconds=3000").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_dev = 8
    assert len(jax.devices()) >= n_dev, jax.devices()

    from pem_spgemm_tpu.models.synthetic import banded_device
    from pem_spgemm_tpu.ops.convert import coo_to_macro
    from pem_spgemm_tpu.parallel.sharded import make_mesh
    from pem_spgemm_tpu.parallel.sharded_macro import (
        plan_sharded_macro, sharded_macro_numeric, assemble_sharded_macro)

    bands = tuple(range(-hw, hw))
    t0 = time.time()
    coo = banded_device(n=n, seed=1, bands=bands)
    jax.block_until_ready(coo.vals)
    t_gen = time.time() - t0
    print(f"generate: nnz={coo.nnz} ({t_gen:.1f}s, rss {rss_gb():.1f}GB)",
          flush=True)

    # keep a host copy of the triplets for the sampled-row oracle BEFORE
    # conversion frees anything
    rows_h = np.asarray(coo.rows)
    cols_h = np.asarray(coo.cols)
    vals_h = np.asarray(coo.vals)

    t0 = time.time()
    m = coo_to_macro(coo, dtype=np.float32)
    jax.block_until_ready(m.dense)
    t_conv = time.time() - t0
    print(f"convert: macro tiles={m.ntiles} ({t_conv:.1f}s, "
          f"rss {rss_gb():.1f}GB)", flush=True)

    t0 = time.time()
    plan = plan_sharded_macro(m, m, n_dev)
    jax.block_until_ready(plan.pairs_a)
    t_plan = time.time() - t0
    print(f"plan: pairs={plan.n_pairs} stages={plan.stages} "
          f"c_cap={plan.c_cap} ({t_plan:.1f}s, rss {rss_gb():.1f}GB)",
          flush=True)

    mesh = make_mesh(n_dev)
    t0 = time.time()
    c_dense, c_cnt = sharded_macro_numeric(plan, mesh, as_numpy=False)
    jax.block_until_ready(c_cnt)
    t_first = time.time() - t0
    t0 = time.time()
    c_dense, c_cnt = sharded_macro_numeric(plan, mesh, as_numpy=False)
    jax.block_until_ready(c_cnt)
    t_ring = time.time() - t0
    print(f"ring numeric: first={t_first:.1f}s steady={t_ring:.1f}s "
          f"(rss {rss_gb():.1f}GB)", flush=True)

    # exact C_nnz from the structural counts (device reduce, one D2H)
    import jax.numpy as jnp
    nnz_dev = []
    cd = np.asarray(plan.c_counts_dev)
    cnz = jnp.sum(
        (jnp.asarray(c_cnt).reshape(n_dev, plan.c_cap, 128, 128) > 0)
        & (jnp.arange(plan.c_cap)[None, :, None, None]
           < jnp.asarray(cd)[:, None, None, None]), dtype=jnp.int64
        if jax.config.jax_enable_x64 else jnp.int32)
    c_nnz = int(cnz)
    # analytic oracle: C band d = sum of A bands d1+d2=d, support n-|d|
    lo, hi = 2 * min(bands), 2 * max(bands)
    want_nnz = sum(max(0, n - abs(d)) for d in range(lo, hi + 1))
    print(f"C_nnz={c_nnz} analytic={want_nnz} "
          f"{'EXACT' if c_nnz == want_nnz else 'MISMATCH'}", flush=True)
    assert c_nnz == want_nnz, (c_nnz, want_nnz)

    # sampled-row value oracle: 8 random C rows vs scipy csr row products
    import scipy.sparse as sp
    t0 = time.time()
    A = sp.csr_matrix((vals_h, (rows_h, cols_h)), shape=(n, n))
    cd_h = np.asarray(c_dense).reshape(n_dev, plan.c_cap, 128, 128)
    ctr = np.asarray(plan.c_tile_row)
    ctc = np.asarray(plan.c_tile_col)
    rs = np.random.default_rng(0)
    max_err = 0.0
    for i in sorted(rs.integers(0, n, 8)):
        want = (A.getrow(i) @ A).toarray()[0]
        mr, r = divmod(i, 128)
        got = np.zeros(n, np.float64)
        for d in range(n_dev):
            for t in range(int(cd[d])):
                if ctr[d, t] == mr:
                    c0 = ctc[d, t] * 128
                    got[c0:c0 + 128] += cd_h[d, t, r][:max(0, n - c0)][
                        :min(128, n - c0)]
        denom = np.abs(want).max() or 1.0
        max_err = max(max_err, np.abs(got - want).max() / denom)
    t_oracle = time.time() - t0
    print(f"sampled-row oracle: max rel err {max_err:.2e} "
          f"({t_oracle:.1f}s)", flush=True)
    assert max_err < 1e-5, max_err

    t0 = time.time()
    r, c, v = assemble_sharded_macro(
        plan, cd_h, np.asarray(c_cnt, np.float32).reshape(
            n_dev, plan.c_cap, 128, 128))
    t_asm = time.time() - t0
    assert len(r) == want_nnz, (len(r), want_nnz)
    print(f"assembly: {len(r)} triplets ({t_asm:.1f}s, "
          f"rss {rss_gb():.1f}GB)", flush=True)
    print(f"SUMMARY n={n} nnz={coo.nnz} c_nnz={c_nnz} | "
          f"gen {t_gen:.1f}s conv {t_conv:.1f}s plan {t_plan:.1f}s "
          f"ring(first/steady) {t_first:.1f}/{t_ring:.1f}s "
          f"assemble {t_asm:.1f}s | peak rss {rss_gb():.1f}GB")


if __name__ == "__main__":
    main()
