"""Probe: tile-wise padded macro accumulation vs the chunked scatter-add.

If every C macro tile's pair list is padded to a uniform P (pointing pad
slots at the zero tile), accumulation is ONE row gather + ONE batched
einsum contracting (p, j) — no scatter-add, no per-pair dynamic VMEM adds
(the 87ms floor of both the XLA chunked path and the Pallas kernel).

Measures banded64-1M (the VERDICT target: < 50ms total macro step).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pem_spgemm_tpu.models.synthetic import banded
from pem_spgemm_tpu.ops.convert import coo_to_macro
from pem_spgemm_tpu.ops import macro, symbolic
from pem_spgemm_tpu.utils.timing import force_sync
from functools import partial


@partial(jax.jit, static_argnames=("p", "precision", "chunk"))
def tilewise(a_dense, b_dense, pa, pb, p, precision="highest", chunk=2048):
    """pa/pb: (T, p) padded pair indices per C tile; T % chunk == 0.
    Chunked over tiles: each chunk's output is FINAL (no scatter-add)."""
    t = pa.shape[0]
    assert t % chunk == 0
    prec = dict(highest=lax.Precision.HIGHEST,
                default=lax.Precision.DEFAULT)[precision]

    def body(i, carry):
        num, pat = carry
        pa_c = lax.dynamic_slice_in_dim(pa, i * chunk, chunk)
        pb_c = lax.dynamic_slice_in_dim(pb, i * chunk, chunk)
        ad = a_dense[pa_c.reshape(-1)].reshape(chunk, p, 128, 128)
        bd = b_dense[pb_c.reshape(-1)].reshape(chunk, p, 128, 128)
        n = jnp.einsum("tpij,tpjk->tik", ad, bd,
                       preferred_element_type=jnp.float32, precision=prec)
        q = jnp.einsum("tpij,tpjk->tik", (ad != 0).astype(jnp.bfloat16),
                       (bd != 0).astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        num = lax.dynamic_update_slice_in_dim(num, n, i * chunk, 0)
        pat = lax.dynamic_update_slice_in_dim(pat, q, i * chunk, 0)
        return num, pat

    init = (jnp.zeros((t, 128, 128), jnp.float32),
            jnp.zeros((t, 128, 128), jnp.bfloat16))
    return lax.fori_loop(0, t // chunk, body, init)


def main():
    print("device:", jax.devices()[0], flush=True)
    coo = banded(n=1_000_000, bands=tuple(range(-32, 32)), seed=1)
    m = coo_to_macro(coo, dtype=jnp.float32)
    offsets = symbolic.pair_counts(m.tile_col, m.tile_rowptr,
                                   jnp.int32(m.ntiles))
    n_pairs = int(offsets[-1])
    p_cap = -(-n_pairs // 1024) * 1024
    c_row, c_col, a_idx, b_idx, seg, cnt = symbolic.expand_pairs(
        offsets, m.tile_row, m.tile_col, m.tile_rowptr, m.tile_col,
        jnp.int32(n_pairs), p_cap, True)
    n_tiles = int(cnt)
    print(f"pairs={n_pairs} c_tiles={n_tiles}", flush=True)

    from pem_spgemm_tpu.ops import pallas_macro3 as pm3
    zero_a = m.dense.shape[0] - 1
    t0 = time.perf_counter()
    plan = pm3.plan_tilewise(seg, a_idx, b_idx, n_pairs, n_tiles, zero_a)
    print(f"plan: {1e3*(time.perf_counter()-t0):.1f} ms, "
          f"classes={[mt for mt in plan.class_meta]} "
          f"res_tiles={plan.n_res_tiles} slab={plan.slab_total} "
          f"c_cap={plan.c_cap}", flush=True)

    out = pm3.tilewise_accumulate(m.dense, m.dense, plan, "highest")
    force_sync(out[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pm3.tilewise_accumulate(m.dense, m.dense, plan, "highest")
        force_sync(out[0])
        ts.append(time.perf_counter() - t0)
    print(f"pallas3 tilewise highest: {min(ts)*1e3:.1f} ms", flush=True)
    x_n = np.asarray(out[0][:plan.slab_total])
    x_p = np.asarray(out[1][:plan.slab_total], np.float32)
    del out

    # current production path for comparison
    from pem_spgemm_tpu.ops import pallas_macro2 as pm2
    c_cap2 = -(-n_tiles // 4) * 4
    out2 = pm2.accumulate_macro_pipelined(m.dense, m.dense, a_idx, b_idx,
                                          seg, cnt, c_cap2, "highest")
    force_sync(out2[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out2 = pm2.accumulate_macro_pipelined(m.dense, m.dense, a_idx,
                                              b_idx, seg, cnt, c_cap2,
                                              "highest")
        force_sync(out2[0])
        ts.append(time.perf_counter() - t0)
    print(f"pallas2 pipelined highest: {min(ts)*1e3:.1f} ms", flush=True)

    # correctness vs v2 on all tiles (slab order -> sorted order)
    y_n = np.asarray(out2[0][:n_tiles])
    y_p = np.asarray(out2[1][:n_tiles], np.float32)
    order = plan.order
    real = order < n_tiles
    err = np.max(np.abs(x_n[real] - y_n[order[real]])
                 / np.maximum(np.abs(y_n[order[real]]), 1e-30))
    pat_ok = np.array_equal(x_p[real] > 0, y_p[order[real]] > 0)
    covered = np.unique(order[real]).size == n_tiles
    print(f"pallas3 vs pallas2: max rel err {err:.2e} pattern_ok={pat_ok} "
          f"covered={covered}", flush=True)


if __name__ == "__main__":
    main()
