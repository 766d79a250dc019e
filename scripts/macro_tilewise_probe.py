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


@partial(jax.jit, static_argnames=("p", "precision"))
def tilewise(a_dense, b_dense, pa, pb, p, precision="highest"):
    """pa/pb: (T, p) padded pair indices per C tile."""
    t = pa.shape[0]
    ad = a_dense[pa.reshape(-1)].reshape(t, p, 128, 128)
    bd = b_dense[pb.reshape(-1)].reshape(t, p, 128, 128)
    prec = dict(highest=lax.Precision.HIGHEST,
                default=lax.Precision.DEFAULT)[precision]
    num = jnp.einsum("tpij,tpjk->tik", ad, bd,
                     preferred_element_type=jnp.float32, precision=prec)
    pat = jnp.einsum("tpij,tpjk->tik", (ad != 0).astype(jnp.bfloat16),
                     (bd != 0).astype(jnp.bfloat16),
                     preferred_element_type=jnp.bfloat16)
    return num, pat


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

    # host: pad pairs per tile to uniform P
    segn = np.asarray(seg)[:n_pairs]
    pan = np.asarray(a_idx)[:n_pairs]
    pbn = np.asarray(b_idx)[:n_pairs]
    counts = np.bincount(segn, minlength=n_tiles)
    P = int(counts.max())
    zero_a = m.dense.shape[0] - 1
    pa = np.full((n_tiles, P), zero_a, np.int32)
    pb = np.full((n_tiles, P), zero_a, np.int32)
    rank = np.arange(n_pairs) - np.concatenate(
        [[0], np.cumsum(counts)])[segn]
    pa[segn, rank] = pan
    pb[segn, rank] = pbn
    print(f"P={P} padded={n_tiles*P} ({n_tiles*P/n_pairs:.2f}x)", flush=True)
    pa_d, pb_d = jnp.asarray(pa), jnp.asarray(pb)

    for prec in ("highest", "default"):
        out = tilewise(m.dense, m.dense, pa_d, pb_d, P, prec)
        force_sync(out[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = tilewise(m.dense, m.dense, pa_d, pb_d, P, prec)
            force_sync(out[0])
            ts.append(time.perf_counter() - t0)
        print(f"tilewise {prec}: {min(ts)*1e3:.1f} ms", flush=True)

    # reference: current chunked scatter-add path
    out = macro.accumulate_macro(m.dense, m.dense, a_idx, b_idx, seg,
                                 -(-n_tiles // 256) * 256, 256,
                                 jnp.float32, "highest")
    force_sync(out[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = macro.accumulate_macro(m.dense, m.dense, a_idx, b_idx, seg,
                                     -(-n_tiles // 256) * 256, 256,
                                     jnp.float32, "highest")
        force_sync(out[0])
        ts.append(time.perf_counter() - t0)
    print(f"chunked scatter-add highest: {min(ts)*1e3:.1f} ms", flush=True)

    # correctness spot check vs chunked
    num_t, pat_t = tilewise(m.dense, m.dense, pa_d, pb_d, P, "highest")
    num_c, _ = macro.accumulate_macro(m.dense, m.dense, a_idx, b_idx, seg,
                                      -(-n_tiles // 256) * 256, 256,
                                      jnp.float32, "highest")
    x = np.asarray(num_t[:200])
    y = np.asarray(num_c[:200])
    err = np.max(np.abs(x - y) / np.maximum(np.abs(y), 1e-30))
    print(f"max rel err vs chunked (200 tiles): {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
