"""Per-op timing on the real device: where does the time actually go?

Times each jitted phase of both engines (post-compile, steady state) on
matrices spanning the structural regimes, printing a table to stderr.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    from pem_spgemm_tpu.models.synthetic import power_law, banded
    from pem_spgemm_tpu.ops.convert import coo_to_tiled
    from pem_spgemm_tpu.ops import symbolic, numeric, cstruct, element
    from pem_spgemm_tpu.config import round_up_pow2, round_up_bucket

    rep = []

    # ---------------- element engine on the power-law 1M matrix -----------
    coo = power_law(n=1_000_000, nnz=3_000_000, seed=42)
    a = coo_to_tiled(coo, dtype=jnp.float32)
    rep.append(f"power_law 1M: nnz={coo.nnz} ntiles={a.ntiles} "
               f"fill={a.fill_ratio():.2f}")

    b_rowptr, _r, b_cols, b_vals = a.element_csr()
    jax.block_until_ready(b_rowptr)
    t, _ = timeit(a.element_csr)
    rep.append(f"  element_csr (build B csr, sort {coo.nnz}): {t*1e3:.1f}ms")
    a_rows, a_cols = a.element_coords()
    b_row_nnz = b_rowptr[1:] - b_rowptr[:-1]
    t, offsets = timeit(element.product_offsets, a_cols, b_row_nnz)
    rep.append(f"  product_offsets: {t*1e3:.1f}ms")
    n_products = int(offsets[-1])
    p_cap = round_up_pow2(n_products)
    rep.append(f"  n_products={n_products} p_cap={p_cap}")
    t, out = timeit(element.expand_sorted_products, offsets, a_rows, a_cols,
                    a.vals, b_rowptr, b_cols, b_vals,
                    jnp.int32(n_products), p_cap)
    rep.append(f"  expand_sorted_products (incl sort): {t*1e3:.1f}ms")
    ci, cj, cv, out_id, c_nnz_dev = out
    c_nnz = int(c_nnz_dev)
    c_cap = round_up_bucket(c_nnz)
    t, _ = timeit(element.reduce_products, ci, cj, cv, out_id, c_cap)
    rep.append(f"  reduce_products: {t*1e3:.1f}ms  (c_nnz={c_nnz})")

    # raw sort costs for reference
    key = jnp.asarray(np.random.randint(0, 1 << 30, p_cap, np.int32))
    val = jnp.arange(p_cap, dtype=jnp.int32)
    t, _ = timeit(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
                  key, val)
    rep.append(f"  [raw] 1-key i32 sort of {p_cap}: {t*1e3:.1f}ms")
    k2 = jnp.asarray(np.random.randint(0, 1 << 30, p_cap, np.int32))
    t, _ = timeit(jax.jit(
        lambda a_, b_, c_, d_: jax.lax.sort((a_, b_, c_, d_), num_keys=2)),
        key, k2, val, cv)
    rep.append(f"  [raw] 2-key 4-operand sort of {p_cap}: {t*1e3:.1f}ms")
    t, _ = timeit(jax.jit(lambda k: jnp.cumsum(k)), key)
    rep.append(f"  [raw] cumsum {p_cap} i32: {t*1e3:.1f}ms")
    seg = jnp.sort(jnp.asarray(
        np.random.randint(0, c_cap, p_cap, np.int32)))
    t, _ = timeit(jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=c_cap, indices_are_sorted=True)), cv, seg)
    rep.append(f"  [raw] segment_sum {p_cap} -> {c_cap}: {t*1e3:.1f}ms")

    # ---------------- fused tile engine on a banded 1M matrix -------------
    coo2 = banded(n=1_000_000, bands=tuple(range(-8, 8)))
    at = coo_to_tiled(coo2, dtype=jnp.float32)
    rep.append(f"banded 1M 16diag: nnz={coo2.nnz} ntiles={at.ntiles} "
               f"fill={at.fill_ratio():.2f}")
    t, offsets = timeit(symbolic.pair_counts, at.tile_col, at.tile_rowptr,
                        jnp.int32(at.ntiles))
    rep.append(f"  pair_counts: {t*1e3:.1f}ms")
    n_pairs = int(offsets[-1])
    p_cap2 = round_up_pow2(n_pairs)
    rep.append(f"  n_pairs={n_pairs} p_cap={p_cap2}")
    t, out = timeit(symbolic.expand_pairs, offsets, at.tile_row, at.tile_col,
                    at.tile_rowptr, at.tile_col, jnp.int32(n_pairs), p_cap2,
                    True)
    rep.append(f"  expand_pairs(packed): {t*1e3:.1f}ms")
    c_row, c_col, a_idx, b_idx, c_tile_id, cnt_c = out
    c_ntiles = int(cnt_c)
    c_cap2 = round_up_bucket(c_ntiles)
    t, a_dense = timeit(numeric.densify_tiles, at.vals, at.rowcol,
                        at.elem_tile, at.tile_cap)
    rep.append(f"  densify_tiles ({at.tile_cap} tiles): {t*1e3:.1f}ms")
    chunk = 1 << 14
    t, out = timeit(numeric.accumulate_fused, a_dense, a_dense, a_idx, b_idx,
                    c_tile_id, c_cap2, chunk, jnp.float32, "highest")
    n_chunks = p_cap2 // chunk
    rep.append(f"  accumulate_fused ({n_chunks} chunks of {chunk}): "
               f"{t*1e3:.1f}ms -> {n_pairs/t/1e6:.1f}M pairs/s, "
               f"{n_pairs*8192/t/1e12:.2f} TFLOP/s MXU-side")
    c_dense, c_counts = out
    t, out = timeit(numeric.counts_to_masks, c_counts)
    rep.append(f"  counts_to_masks (c_cap={c_cap2}): {t*1e3:.1f}ms")
    cmask, cptr = out
    c_nnz2 = int(cptr[-1])
    c_nnz_cap = round_up_bucket(c_nnz2)
    t, out = timeit(cstruct.c_rowcol, cmask, cptr, c_nnz_cap)
    rep.append(f"  c_rowcol (c_nnz={c_nnz2}): {t*1e3:.1f}ms")
    c_rc, c_et = out
    t, _ = timeit(numeric.extract_values, c_dense, c_rc, c_et)
    rep.append(f"  extract_values: {t*1e3:.1f}ms")

    # raw batched matmul cost — what is the MXU actually doing?
    for bs in (1 << 14, 1 << 15):
        x = jnp.asarray(np.random.randn(bs, 16, 16), jnp.float32)
        t, _ = timeit(jax.jit(lambda x_: jnp.einsum(
            "pij,pjk->pik", x_, x_, preferred_element_type=jnp.float32,
            precision="highest")), x)
        rep.append(f"  [raw] batched 16x16 matmul x{bs} f32/highest: "
                   f"{t*1e3:.2f}ms = {bs*8192/t/1e12:.2f} TFLOP/s")
        t, _ = timeit(jax.jit(lambda x_: jnp.einsum(
            "pij,pjk->pik", x_, x_, preferred_element_type=jnp.float32,
            precision="default")), x)
        rep.append(f"  [raw] batched 16x16 matmul x{bs} f32/default: "
                   f"{t*1e3:.2f}ms = {bs*8192/t/1e12:.2f} TFLOP/s")
        idx = jnp.asarray(np.random.randint(0, at.tile_cap, bs, np.int32))
        t, _ = timeit(jax.jit(lambda d, i: d[i]), a_dense, idx)
        rep.append(f"  [raw] gather {bs} random 16x16 tiles from "
                   f"{at.tile_cap}: {t*1e3:.2f}ms")
        segi = jnp.sort(jnp.asarray(
            np.random.randint(0, c_cap2, bs, np.int32)))
        t, _ = timeit(jax.jit(lambda p, s: jnp.zeros(
            (c_cap2, 16, 16), jnp.float32).at[s].add(
                p, indices_are_sorted=True)), x, segi)
        rep.append(f"  [raw] sorted scatter-add {bs} tiles -> {c_cap2}: "
                   f"{t*1e3:.2f}ms")

    print("\n".join(rep), file=sys.stderr)
    print("PROFILE OK")


if __name__ == "__main__":
    main()
