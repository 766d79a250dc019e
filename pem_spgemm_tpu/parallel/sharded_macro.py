"""Multi-device Macro128 SpGEMM: row-sharded A, ring-exchanged B macro tiles.

The macro analog of parallel/sharded.py — the regime where multi-chip
matters most, because the B operand is dense 64KB macro tiles (the heavy
data).  Same schedule: C macro tiles partition into contiguous per-device
ranges balanced by pair count; B's dense tiles shard into n contiguous
chunks that travel the ring via ppermute, one stage per device, overlapped
by XLA with the current stage's batched 128x128 matmuls.  The exact
structural pattern accumulates locally as a second 0/1 matmul (bf16
counts), so no extra collective traffic is needed for structure.

The reference has no distributed component at all (SURVEY.md section 2.3);
this is the new scaling axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pem_spgemm_tpu.formats.macro import MacroMatrix
from pem_spgemm_tpu.parallel.sharded import AXIS, make_mesh


@dataclasses.dataclass
class ShardedMacroPlan:
    """Host-built static plan for one sharded macro multiply."""

    n_devices: int
    a_dense: np.ndarray      # (n, a_cap, 128, 128) local A tile slices
    b_dense: np.ndarray      # (n, b_chunk, 128, 128) stage-0 B chunks
    pairs_a: np.ndarray      # (n, stages, stage_cap) local A tile index
    pairs_b: np.ndarray      # (n, stages, stage_cap) index within B chunk
    seg: np.ndarray          # (n, stages, stage_cap) local C tile id
    c_cap: int
    c_tile_row: np.ndarray   # (n, c_cap) global macro coords (pad sentinel)
    c_tile_col: np.ndarray   # (n, c_cap)
    c_counts_dev: np.ndarray  # (n,) true local C tile counts
    n_pairs: int

    @property
    def stages(self) -> int:
        return self.pairs_a.shape[1]


def plan_sharded_macro(a: MacroMatrix, b: MacroMatrix,
                       n_devices: int) -> ShardedMacroPlan:
    """Host planner: pair schedule + operand shards (numpy mirror of
    ops/symbolic.expand_pairs at macro granularity)."""
    n = n_devices
    n_a = a.ntiles
    a_row = np.asarray(a.tile_row)[:n_a]
    a_col = np.asarray(a.tile_col)[:n_a]
    b_rowptr = np.asarray(b.tile_rowptr)
    b_col = np.asarray(b.tile_col)[:b.ntiles]

    bcnt = b_rowptr[a_col + 1] - b_rowptr[a_col]
    offsets = np.concatenate([[0], np.cumsum(bcnt)])
    n_pairs = int(offsets[-1])
    a_idx = np.repeat(np.arange(n_a, dtype=np.int64), bcnt)
    b_idx = b_rowptr[a_col[a_idx]] + (np.arange(n_pairs) - offsets[a_idx])
    c_row = a_row[a_idx]
    c_col = b_col[b_idx]
    order = np.lexsort((c_col, c_row))
    a_idx, b_idx, c_row, c_col = (x[order] for x in
                                  (a_idx, b_idx, c_row, c_col))
    ckey = c_row.astype(np.int64) * (b.n_macro_cols + 1) + c_col
    uniq, c_tile_id, tile_pairs = np.unique(ckey, return_inverse=True,
                                            return_counts=True)
    n_c = len(uniq)

    pair_cum = np.concatenate([[0], np.cumsum(tile_pairs)])
    targets = np.arange(1, n) * (n_pairs / n)
    cuts = np.searchsorted(pair_cum, targets)
    c_bounds = np.concatenate([[0], cuts, [n_c]])
    p_bounds = pair_cum[c_bounds]

    b_chunk = -(-b.ntiles // n)
    owner = b_idx // b_chunk

    stage_blocks = [[None] * n for _ in range(n)]
    for d in range(n):
        lo, hi = p_bounds[d], p_bounds[d + 1]
        local = np.arange(lo, hi)
        st = (d - owner[lo:hi]) % n
        so = np.argsort(st, kind="stable")
        local, st = local[so], st[so]
        ptr = np.searchsorted(st, np.arange(n + 1))
        for s in range(n):
            stage_blocks[d][s] = local[ptr[s]:ptr[s + 1]]

    stage_cap = max(1, max(len(blk) for row in stage_blocks for blk in row))

    c_counts = np.diff(c_bounds)
    c_cap = max(1, int(c_counts.max()))
    a_lo = np.zeros(n, np.int64)
    a_caps = np.ones(n, np.int64)
    for d in range(n):
        lo, hi = p_bounds[d], p_bounds[d + 1]
        if hi > lo:
            a_lo[d] = a_idx[lo:hi].min()
            a_caps[d] = a_idx[lo:hi].max() - a_lo[d] + 1
    a_cap = int(a_caps.max())

    dense = np.asarray(a.dense)
    b_dense_all = dense if b is a else np.asarray(b.dense)
    A = np.zeros((n, a_cap, 128, 128), np.float32)
    B = np.zeros((n, b_chunk, 128, 128), np.float32)
    PA = np.full((n, n, stage_cap), a_cap, np.int32)   # pad -> zero tile
    PB = np.zeros((n, n, stage_cap), np.int32)
    SEG = np.full((n, n, stage_cap), c_cap, np.int32)  # pad -> dropped
    CR = np.full((n, c_cap), 0x7FFFFFFF, np.int32)
    CC = np.full((n, c_cap), 0x7FFFFFFF, np.int32)
    c_first = np.concatenate([[0], np.cumsum(tile_pairs)[:-1]])
    for d in range(n):
        A[d, :a_caps[d]] = dense[a_lo[d]:a_lo[d] + a_caps[d]]
        bl, bh = d * b_chunk, min(b.ntiles, (d + 1) * b_chunk)
        if bh > bl:
            B[d, :bh - bl] = b_dense_all[bl:bh]
        for s in range(n):
            blk = stage_blocks[d][s]
            PA[d, s, :len(blk)] = a_idx[blk] - a_lo[d]
            PB[d, s, :len(blk)] = b_idx[blk] % b_chunk
            SEG[d, s, :len(blk)] = c_tile_id[blk] - c_bounds[d]
        CR[d, :c_counts[d]] = c_row[c_first[c_bounds[d]:c_bounds[d + 1]]]
        CC[d, :c_counts[d]] = c_col[c_first[c_bounds[d]:c_bounds[d + 1]]]
    # padded pairs index PA = a_cap: append one zero tile row per device
    A = np.concatenate([A, np.zeros((n, 1, 128, 128), np.float32)], axis=1)

    return ShardedMacroPlan(
        n_devices=n, a_dense=A, b_dense=B, pairs_a=PA, pairs_b=PB, seg=SEG,
        c_cap=c_cap, c_tile_row=CR, c_tile_col=CC,
        c_counts_dev=c_counts.astype(np.int64), n_pairs=n_pairs)


def _local_macro(a_dense, b_chunk0, pairs_a, pairs_b, seg, *,
                 n_stages, c_cap, precision):
    """Per-device body: ring over B macro chunks, batched 128x128 matmuls
    + 0/1 structural matmuls."""
    axis_n = lax.axis_size(AXIS)
    perm = [(i, (i + 1) % axis_n) for i in range(axis_n)]

    def stage(s, carry):
        b_cur, c_dense, c_cnt = carry
        pa = lax.dynamic_index_in_dim(pairs_a, s, keepdims=False)
        pb = lax.dynamic_index_in_dim(pairs_b, s, keepdims=False)
        sg = lax.dynamic_index_in_dim(seg, s, keepdims=False)
        ad = a_dense[pa]
        bd = b_cur[pb]
        prod = jnp.einsum("pij,pjk->pik", ad, bd,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        pat = jnp.einsum("pij,pjk->pik", (ad != 0).astype(jnp.bfloat16),
                         (bd != 0).astype(jnp.bfloat16),
                         preferred_element_type=jnp.bfloat16)
        c_dense = c_dense.at[sg].add(prod, mode="drop")
        c_cnt = c_cnt.at[sg].add(pat, mode="drop")
        b_nxt = lax.ppermute(b_cur, AXIS, perm)
        return b_nxt, c_dense, c_cnt

    acc_dtype = jnp.float32
    c_dense = lax.pcast(jnp.zeros((c_cap, 128, 128), acc_dtype), (AXIS,), to='varying')
    c_cnt = lax.pcast(jnp.zeros((c_cap, 128, 128), jnp.bfloat16), (AXIS,), to='varying')
    _, c_dense, c_cnt = lax.fori_loop(0, n_stages, stage,
                                      (b_chunk0, c_dense, c_cnt))
    return c_dense, c_cnt


def sharded_macro_numeric(plan: ShardedMacroPlan, mesh: Mesh,
                          precision="highest"):
    """Run the sharded macro numeric phase.

    Returns (c_dense, c_counts) as host arrays with leading device axis."""
    spec = P(AXIS)
    fn = partial(_local_macro, n_stages=plan.stages, c_cap=plan.c_cap,
                 precision=precision)
    shard_fn = jax.shard_map(
        lambda *xs: fn(*(x[0] for x in xs)),
        mesh=mesh, in_specs=(spec,) * 5, out_specs=(spec, spec))
    c_dense, c_cnt = jax.jit(shard_fn)(
        plan.a_dense, plan.b_dense, plan.pairs_a, plan.pairs_b, plan.seg)
    n = plan.n_devices
    return (np.asarray(c_dense).reshape(n, plan.c_cap, 128, 128),
            np.asarray(c_cnt, dtype=np.float32).reshape(
                n, plan.c_cap, 128, 128))


def assemble_sharded_macro(plan: ShardedMacroPlan, c_dense, c_counts):
    """Host assembly: per-device macro C tiles -> global COO triplets."""
    rows_l, cols_l, vals_l = [], [], []
    for d in range(plan.n_devices):
        nc = int(plan.c_counts_dev[d])
        cnt = c_counts[d, :nc]
        t, r, c = np.nonzero(cnt > 0)
        rows_l.append(plan.c_tile_row[d, t] * 128 + r)
        cols_l.append(plan.c_tile_col[d, t] * 128 + c)
        vals_l.append(c_dense[d, t, r, c])
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l)
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]
