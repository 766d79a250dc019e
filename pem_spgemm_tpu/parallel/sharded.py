"""Multi-device tiled SpGEMM: row-sharded A, ring-exchanged B tiles.

The reference is strictly single-GPU (SURVEY.md section 2.3); this is the
new scaling axis from BASELINE.json: "A row/block-partitioned over hosts, B
tiles fetched via all-gather/all-to-all collectives overlapped with per-tile
numeric compute".

Design (SpGEMM analog of ring attention's pass-blocks-while-computing):
  * C tile rows follow A tile rows, so C tiles are partitioned into
    contiguous ranges balanced by pair count; each device owns the A tiles
    and C tiles of its range (tile-row locality makes both contiguous).
  * B's dense tile values — the heavy data — are sharded into n contiguous
    chunks.  The numeric phase runs n stages: at stage s device d holds B
    chunk (d - s) mod n, multiplies the pairs whose B tile lives in that
    chunk, and ppermutes the chunk to its right neighbor.  XLA overlaps the
    collective-permute with the batched matmuls of the current stage.
  * The symbolic planning runs on the host (numpy) in this version: it
    assigns every pair a (device, stage) slot and pads to uniform static
    shapes — the shard_map step is pure numeric + collectives.

Structural metadata (masks, pointers) is tiny compared to values, so the
plan replicates it implicitly inside the per-device index arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from pem_spgemm_tpu.config import round_up_bucket
from pem_spgemm_tpu.formats.tiled import TiledMatrix

AXIS = "d"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _dense_tiles_host(t: TiledMatrix, dtype) -> np.ndarray:
    """Host-side densification of a TiledMatrix (planning path)."""
    out = np.zeros((t.ntiles, 256), dtype)
    et = np.asarray(t.elem_tile)
    rc = np.asarray(t.rowcol)
    out[et, rc] = np.asarray(t.vals).astype(dtype)
    return out.reshape(t.ntiles, 16, 16)


@dataclasses.dataclass
class ShardedPlan:
    """Host-built static plan for one sharded multiply."""

    n_devices: int
    # device inputs, leading axis = device
    a_dense: np.ndarray      # (n, a_cap, 16, 16)
    b_dense: np.ndarray      # (n, b_chunk, 16, 16) stage-0 chunks
    pairs_a: np.ndarray      # (n, stages, stage_cap) local A tile index
    pairs_b: np.ndarray      # (n, stages, stage_cap) index within B chunk
    seg: np.ndarray          # (n, stages, stage_cap) local C tile id (pad=c_cap)
    rowcol: np.ndarray       # (n, nnz_cap) intra-tile coords of local C
    elem_tile: np.ndarray    # (n, nnz_cap) local C tile index
    c_cap: int
    # host-side assembly info
    c_tile_row: np.ndarray   # (n, c_cap)
    c_tile_col: np.ndarray   # (n, c_cap)
    c_nnz_per_dev: np.ndarray  # (n,)
    c_nnz: int
    n_pairs: int

    @property
    def stages(self) -> int:
        return self.pairs_a.shape[1]


def plan_sharded_spgemm(a: TiledMatrix, b: TiledMatrix, n_devices: int,
                        dtype=np.float32) -> ShardedPlan:
    """Build the per-device pair schedule and operand shards on the host."""
    n = n_devices
    n_a = a.ntiles
    a_row = np.asarray(a.tile_row)[:n_a]
    a_col = np.asarray(a.tile_col)[:n_a]
    b_rowptr = np.asarray(b.tile_rowptr)
    b_col = np.asarray(b.tile_col)[:b.ntiles]
    b_masks = np.asarray(b.masks)[:b.ntiles]
    a_masks = np.asarray(a.masks)[:n_a]
    from pem_spgemm_tpu.ops.convert import transpose_masks
    b_tmasks = np.asarray(b.tmasks if b.tmasks is not None
                          else transpose_masks(b_masks))[:b.ntiles]

    # --- expand all pairs (host mirror of ops/symbolic.expand_pairs) ---
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
    ckey = c_row.astype(np.int64) * (b.n_tile_cols + 1) + c_col
    uniq, c_tile_id, tile_pairs = np.unique(ckey, return_inverse=True,
                                            return_counts=True)
    n_c = len(uniq)

    # --- C masks + nnz per tile (host mirror of ops/cstruct.c_masks) ---
    am = a_masks[a_idx]
    bt = b_tmasks[b_idx]
    packed = np.zeros((n_pairs, 16), np.int64)
    for c in range(16):
        packed |= (((am & bt[:, c:c + 1]) != 0).astype(np.int64) << c)
    cmask = np.zeros((n_c, 16), np.int64)
    np.bitwise_or.at(cmask, c_tile_id, packed)
    popc = np.unpackbits(cmask.astype(np.uint16).view(np.uint8),
                         axis=1).sum(axis=1)
    c_first_row = (c_row[np.concatenate([[0], np.cumsum(tile_pairs)[:-1]])])
    c_first_col = (c_col[np.concatenate([[0], np.cumsum(tile_pairs)[:-1]])])

    # --- partition C tiles into n contiguous ranges balanced by pairs ---
    pair_cum = np.concatenate([[0], np.cumsum(tile_pairs)])
    targets = np.arange(1, n) * (n_pairs / n)
    cuts = np.searchsorted(pair_cum, targets)           # C tile boundaries
    c_bounds = np.concatenate([[0], cuts, [n_c]])
    p_bounds = pair_cum[c_bounds]

    # --- B value chunks ---
    b_chunk = -(-b.ntiles // n)
    owner = b_idx // b_chunk

    stage_blocks = [[None] * n for _ in range(n)]   # [dev][stage] -> indices
    for d in range(n):
        lo, hi = p_bounds[d], p_bounds[d + 1]
        local = np.arange(lo, hi)
        st = (d - owner[lo:hi]) % n                 # ring schedule
        so = np.argsort(st, kind="stable")
        local = local[so]
        st = st[so]
        ptr = np.searchsorted(st, np.arange(n + 1))
        for s in range(n):
            stage_blocks[d][s] = local[ptr[s]:ptr[s + 1]]

    stage_cap = max(1, max(len(blk) for row in stage_blocks for blk in row))
    stage_cap = round_up_bucket(stage_cap)

    # --- per-device local caps ---
    c_counts = np.diff(c_bounds)
    c_cap = round_up_bucket(max(1, int(c_counts.max())))
    a_lo = np.empty(n, np.int64)
    a_caps = np.empty(n, np.int64)
    for d in range(n):
        lo, hi = p_bounds[d], p_bounds[d + 1]
        if hi > lo:
            a_lo[d] = a_idx[lo:hi].min()
            a_caps[d] = a_idx[lo:hi].max() - a_lo[d] + 1
        else:
            a_lo[d], a_caps[d] = 0, 1
    a_cap = round_up_bucket(int(a_caps.max()))

    nnz_per_tile_dev = [popc[c_bounds[d]:c_bounds[d + 1]] for d in range(n)]
    nnz_per_dev = np.array([x.sum() for x in nnz_per_tile_dev], np.int64)
    nnz_cap = round_up_bucket(max(1, int(nnz_per_dev.max())))

    # --- build padded device arrays ---
    a_dense_all = _dense_tiles_host(a, dtype)
    b_dense_all = _dense_tiles_host(b, dtype) if b is not a else a_dense_all
    A = np.zeros((n, a_cap, 16, 16), dtype)
    B = np.zeros((n, b_chunk, 16, 16), dtype)
    PA = np.zeros((n, n, stage_cap), np.int32)
    PB = np.zeros((n, n, stage_cap), np.int32)
    SEG = np.full((n, n, stage_cap), c_cap, np.int32)
    RC = np.zeros((n, nnz_cap), np.int32)
    ET = np.zeros((n, nnz_cap), np.int32)
    CR = np.full((n, c_cap), 0x7FFFFFFF, np.int32)
    CC = np.full((n, c_cap), 0x7FFFFFFF, np.int32)
    for d in range(n):
        A[d, :a_caps[d]] = a_dense_all[a_lo[d]:a_lo[d] + a_caps[d]]
        bl = d * b_chunk
        bh = min(b.ntiles, bl + b_chunk)
        if bh > bl:
            B[d, :bh - bl] = b_dense_all[bl:bh]
        for s in range(n):
            blk = stage_blocks[d][s]
            PA[d, s, :len(blk)] = a_idx[blk] - a_lo[d]
            PB[d, s, :len(blk)] = b_idx[blk] % b_chunk
            SEG[d, s, :len(blk)] = c_tile_id[blk] - c_bounds[d]
        # local C structure (tile-major set-bit enumeration)
        cm = cmask[c_bounds[d]:c_bounds[d + 1]]
        bits = ((cm[:, :, None] >> np.arange(16)) & 1).astype(bool)
        t_i, r_i, c_i = np.nonzero(bits)
        RC[d, :len(t_i)] = (r_i << 4) | c_i
        ET[d, :len(t_i)] = t_i
        CR[d, :c_counts[d]] = c_first_row[c_bounds[d]:c_bounds[d + 1]]
        CC[d, :c_counts[d]] = c_first_col[c_bounds[d]:c_bounds[d + 1]]

    return ShardedPlan(
        n_devices=n, a_dense=A, b_dense=B, pairs_a=PA, pairs_b=PB, seg=SEG,
        rowcol=RC, elem_tile=ET, c_cap=c_cap, c_tile_row=CR, c_tile_col=CC,
        c_nnz_per_dev=nnz_per_dev, c_nnz=int(nnz_per_dev.sum()),
        n_pairs=n_pairs)


def _local_numeric(a_dense, b_chunk0, pairs_a, pairs_b, seg, rowcol,
                   elem_tile, *, n_stages, c_cap, acc_dtype, precision):
    """Per-device body: ring over B chunks, batched 16x16 matmuls."""
    axis_n = lax.axis_size(AXIS)
    perm = [(i, (i + 1) % axis_n) for i in range(axis_n)]

    def stage(s, carry):
        b_cur, c_dense = carry
        pa = lax.dynamic_index_in_dim(pairs_a, s, keepdims=False)
        pb = lax.dynamic_index_in_dim(pairs_b, s, keepdims=False)
        sg = lax.dynamic_index_in_dim(seg, s, keepdims=False)
        ad = a_dense[pa].astype(acc_dtype)
        bd = b_cur[pb].astype(acc_dtype)
        prod = jnp.einsum("pij,pjk->pik", ad, bd,
                          preferred_element_type=acc_dtype,
                          precision=precision)
        c_dense = c_dense.at[sg].add(prod, mode="drop")
        # Pass the chunk along the ring; XLA overlaps this with the matmuls.
        # (Unconditional: the final shift is unused but keeps the loop free
        # of collectives-under-conditionals.)
        b_nxt = lax.ppermute(b_cur, AXIS, perm)
        return b_nxt, c_dense

    # Mark the accumulator device-varying up front so the loop carry type is
    # stable (it becomes varying after the first scatter-add anyway).
    c_dense = lax.pcast(jnp.zeros((c_cap, 16, 16), acc_dtype), (AXIS,), to='varying')
    _, c_dense = lax.fori_loop(0, n_stages, stage, (b_chunk0, c_dense))
    pos = jnp.minimum(elem_tile * 256 + rowcol, c_cap * 256 - 1)
    return c_dense.reshape(-1)[pos]


def sharded_numeric(plan: ShardedPlan, mesh: Mesh,
                    acc_dtype=jnp.float32, precision="highest"):
    """Run the sharded numeric phase. Returns per-device C values
    (n_devices, nnz_cap) on the host."""
    spec = P(AXIS)
    fn = partial(_local_numeric, n_stages=plan.stages, c_cap=plan.c_cap,
                 acc_dtype=acc_dtype, precision=precision)
    shard_fn = jax.shard_map(
        lambda *xs: fn(*(x[0] for x in xs)),   # drop the leading dev axis
        mesh=mesh,
        in_specs=(spec,) * 7,
        out_specs=spec)

    out = jax.jit(shard_fn)(
        plan.a_dense, plan.b_dense, plan.pairs_a, plan.pairs_b, plan.seg,
        plan.rowcol, plan.elem_tile)
    return np.asarray(out).reshape(plan.n_devices, -1)


def assemble_sharded(plan: ShardedPlan, c_vals_dev: np.ndarray):
    """Host assembly of per-device values into global COO triplets."""
    rows_l, cols_l, vals_l = [], [], []
    for d in range(plan.n_devices):
        nv = int(plan.c_nnz_per_dev[d])
        rc = plan.rowcol[d, :nv]
        et = plan.elem_tile[d, :nv]
        rows_l.append(plan.c_tile_row[d, et] * 16 + (rc >> 4))
        cols_l.append(plan.c_tile_col[d, et] * 16 + (rc & 15))
        vals_l.append(c_vals_dev[d, :nv])
    return (np.concatenate(rows_l), np.concatenate(cols_l),
            np.concatenate(vals_l))
