"""Stencil macro kernel: windowed write-once accumulation for periodic
pair structure (third-generation macro kernel).

The generic pipelined kernel (ops/pallas_macro2.py) fetches every pair's
two operand tiles through the grid pipeline — 2 block-DMA issues per pair
at the measured ~253ns issue cost, an ~88ms floor on banded-1M
(NOTES.md round-2 findings).  Banded/stencil matrices have structure the
generic kernel cannot use: C tiles along one DIAGONAL have pair operand
positions that advance through the A and B tile tables by a PERIODIC
pattern.  This kernel exploits it:

  * the plan walks each C diagonal in steps of T consecutive tiles and
    hashes the step's operand-offset pattern (all pair positions relative
    to the step's first positions).  Steps with identical patterns form a
    CLASS; every in-window offset of a class is a compile-time constant.
  * one pallas_call per class: each grid step issues TWO manual DMAs
    (one A window, one B window — dynamic base, static extent), computes
    all T*P pair products with static window offsets, and writes the
    final (T,128,128) numeric + pattern blocks once.  2 DMA issues per
    ~16-24 pairs instead of 2 per pair; no dynamic VMEM indexing at all.
  * steps whose pattern is rare (boundaries, irregular tiles) fall back
    to the XLA chunked scatter-add, accumulating into reserved rows of
    the same slab buffers.

C arrays come out SLAB-ORDERED (class-major, diagonal order); per-tile
metadata (40K ints, not GBs of tile values) is permuted on the host.
Exclusive ownership per output block — the reference's atomic-freedom
argument (spgemm.cu:593-661) in write-once form.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_STEP = 8              # C tiles per grid step
MIN_CLASS_STEPS = 4     # rarer patterns go to the residual path
MAX_CLASSES = 8
MAX_WIN = 40            # window extent cap (tiles); wider goes residual


def _kernel(ab_ref, cn_in, cp_in, a_hbm, b_hbm, c_num_ref, c_pat_ref,
            a_win, b_win, sem, *, t, p, ar, br, a_offs, b_offs, precision):
    del cn_in, cp_in          # aliased pass-through, never read
    i = pl.program_id(0)
    a0 = ab_ref[2 * i]
    b0 = ab_ref[2 * i + 1]
    cp_a = pltpu.make_async_copy(a_hbm.at[pl.ds(a0, ar)], a_win, sem.at[0])
    cp_b = pltpu.make_async_copy(b_hbm.at[pl.ds(b0, br)], b_win, sem.at[1])
    cp_a.start()
    cp_b.start()
    cp_a.wait()
    cp_b.wait()
    # static in-window selection: one batched dot over all T*P pairs
    a3 = jnp.concatenate([a_win[o:o + 1] for o in a_offs], axis=0)
    b3 = jnp.concatenate([b_win[o:o + 1] for o in b_offs], axis=0)
    prod = lax.dot_general(a3, b3,
                           dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32,
                           precision=precision)
    pat = lax.dot_general((a3 != 0).astype(jnp.bfloat16),
                          (b3 != 0).astype(jnp.bfloat16),
                          dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    c_num_ref[:] = prod.reshape(t, p, 128, 128).sum(axis=1)
    c_pat_ref[:] = pat.reshape(t, p, 128, 128).sum(axis=1).astype(
        jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("t", "p", "ar", "br",
                                             "a_offs", "b_offs", "base",
                                             "precision", "interpret"))
def class_call(c_num, c_pat, a_dense, b_dense, ab_bases,
               t, p, ar, br, a_offs, b_offs, base, precision="highest",
               interpret=False):
    """Run one signature class into slab rows [base, base + steps*t).

    ab_bases: (2 * n_steps,) i32 interleaved (a_base, b_base) per step.
    c_num/c_pat are aliased through (donated); base is static.
    """
    prec = dict(highest=lax.Precision.HIGHEST,
                high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT)[precision]
    n_steps = ab_bases.shape[0] // 2
    kernel = functools.partial(_kernel, t=t, p=p, ar=ar, br=br,
                               a_offs=a_offs, b_offs=b_offs, precision=prec)
    blk0 = base // t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # c_num (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # c_pat (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # a_dense (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # b_dense
        ],
        out_specs=(
            pl.BlockSpec((t, 128, 128), lambda i, ab: (blk0 + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128, 128), lambda i, ab: (blk0 + i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ar, 128, 128), jnp.float32),
            pltpu.VMEM((br, 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # aliased pass-through inputs ride positions 1, 2 (after prefetch)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(c_num.shape, jnp.float32),
            jax.ShapeDtypeStruct(c_pat.shape, jnp.bfloat16),
        ),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(ab_bases, c_num, c_pat, a_dense, b_dense)


def _kernel2(ab_ref, cn_in, cp_in, a_hbm, b_hbm, c_num_ref, c_pat_ref,
             a_win0, a_win1, b_win0, b_win1, stg_n0, stg_n1, stg_p0,
             stg_p1, in_sems, out_sems, *, t, p, ar, br, a_offs, b_offs,
             base, n_steps, precision):
    """Double-buffered streaming body: one grid step, fori_loop over the
    class's steps.  Slots are unrolled (even/odd) so every scratch index
    is static; input DMAs for step k+1 start before step k's compute, and
    output staging flushes to HBM via DMA overlapped with the next step.
    """
    del cn_in, cp_in

    def in_copies(slot_a, slot_b, step):
        a0 = ab_ref[2 * step]
        b0 = ab_ref[2 * step + 1]
        return (pltpu.make_async_copy(a_hbm.at[pl.ds(a0, ar)], slot_a,
                                      in_sems.at[0]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(b0, br)], slot_b,
                                      in_sems.at[1]))

    def in_copies2(slot_a, slot_b, step):
        a0 = ab_ref[2 * step]
        b0 = ab_ref[2 * step + 1]
        return (pltpu.make_async_copy(a_hbm.at[pl.ds(a0, ar)], slot_a,
                                      in_sems.at[2]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(b0, br)], slot_b,
                                      in_sems.at[3]))

    def out_copies(stg_n, stg_p, step, sems):
        row = base + step * t
        return (pltpu.make_async_copy(stg_n, c_num_ref.at[pl.ds(row, t)],
                                      sems.at[0]),
                pltpu.make_async_copy(stg_p, c_pat_ref.at[pl.ds(row, t)],
                                      sems.at[1]))

    # uniform p (int) or ragged per-tile pair counts (tuple, run plan)
    p_list = (p,) * t if isinstance(p, int) else p
    p_base = [0]
    for pc in p_list:
        p_base.append(p_base[-1] + pc)

    def compute(a_win, b_win, stg_n, stg_p):
        # zero-copy: 2D dots directly on window slices (static offsets);
        # per-tile sums stay in registers
        for tt in range(t):
            acc_n = None
            acc_p = None
            for pp in range(p_list[tt]):
                ao = a_offs[p_base[tt] + pp]
                bo = b_offs[p_base[tt] + pp]
                aw = a_win[ao]
                bw = b_win[bo]
                dn = lax.dot_general(
                    aw, bw, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                dp = lax.dot_general(
                    (aw != 0).astype(jnp.bfloat16),
                    (bw != 0).astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_n = dn if acc_n is None else acc_n + dn
                acc_p = dp if acc_p is None else acc_p + dp
            stg_n[tt] = acc_n
            stg_p[tt] = acc_p.astype(jnp.bfloat16)

    ca, cb = in_copies(a_win0, b_win0, 0)
    ca.start()
    cb.start()

    def body(k, _):
        s0 = 2 * k          # even slot
        s1 = 2 * k + 1      # odd slot

        @pl.when(s1 < n_steps)
        def _():
            ca, cb = in_copies2(a_win1, b_win1, s1)
            ca.start()
            cb.start()
        ca, cb = in_copies(a_win0, b_win0, s0)
        ca.wait()
        cb.wait()
        # reclaim the even staging (flushed two steps ago)
        @pl.when(k > 0)
        def _():
            on, op = out_copies(stg_n0, stg_p0, s0 - 2, out_sems.at[0])
            on.wait()
            op.wait()
        compute(a_win0, b_win0, stg_n0, stg_p0)
        on, op = out_copies(stg_n0, stg_p0, s0, out_sems.at[0])
        on.start()
        op.start()

        @pl.when(s1 < n_steps)
        def _():
            @pl.when(s1 + 1 < n_steps)
            def _():
                ca, cb = in_copies(a_win0, b_win0, s1 + 1)
                ca.start()
                cb.start()
            ca, cb = in_copies2(a_win1, b_win1, s1)
            ca.wait()
            cb.wait()
            @pl.when(k > 0)
            def _():
                on, op = out_copies(stg_n1, stg_p1, s1 - 2,
                                    out_sems.at[1])
                on.wait()
                op.wait()
            compute(a_win1, b_win1, stg_n1, stg_p1)
            on, op = out_copies(stg_n1, stg_p1, s1, out_sems.at[1])
            on.start()
            op.start()
        return 0

    n_k = (n_steps + 1) // 2
    lax.fori_loop(0, n_k, body, 0)
    # Drain the pending output flushes.  The loop waits each flush two
    # steps later, so at exit the last EVEN flush (step last0) and the
    # last ODD flush are still in flight.  The last odd flush is step
    # n_steps-1 when n_steps is even, but n_steps-2 when ODD (the final
    # iteration skips the odd block, so its wait never ran) — leaving it
    # unwaited ends the kernel with a DMA in flight: FAILED_PRECONDITION
    # on hardware (found by the round-3 hardware drive; the interpreter
    # does not model in-flight DMAs).  n_steps is static, so the drain
    # target is a compile-time constant.
    last0 = 2 * (n_k - 1)
    on, op = out_copies(stg_n0, stg_p0, last0, out_sems.at[0])
    on.wait()
    op.wait()
    if n_steps >= 2:
        last_odd = n_steps - 1 if n_steps % 2 == 0 else n_steps - 2
        on, op = out_copies(stg_n1, stg_p1, last_odd, out_sems.at[1])
        on.wait()
        op.wait()


@functools.partial(jax.jit, static_argnames=("t", "p", "ar", "br",
                                             "a_offs", "b_offs", "base",
                                             "n_steps", "precision",
                                             "interpret"),
                   donate_argnums=(0, 1))
def class_call2(c_num, c_pat, a_dense, b_dense, ab_bases,
                t, p, ar, br, a_offs, b_offs, base, n_steps,
                precision="highest", interpret=False):
    """Streaming double-buffered class call (see _kernel2)."""
    prec = dict(highest=lax.Precision.HIGHEST,
                high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT)[precision]
    kernel = functools.partial(_kernel2, t=t, p=p, ar=ar, br=br,
                               a_offs=a_offs, b_offs=b_offs, base=base,
                               n_steps=n_steps, precision=prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # c_num (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # c_pat (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # a_dense
            pl.BlockSpec(memory_space=pl.ANY),   # b_dense
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((ar, 128, 128), jnp.float32),
            pltpu.VMEM((ar, 128, 128), jnp.float32),
            pltpu.VMEM((br, 128, 128), jnp.float32),
            pltpu.VMEM((br, 128, 128), jnp.float32),
            pltpu.VMEM((t, 128, 128), jnp.float32),
            pltpu.VMEM((t, 128, 128), jnp.float32),
            pltpu.VMEM((t, 128, 128), jnp.bfloat16),
            pltpu.VMEM((t, 128, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(c_num.shape, jnp.float32),
            jax.ShapeDtypeStruct(c_pat.shape, jnp.bfloat16),
        ),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=True),
    )(ab_bases, c_num, c_pat, a_dense, b_dense)


@dataclasses.dataclass(frozen=True)
class StencilPlan:
    """Host-built class layout for one (A, B) pair structure."""

    classes: tuple         # per class: (t, p, ar, br, a_offs, b_offs, base)
    class_bases: tuple     # per class: (2*n_steps,) i32 device array
    res_pa: jax.Array      # residual pairs (chunked scatter-add path)
    res_pb: jax.Array
    res_seg: jax.Array     # residual pair -> slab row
    n_res_tiles: int
    order: np.ndarray      # (slab rows,) slab row -> sorted-tile index
    c_cap: int             # slab rows allocated (>= real rows)
    n_tiles: int
    coverage: float        # fraction of pairs on the stencil fast path


def plan_stencil(seg, a_idx, b_idx, c_row, c_col, n_pairs, n_tiles,
                 a_rows, b_rows, t_step=T_STEP) -> StencilPlan:
    """Group C tiles into diagonal-step signature classes (host numpy)."""
    segn = np.asarray(seg)[:n_pairs]
    pan = np.asarray(a_idx)[:n_pairs].astype(np.int64)
    pbn = np.asarray(b_idx)[:n_pairs].astype(np.int64)
    crow = np.asarray(c_row)[:n_pairs].astype(np.int64)
    ccol = np.asarray(c_col)[:n_pairs].astype(np.int64)
    counts = np.bincount(segn, minlength=n_tiles)
    starts = np.concatenate([[0], np.cumsum(counts)])
    first = starts[:-1]
    tile_row = crow[np.minimum(first, n_pairs - 1)]
    tile_col = ccol[np.minimum(first, n_pairs - 1)]

    # order tiles by (P, diagonal, row): runs of same-P tiles along each
    # diagonal become candidate steps
    diag = tile_col - tile_row
    order_t = np.lexsort((tile_row, diag, counts))
    sig_steps = {}          # signature -> list of (tiles_of_step,)
    res_tiles = []

    i = 0
    nt = n_tiles
    while i < nt:
        j = i
        p0 = counts[order_t[i]]
        d0 = diag[order_t[i]]
        while j < nt and counts[order_t[j]] == p0 and diag[order_t[j]] == d0:
            j += 1
        run = order_t[i:j]
        i = j
        if p0 == 0:
            continue
        # chop the run into steps of t_step tiles
        for s in range(0, len(run) - t_step + 1, t_step):
            tiles = run[s:s + t_step]
            a0 = pan[starts[tiles[0]]]
            b0 = pbn[starts[tiles[0]]]
            a_offs, b_offs = [], []
            ok = True
            for tt in tiles:
                lo, hi = starts[tt], starts[tt + 1]
                ao = np.sort(pan[lo:hi]) - a0
                bo = np.sort(pbn[lo:hi]) - b0
                if (ao < 0).any() or (bo < 0).any() or \
                        ao.max(initial=0) >= MAX_WIN or \
                        bo.max(initial=0) >= MAX_WIN:
                    ok = False
                    break
                a_offs += list(ao)
                b_offs += list(bo)
            # the window DMA must stay inside the operand tables
            if ok and (a0 + max(a_offs) >= a_rows
                       or b0 + max(b_offs) >= b_rows):
                ok = False
            if not ok:
                res_tiles += list(tiles)
                continue
            key = (t_step, int(p0), tuple(a_offs), tuple(b_offs))
            sig_steps.setdefault(key, []).append((tiles, int(a0), int(b0)))
        leftover = run[len(run) - (len(run) % t_step):]
        res_tiles += list(leftover)

    return _finish_plan(sig_steps, res_tiles, segn, pan, pbn, n_pairs,
                        n_tiles, MAX_CLASSES)


# Run-plan bounds: a C macro row becomes one grid step when its tiles,
# pairs, and operand window extents fit; anything wider goes residual.
T_MAXR = 16             # C tiles per row step
P_MAXR = 64             # pairs per row step (compute unroll bound)
MAX_WIN_R = 48          # window extent cap (tiles) for the run plan
MAX_CLASSES_R = 32      # row signatures are finer than diagonal ones
                        # (wandering-band walks produce ~25 variants)


def plan_runs(seg, a_idx, b_idx, c_row, c_col, n_pairs, n_tiles,
              a_rows, b_rows) -> StencilPlan:
    """Consecutive-run clustering plan: one write-once step per C MACRO
    ROW, grouped by in-window offset signature (host numpy).

    The stencil plan (plan_stencil) requires PERIODIC structure: T_STEP
    same-pattern tiles along one diagonal, repeated across the matrix.
    Irregular-macro matrices (e.g. a wandering band — locally dense,
    globally aperiodic) defeat it and previously fell back to 2 DMA
    issues + 1 dynamic VMEM add PER PAIR (~253ns + ~1us each, the ~88ms
    floor of NOTES.md).  This plan exploits the run structure such
    matrices do have: all pairs of one C macro row reference an A-table
    range (the row's tiles are contiguous in the row-major table) and a
    B-table range (the contributing B rows are consecutive table spans),
    so ONE A-window DMA + ONE B-window DMA per row replace per-pair
    fetches, and each row's C tiles are written once (exclusive
    ownership by construction, reference spgemm.cu:593-661).  In-window
    offsets are compile-time constants of the row's signature class;
    locally-regular matrices collapse to a handful of classes.  Rows
    with rare signatures or oversized windows degrade to the residual
    per-pair path — the graceful G=1 limit for fully scattered
    structure.
    """
    segn = np.asarray(seg)[:n_pairs]
    pan = np.asarray(a_idx)[:n_pairs].astype(np.int64)
    pbn = np.asarray(b_idx)[:n_pairs].astype(np.int64)
    crow = np.asarray(c_row)[:n_pairs].astype(np.int64)
    counts = np.bincount(segn, minlength=n_tiles)
    starts = np.concatenate([[0], np.cumsum(counts)])
    first = starts[:-1]
    tile_row = crow[np.minimum(first, n_pairs - 1)]

    # tiles are already in (row, col) sort order by construction of the
    # pair stream (seg is the sorted C tile id); group by macro row
    row_change = np.nonzero(np.diff(tile_row))[0] + 1
    bounds = np.concatenate([[0], row_change, [n_tiles]])
    sig_steps = {}
    res_tiles = []
    for gi in range(len(bounds) - 1):
        tiles = np.arange(bounds[gi], bounds[gi + 1])
        total_p = int(counts[tiles].sum())
        if total_p == 0:
            continue
        if len(tiles) > T_MAXR or total_p > P_MAXR:
            res_tiles += list(tiles)
            continue
        lo, hi = starts[tiles[0]], starts[tiles[-1] + 1]
        a0 = int(pan[lo:hi].min())
        b0 = int(pbn[lo:hi].min())
        p_list, a_offs, b_offs = [], [], []
        ok = True
        for tt in tiles:
            tl, th = starts[tt], starts[tt + 1]
            ao = np.sort(pan[tl:th]) - a0
            bo = np.sort(pbn[tl:th]) - b0
            if ao.max(initial=0) >= MAX_WIN_R or \
                    bo.max(initial=0) >= MAX_WIN_R:
                ok = False
                break
            p_list.append(int(th - tl))
            a_offs += list(ao)
            b_offs += list(bo)
        if ok and (a0 + max(a_offs) >= a_rows
                   or b0 + max(b_offs) >= b_rows):
            ok = False
        if not ok:
            res_tiles += list(tiles)
            continue
        key = (len(tiles), tuple(p_list),
               tuple(int(x) for x in a_offs),
               tuple(int(x) for x in b_offs))
        sig_steps.setdefault(key, []).append((tiles, a0, b0))

    return _finish_plan(sig_steps, res_tiles, segn, pan, pbn, n_pairs,
                        n_tiles, MAX_CLASSES_R)


def _finish_plan(sig_steps, res_tiles, segn, pan, pbn, n_pairs, n_tiles,
                 max_classes):
    """Shared plan tail: rank signatures, lay out the slab, build the
    residual stream.  sig_steps keys are (t, p, a_offs, b_offs) with p an
    int (uniform, stencil plan) or a per-tile tuple (ragged, run plan);
    values are lists of (tiles, a_base, b_base)."""
    ranked = sorted(sig_steps.items(), key=lambda kv: -len(kv[1]))
    classes, class_bases, order_parts = [], [], []
    slab_base = 0
    kept = 0
    for key, steps in ranked:
        if kept >= max_classes or len(steps) < MIN_CLASS_STEPS:
            for tiles, _a, _b in steps:
                res_tiles += list(tiles)
            continue
        kept += 1
        t_step, p0, a_offs, b_offs = key
        ar = max(a_offs) + 1
        br = max(b_offs) + 1
        bases = np.empty(2 * len(steps), np.int32)
        for si, (tiles, a0, b0) in enumerate(steps):
            bases[2 * si] = a0
            bases[2 * si + 1] = b0
            order_parts.append(tiles)
        classes.append((t_step, p0, int(ar), int(br),
                        tuple(int(x) for x in a_offs),
                        tuple(int(x) for x in b_offs), slab_base))
        class_bases.append(jnp.asarray(bases))
        slab_base += len(steps) * t_step

    res_tiles = np.asarray(sorted(res_tiles), np.int64)
    n_res = len(res_tiles)
    if n_res:
        rpos = np.zeros(n_tiles, np.int64)
        rpos[res_tiles] = np.arange(n_res)
        rsel = np.isin(segn, res_tiles)
        res_pa = pan[rsel].astype(np.int32)
        res_pb = pbn[rsel].astype(np.int32)
        res_seg = (slab_base + rpos[segn[rsel]]).astype(np.int32)
        order_parts.append(res_tiles)
    else:
        res_pa = np.zeros(0, np.int32)
        res_pb = np.zeros(0, np.int32)
        res_seg = np.zeros(0, np.int32)
    slab_rows = slab_base + n_res
    order = (np.concatenate(order_parts) if order_parts
             else np.zeros(0, np.int64))
    c_cap = max(256, -(-slab_rows // 256) * 256)
    res_pairs = len(res_pa)
    return StencilPlan(
        classes=tuple(classes), class_bases=tuple(class_bases),
        res_pa=jnp.asarray(res_pa), res_pb=jnp.asarray(res_pb),
        res_seg=jnp.asarray(res_seg), n_res_tiles=n_res,
        order=order, c_cap=c_cap, n_tiles=n_tiles,
        coverage=1.0 - res_pairs / max(1, n_pairs))


@functools.partial(jax.jit, static_argnames=("chunk", "precision"),
                   donate_argnums=(0, 1))
def _residual_add(c_num, c_pat, a_dense, b_dense, pa, pb, seg, chunk,
                  precision):
    """Chunked scatter-add of residual pairs into the shared slabs."""
    prec = dict(highest=lax.Precision.HIGHEST,
                high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT)[precision]
    n_chunks = pa.shape[0] // chunk

    def body(i, carry):
        cn, cp = carry
        sl = i * chunk
        a_c = lax.dynamic_slice_in_dim(pa, sl, chunk)
        b_c = lax.dynamic_slice_in_dim(pb, sl, chunk)
        s_c = lax.dynamic_slice_in_dim(seg, sl, chunk)
        ad = a_dense[a_c]
        bd = b_dense[b_c]
        prod = jnp.einsum("pij,pjk->pik", ad, bd,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        pat = jnp.einsum("pij,pjk->pik", (ad != 0).astype(jnp.bfloat16),
                         (bd != 0).astype(jnp.bfloat16),
                         preferred_element_type=jnp.bfloat16)
        cn = cn.at[s_c].add(prod, mode="drop")
        cp = cp.at[s_c].add(pat, mode="drop")
        return cn, cp

    return lax.fori_loop(0, n_chunks, body, (c_num, c_pat))


def stencil_accumulate(a_dense, b_dense, plan: StencilPlan,
                       precision="highest", macro_chunk=256,
                       interpret=False):
    """Full macro accumulation via class calls + residual scatter-add.

    Returns (c_num (c_cap,128,128) f32, c_pat (c_cap,128,128) bf16) in
    SLAB order (plan.order maps slab row -> sorted-tile index).
    """
    c_num = jnp.zeros((plan.c_cap, 128, 128), jnp.float32)
    c_pat = jnp.zeros((plan.c_cap, 128, 128), jnp.bfloat16)
    for (t, p, ar, br, a_offs, b_offs, base), bases in zip(
            plan.classes, plan.class_bases):
        c_num, c_pat = class_call2(c_num, c_pat, a_dense, b_dense, bases,
                                   t, p, ar, br, a_offs, b_offs, base,
                                   bases.shape[0] // 2, precision,
                                   interpret)
    if plan.res_pa.shape[0]:
        n_res_pairs = plan.res_pa.shape[0]
        p_cap = max(macro_chunk,
                    -(-n_res_pairs // macro_chunk) * macro_chunk)
        pad = p_cap - n_res_pairs
        rpa = jnp.concatenate(
            [plan.res_pa, jnp.full((pad,), a_dense.shape[0] - 1,
                                   jnp.int32)])
        rpb = jnp.concatenate(
            [plan.res_pb, jnp.full((pad,), b_dense.shape[0] - 1,
                                   jnp.int32)])
        rseg = jnp.concatenate(
            [plan.res_seg, jnp.full((pad,), jnp.int32(plan.c_cap))])
        c_num, c_pat = _residual_add(c_num, c_pat, a_dense, b_dense,
                                     rpa, rpb, rseg, macro_chunk,
                                     precision)
    return c_num, c_pat
