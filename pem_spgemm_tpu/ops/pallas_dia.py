"""Pallas DIA kernel: VMEM-resident C blocks for wide-band stencils.

The XLA DIA path (ops/dia._dia_multiply_xla) materializes every band
pair's product term in HBM: traffic ~ products * 20B, which is optimal
for small product counts but ~300GB on banded128-1M (16.4G products).
This kernel brings traffic down to |A| + |B| + 2|C| read/written ONCE:

  grid over column blocks of length L; per block
    * one async copy stages the B band stack window (D2, L + span) into
      VMEM (span = max(offs_a) - min(offs_a); every A offset's shifted
      read is a STATIC slice of this window);
    * the C value and count blocks live in VMEM for the whole block and
      are written once (write-once exclusive ownership, the same
      atomic-freedom-by-construction as the reference's step 3,
      spgemm.cu:593-661);
    * the inner loop over A bands is a static Python unroll: per d1 one
      (D2, L) multiply and one static-slice accumulate into C rows
      [row_base(d1), row_base(d1) + D2) — contiguity holds because the
      kernel requires B's offsets to form a dense integer range (true
      for stencil operands), with C indexed over the dense sum range.

All data movement inside the block is VMEM-speed; HBM sees each operand
element exactly once per covering block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_D1 = 256            # unroll bound (statements ~ 8 * D1)
MAX_DC_DENSE = 1024     # dense C offset rows cap
MAX_PAIRS = 512         # pairwise-kernel unroll bound (one row FMA each)
VMEM_BUDGET = 72 << 20  # bytes for the per-block working set


def _choose_block(d1, d2, dc, span) -> int:
    """Largest lane-aligned block length fitting the VMEM budget.

    Capped at 8192: the kernel's in-window reads are lane-UNALIGNED
    static slices (band shifts), which Mosaic lowers per 128-lane tile —
    compile time scales with D1 * L/128, and L = 64K unrolls pushed a
    single Mosaic compile past 45 minutes (measured round 3).  8K keeps
    per-block DMAs large (>= 0.5 MB) while compiles stay in seconds.
    """
    per_col = 4 * (d1 + d2 + 2 * dc + 2 * d2)   # + term temporaries
    l = VMEM_BUDGET // per_col
    # compile cost ~ D1 unrolled slices x L/128 lane tiles: bound D1*L so
    # wide stencils (D1=128) compile in minutes, not tens of minutes
    l = min(l, (1 << 19) // max(1, d1))
    l = max(512, min(1 << 13, (l // 512) * 512))
    return int(l)


def _choose_block_pairs(d1, d2, dc_pad, span, *, n_pairs,
                        with_cnt) -> int:
    """Block length for the pairwise kernel.

    Unroll cost is one (1, L) slice FMA per pair (x2 with counts):
    bound n_pairs * L the way the dense kernel bounds D1 * L.  The B
    window scratch (and its mask temporary, with counts) is (d2, L+span+
    alignment): its span-dependent fixed part comes off the budget BEFORE
    dividing by the per-column cost — a gapped offs_a (large span) would
    otherwise push the block past the Mosaic vmem limit (ADVICE round 3,
    medium)."""
    n_win = 2 if with_cnt else 1                      # b_win (+ b_mask)
    fixed = 4 * n_win * d2 * (span + 256)             # span + align slack
    per_col = 4 * (d1 + n_win * d2 + (2 if with_cnt else 1) * dc_pad)
    l = max(0, VMEM_BUDGET - fixed) // per_col
    l = min(l, (1 << 19) // max(1, n_pairs))
    l = max(512, min(1 << 13, (l // 512) * 512))
    return int(l)


def _pairs_vmem_ok(offs_a, offs_b, dc, *, with_cnt=True) -> bool:
    """Can the pairwise kernel fit VMEM at its smallest block (L=512)?

    Mirrors _choose_block_pairs's accounting; gates mode='pairs' so wide
    A-offset spans fall back to the XLA path instead of crashing at
    Mosaic compile time (ADVICE round 3, medium)."""
    d1, d2 = len(offs_a), -(-len(offs_b) // 8) * 8
    span = max(offs_a) - min(offs_a)
    dc_pad = -(-dc // 8) * 8
    n_win = 2 if with_cnt else 1
    fixed = 4 * n_win * d2 * (span + 256)
    per_col = 4 * (d1 + n_win * d2 + (2 if with_cnt else 1) * dc_pad)
    return fixed + 512 * per_col <= VMEM_BUDGET


def _platform_ok() -> bool:
    """Mosaic TPU kernels only; factored out so tests can monkeypatch it
    and exercise the mode-selection logic on the CPU mesh (ADVICE r3)."""
    return jax.devices()[0].platform != "cpu"


def pallas_dia_mode(offs_a, offs_b, dc_list, n_out, config):
    """Static qualification: None | 'dense' | 'pairs'.

    'dense' is the stencil kernel (contiguous (D2, L) block adds; needs
    dense B and C offset ranges).  'pairs' is the generalized kernel for
    ARBITRARY band sets (pairbands-class gapped diagonals): one unrolled
    (1, L) row FMA per (d1, d2) product into the sparse dc row it maps
    to.  Same VMEM-window staging, no density precondition."""
    if not _platform_ok():
        return None
    if not offs_b or not offs_a:
        return None
    d1, d2 = len(offs_a), len(offs_b)
    dense_b = max(offs_b) - min(offs_b) + 1 == d2
    dc_dense = (max(offs_a) + max(offs_b)) - (min(offs_a) + min(offs_b)) + 1
    # the dense kernel maps product (d1, d2) to row (d1+d2) - dc_list[0]
    # in a DENSE row space; a gapped offs_a (spacing > len(offs_b)) would
    # misindex rows against the plan's sparse dc_list
    if (d1 <= MAX_D1 and dense_b and len(dc_list) == dc_dense
            and dc_dense <= MAX_DC_DENSE
            and d1 * d2 >= 4 * dc_dense):
        return "dense"
    # pairwise kernel: wins when the XLA path's per-product HBM traffic
    # dominates the window kernel's once-through operand+C traffic.
    # VMEM feasibility (window scratch scales with the A offset span)
    # gates it so gapped-band sets degrade to XLA, never crash Mosaic.
    if (d1 * d2 <= MAX_PAIRS and len(dc_list) <= MAX_DC_DENSE
            and n_out >= 4096 and d1 * d2 >= 2 * len(dc_list)
            and _pairs_vmem_ok(offs_a, offs_b, len(dc_list))):
        return "pairs"
    return None


def pallas_dia_applicable(offs_a, offs_b, dc_list, n_out, config) -> bool:
    """True iff the DENSE stencil kernel qualifies (back-compat shim)."""
    return pallas_dia_mode(offs_a, offs_b, dc_list, n_out,
                           config) == "dense"


def _kernel(a_ref, b_hbm, c_ref, cnt_ref, b_win, sem, *, l, win, c0a,
            offs_rel, row_bases, d2):
    g = pl.program_id(0)
    # DMA base and extent are both 128-aligned (Mosaic requires the lane
    # extent to be a multiple of the tiling); the residue of the global
    # column offset is folded into the static in-window slice starts.
    cp = pltpu.make_async_copy(
        b_hbm.at[:, pl.ds(g * l + c0a, win)], b_win, sem)
    cp.start()
    cp.wait()
    c_ref[:] = jnp.zeros_like(c_ref)
    values_only = cnt_ref is None
    if not values_only:
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        b_mask = (b_win[:] != 0).astype(jnp.float32)
    for k1 in range(len(offs_rel)):
        s1 = offs_rel[k1]
        base = row_bases[k1]
        sl = b_win[:, s1:s1 + l]
        a_row = a_ref[k1, :][None, :]
        c_ref[base:base + d2, :] += a_row * sl
        if not values_only:
            slm = b_mask[:, s1:s1 + l]
            am = (a_row != 0).astype(jnp.float32)
            cnt_ref[base:base + d2, :] += am * slm


def _kernel_values(a_ref, b_hbm, c_ref, b_win, sem, **kw):
    _kernel(a_ref, b_hbm, c_ref, None, b_win, sem, **kw)


def _kernel_pairs(a_ref, b_hbm, c_ref, cnt_ref, b_win, sem, *, l, win,
                  c0a, pair_specs):
    """Arbitrary-band-set variant: one static (1, L) row FMA per product.

    pair_specs = ((k1, k2, s1, c_row), ...) — every index compile-time
    static, so each product is a static in-window lane slice multiplied
    into a static C row (write-once exclusive ownership per block, as
    the reference's step 3, spgemm.cu:593-661)."""
    g = pl.program_id(0)
    cp = pltpu.make_async_copy(
        b_hbm.at[:, pl.ds(g * l + c0a, win)], b_win, sem)
    cp.start()
    cp.wait()
    c_ref[:] = jnp.zeros_like(c_ref)
    values_only = cnt_ref is None
    if not values_only:
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        b_mask = (b_win[:] != 0).astype(jnp.float32)
    for k1, k2, s1, row in pair_specs:
        a_row = a_ref[k1, :]
        c_ref[row, :] += a_row * b_win[k2, s1:s1 + l]
        if not values_only:
            am = (a_row != 0).astype(jnp.float32)
            cnt_ref[row, :] += am * b_mask[k2, s1:s1 + l]


def _kernel_pairs_values(a_ref, b_hbm, c_ref, b_win, sem, **kw):
    _kernel_pairs(a_ref, b_hbm, c_ref, None, b_win, sem, **kw)


@functools.partial(jax.jit, static_argnames=("offs_a", "offs_b", "dc_list",
                                             "n_out", "values_only", "mode",
                                             "interpret"))
def dia_multiply_pallas(a_bands, b_bands, *, offs_a, dc_list, n_out,
                        offs_b=None, mode="dense", values_only=False,
                        interpret=False):
    """(c_bands, c_counts) over the C offset rows dc_list.

    mode='dense' is the stencil kernel (dc_list must be the dense sum
    range); mode='pairs' handles ARBITRARY band sets (requires offs_b)
    with one unrolled row FMA per (d1, d2) product.  values_only=True
    runs the half-work kernel (no mask algebra, no count output) and
    returns (c_bands, None) — used by DiaPlan replays after the
    structural counts are cached."""
    d1, n_i = a_bands.shape
    d2_real, n_k = b_bands.shape
    # Mosaic requires the window DMA's sublane extent to be a multiple of
    # the tiling (8): pad B's band stack with zero rows (their products
    # are zero; the extra accumulator rows are sliced off at the end).
    d2 = -(-d2_real // 8) * 8
    if d2 > d2_real:
        b_bands = jnp.pad(b_bands, ((0, d2 - d2_real), (0, 0)))
    min_d1, max_d1 = min(offs_a), max(offs_a)
    span = max_d1 - min_d1
    dc_dense = len(dc_list)
    if mode == "pairs":
        dc_pad = -(-dc_dense // 8) * 8
        l = _choose_block_pairs(d1, d2, dc_pad, span,
                                n_pairs=d1 * d2_real,
                                with_cnt=not values_only)
    else:
        dc_pad = dc_dense + (d2 - d2_real)
        l = _choose_block(d1, d2, dc_pad, span)
    g = -(-n_out // l)
    n_pad = g * l

    # pad A to the block grid; pad B so every window read is in bounds:
    # global padded B column for (block g, shift d1, lane i) is
    # g*l + c0 + (d1 - min_d1) + i with c0 = pad_l + min_d1 >= 0.
    # The DMA base must be lane-aligned and its extent a multiple of 128
    # (Mosaic tiling): split c0 = c0a + rem with c0a aligned, fold rem
    # into the in-window offsets, and round the window extent up.
    pad_l = max(0, -min_d1)
    c0 = pad_l + min_d1
    c0a = (c0 // 128) * 128
    rem = c0 - c0a
    win = -(-(rem + l + span) // 128) * 128
    width_b = (g - 1) * l + c0a + win
    ap = jnp.pad(a_bands.astype(jnp.float32), ((0, 0), (0, n_pad - n_i)))
    bp = jnp.pad(b_bands.astype(jnp.float32),
                 ((0, 0), (pad_l, max(0, width_b - pad_l - n_k))))

    if mode == "pairs":
        # per-product static layout: (A row, B row, in-window lane start,
        # sparse dc row index).  The window shift depends on d1 alone.
        pos = {dc: i for i, dc in enumerate(dc_list)}
        pair_specs = tuple(
            (k1, k2, int(rem + da - min_d1), pos[da + db])
            for k1, da in enumerate(offs_a)
            for k2, db in enumerate(offs_b))
        kw = dict(l=l, win=win, c0a=c0a, pair_specs=pair_specs)
        kernel = functools.partial(
            _kernel_pairs_values if values_only else _kernel_pairs, **kw)
    else:
        # per-A-band static layout: in-window slice start and C row base.
        # dc_list is the dense sum range, dc_list[0] = min_d1 +
        # min(offs_b), so the row of product (d1, d2) is (d1 + d2) -
        # dc_list[0] and the D2 rows of one d1 are contiguous starting at
        # d1 - min_d1.
        assert dc_list[0] == min_d1 + (dc_list[-1] - max_d1
                                       - (d2_real - 1)), \
            "dc_list must be the dense sum range"
        offs_rel = tuple(int(rem + d - min_d1) for d in offs_a)
        row_bases = tuple(int(d - min_d1) for d in offs_a)
        kw = dict(l=l, win=win, c0a=c0a, offs_rel=offs_rel,
                  row_bases=row_bases, d2=d2)
        kernel = functools.partial(
            _kernel_values if values_only else _kernel, **kw)
    n_outs = 1 if values_only else 2
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((d1, l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((dc_pad, l), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(n_outs)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((dc_pad, n_pad), jnp.float32)
            for _ in range(n_outs)),
        scratch_shapes=[
            pltpu.VMEM((d2, win), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(ap, bp)
    if values_only:
        return out[0][:dc_dense, :n_out], None
    return out[0][:dc_dense, :n_out], out[1][:dc_dense, :n_out]
