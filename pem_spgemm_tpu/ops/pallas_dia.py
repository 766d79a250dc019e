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
VMEM_BUDGET = 72 << 20  # bytes for the per-block working set


def _choose_block(d1, d2, dc, span) -> int:
    """Largest lane-aligned block length fitting the VMEM budget."""
    per_col = 4 * (d1 + d2 + 2 * dc + 2 * d2)   # + term temporaries
    l = VMEM_BUDGET // per_col
    l = max(512, min(1 << 16, (l // 512) * 512))
    return int(l)


def pallas_dia_applicable(offs_a, offs_b, dc_list, n_out, config) -> bool:
    """Static qualification for the Pallas path."""
    if jax.devices()[0].platform == "cpu":
        return False
    if not offs_b or not offs_a or len(offs_a) > MAX_D1:
        return False
    if max(offs_b) - min(offs_b) + 1 != len(offs_b):
        return False                       # B offsets must be dense
    dc_dense = (max(offs_a) + max(offs_b)) - (min(offs_a) + min(offs_b)) + 1
    if dc_dense > MAX_DC_DENSE:
        return False
    # worth it only when the XLA path's product traffic dominates:
    # products ~ D1 * D2 * n vs C size dc * n
    return len(offs_a) * len(offs_b) >= 4 * dc_dense


def _kernel(a_ref, b_hbm, c_ref, cnt_ref, b_win, sem, *, l, span, c0,
            offs_rel, row_bases, d2):
    g = pl.program_id(0)
    cp = pltpu.make_async_copy(
        b_hbm.at[:, pl.ds(g * l + c0, l + span)], b_win, sem)
    cp.start()
    cp.wait()
    c_ref[:] = jnp.zeros_like(c_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)
    b_mask = (b_win[:] != 0).astype(jnp.float32)
    for k1 in range(len(offs_rel)):
        s1 = offs_rel[k1]
        base = row_bases[k1]
        sl = b_win[:, s1:s1 + l]
        slm = b_mask[:, s1:s1 + l]
        a_row = a_ref[k1, :][None, :]
        am = (a_row != 0).astype(jnp.float32)
        c_ref[base:base + d2, :] += a_row * sl
        cnt_ref[base:base + d2, :] += am * slm


@functools.partial(jax.jit, static_argnames=("offs_a", "dc_list", "n_out",
                                             "interpret"))
def dia_multiply_pallas(a_bands, b_bands, *, offs_a, dc_list, n_out,
                        interpret=False):
    """(c_bands, c_counts) over the DENSE dc range dc_list."""
    d1, n_i = a_bands.shape
    d2, n_k = b_bands.shape
    min_d1, max_d1 = min(offs_a), max(offs_a)
    span = max_d1 - min_d1
    dc_dense = len(dc_list)
    l = _choose_block(d1, d2, dc_dense, span)
    g = -(-n_out // l)
    n_pad = g * l

    # pad A to the block grid; pad B so every window read is in bounds:
    # global padded B column for (block g, shift d1, lane i) is
    # g*l + c0 + (d1 - min_d1) + i with c0 = pad_l + min_d1 >= 0
    pad_l = max(0, -min_d1)
    c0 = pad_l + min_d1
    width_b = n_pad + c0 + span
    ap = jnp.pad(a_bands.astype(jnp.float32), ((0, 0), (0, n_pad - n_i)))
    bp = jnp.pad(b_bands.astype(jnp.float32),
                 ((0, 0), (pad_l, max(0, width_b - pad_l - n_k))))

    # per-A-band static layout: in-window slice start and C row base.
    # dc_list is the dense sum range, dc_list[0] = min_d1 + min(offs_b),
    # so the row of product (d1, d2) is (d1 + d2) - dc_list[0] and the
    # D2 rows of one d1 are contiguous starting at d1 - min_d1.
    assert dc_list[0] == min_d1 + (dc_list[-1] - max_d1 - (d2 - 1)), \
        "dc_list must be the dense sum range"
    offs_rel = tuple(int(d - min_d1) for d in offs_a)
    row_bases = tuple(int(d - min_d1) for d in offs_a)

    kernel = functools.partial(_kernel, l=l, span=span, c0=c0,
                               offs_rel=offs_rel, row_bases=row_bases,
                               d2=d2)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((d1, l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((dc_dense, l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dc_dense, l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((dc_dense, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((dc_dense, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d2, l + span), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(ap, bp)
    return out[0][:, :n_out], out[1][:, :n_out]
