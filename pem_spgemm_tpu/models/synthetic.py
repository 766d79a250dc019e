"""Synthetic sparse-matrix generators — the benchmark corpus.

The reference benchmarks on SuiteSparse matrices (README.md:18,58; named:
webbase-1M).  This environment has no network access to sparse.tamu.edu, so
the benchmark corpus is generated: deterministic families that span the
structural regimes SpGEMM cares about —

  * banded        : diagonal stencils (mc2depi-like; dense tiles, regular
                    tile-row lengths)
  * power_law     : scale-free row/col degree distribution (webbase-1M /
                    scircuit-like; hot rows, skewed tile fill)
  * rmat          : recursive Kronecker graph (graph-analytics regime,
                    community blocks)
  * uniform_random: worst case for tiling (near-1 nnz per tile)

All generators return canonical COOMatrix (sorted, duplicates summed) and
are deterministic in (seed, parameters).
"""

from __future__ import annotations

import numpy as np

from pem_spgemm_tpu.formats.coo import COOMatrix


def _canonical(rows, cols, vals, shape) -> COOMatrix:
    return COOMatrix(rows, cols, vals, shape).sum_duplicates()


def banded(n: int, bands=(0, 1, -1, 16, -16, 200, -200), value: float = 0.0,
           seed: int = 0) -> COOMatrix:
    """Diagonal-stencil matrix; value=0 draws random values."""
    rs = np.random.default_rng(seed)
    bs = np.array(sorted(set(int(b) for b in bands)), np.int64)
    # Build row-major directly (rows x bands grid, masked at the borders):
    # distinct bands cannot collide, so the result is canonical without the
    # O(nnz log nnz) host lexsort (which dominated generation at 10^8 nnz).
    cols_mat = np.arange(n, dtype=np.int64)[:, None] + bs[None, :]
    valid = (cols_mat >= 0) & (cols_mat < n)
    rows = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None],
                           cols_mat.shape)[valid]
    cols = cols_mat[valid].astype(np.int32)
    vals = (np.full(len(rows), value) if value
            else rs.standard_normal(len(rows)))
    return COOMatrix(rows, cols, vals, (n, n))


def power_law(n: int, nnz: int, alpha: float = 2.1, seed: int = 0,
              locality: float = 0.7, hub_correlation: float = 1.0) -> COOMatrix:
    """Scale-free row-degree matrix with tunable column locality
    (webbase-1M-like: hot rows, mostly-local links).

    Every row gets a Pareto-distributed degree scaled so the total lands
    near `nnz`; a `locality` fraction of each row's columns are drawn from
    a +-256 window around the row index, the rest from a Zipf-popular
    global column set.  Duplicates are summed, costing a few percent of
    nnz at most (unlike naive iid zipf sampling, which collapses).

    `hub_correlation` controls whether popular columns point AT high-degree
    rows (webs: hubs link to hubs).  This drives the A@A intermediate-product
    count flop = sum_j colcnt(j)*rowdeg(j): at 1.0 the Zipf column ranks map
    onto rows in descending-degree order, reproducing webbase-1M-like
    compression (products/nnz ~ 20); at 0.0 the mapping is a random
    permutation and the product stays near-diagonal-sparse (products/nnz ~ 2).
    """
    rs = np.random.default_rng(seed)
    raw = (1.0 - rs.random(n)) ** (-1.0 / (alpha - 1.0))   # Pareto >= 1
    raw = np.minimum(raw, n / 8)                           # cap hub rows
    deg_f = raw * (nnz / raw.sum())
    deg = deg_f.astype(np.int64)
    deg += rs.random(n) < (deg_f - deg)                    # stochastic round
    total = int(deg.sum())
    rows = np.repeat(np.arange(n, dtype=np.int32), deg)
    local = rs.random(total) < locality
    off = rs.integers(-256, 257, total)
    near = np.clip(rows.astype(np.int64) + off, 0, n - 1).astype(np.int32)
    u2 = rs.random(total)
    ranks2 = np.minimum((u2 ** (-1.0 / (alpha - 1.0)) - 1.0).astype(np.int64),
                        n - 1)
    # Zipf rank -> column id: rank 0 = most popular.  Correlated mapping
    # sends low ranks to the highest-degree rows.
    by_degree = np.argsort(-deg, kind="stable").astype(np.int32)
    perm = rs.permutation(n).astype(np.int32)
    corr = rs.random(total) < hub_correlation
    far = np.where(corr, by_degree[ranks2], perm[ranks2])
    cols = np.where(local, near, far)
    vals = rs.standard_normal(total)
    return _canonical(rows, cols, vals, (n, n))


def rmat(scale: int, edge_factor: int = 8, seed: int = 0,
         probs=(0.57, 0.19, 0.19, 0.05)) -> COOMatrix:
    """R-MAT / Kronecker graph: n = 2**scale, ~edge_factor*n edges."""
    rs = np.random.default_rng(seed)
    n = 1 << scale
    m = edge_factor * n
    a, b, c, _d = probs
    rows = np.zeros(m, np.int64)
    cols = np.zeros(m, np.int64)
    for bit in range(scale):
        u = rs.random(m)
        r_bit = u >= a + b                     # quadrants c+d set the row bit
        c_bit = ((u >= a) & (u < a + b)) | (u >= a + b + c)  # b or d
        rows |= r_bit.astype(np.int64) << bit
        cols |= c_bit.astype(np.int64) << bit
    vals = rs.standard_normal(m)
    return _canonical(rows.astype(np.int32), cols.astype(np.int32), vals,
                      (n, n))


def uniform_random(n_rows: int, n_cols: int, nnz: int,
                   seed: int = 0) -> COOMatrix:
    rs = np.random.default_rng(seed)
    return _canonical(rs.integers(0, n_rows, nnz).astype(np.int32),
                      rs.integers(0, n_cols, nnz).astype(np.int32),
                      rs.standard_normal(nnz), (n_rows, n_cols))


def banded_device(n: int, bands=(0, 1, -1, 16, -16), seed: int = 0
                  ) -> COOMatrix:
    """banded(), generated directly on the accelerator.

    Identical structure to banded() (values differ: jax PRNG, same
    distribution).  For 10^8-nnz benchmark inputs this replaces a
    multi-GB host->device transfer with on-device iota arithmetic — the
    benchmark analog of reading from fast local storage rather than a
    slow link (the H2D path itself is still measured by the harness's
    total conversion overhead on host-generated inputs).
    """
    import jax
    import jax.numpy as jnp
    bs = sorted(set(int(b) for b in bands))
    nb = len(bs)

    # One broadcast (nb, n) grid instead of a per-band unrolled loop: the
    # loop version's XLA program (and compile time) scaled with the band
    # count — 128 bands took minutes to compile, which blew the driver's
    # bench budget in round 3.  The border-drop compaction ALSO lives in
    # the same jit (one gather): the earlier host-side per-band slicing
    # issued ~3 eager ops per band, each a seconds-long roundtrip through
    # this platform's remote compile service (~70 s for 64 bands).
    # Border counts are static per band, so the compacted size is static:
    # dst position j in band i maps to src i*n + (j - dst_start[i]) + lo_i.
    lo = [max(0, -b) for b in bs]
    hi = [min(n, n - b) for b in bs]
    dst_starts = np.concatenate([[0], np.cumsum([h - l for l, h
                                                 in zip(lo, hi)])])
    total = int(dst_starts[-1])

    @jax.jit
    def gen():
        r = jnp.arange(n, dtype=jnp.int32)
        bs_dev = jnp.asarray(bs, jnp.int32)
        c = bs_dev[:, None] + r[None, :]               # (nb, n) band-major
        vals2 = jax.random.normal(jax.random.PRNGKey(seed), (nb, n),
                                  jnp.float32)
        j = jnp.arange(total, dtype=jnp.int32)
        band = jnp.searchsorted(jnp.asarray(dst_starts[1:], jnp.int32), j,
                                side="right").astype(jnp.int32)
        src = (band * n + jnp.asarray(lo, jnp.int32)[band]
               + (j - jnp.asarray(dst_starts[:-1], jnp.int32)[band]))
        rows2 = jnp.broadcast_to(r[None, :], (nb, n)).ravel()
        return (rows2[src], c.ravel()[src], vals2.ravel()[src])

    rows, cols, vals = gen()
    return COOMatrix(rows, cols, vals, (n, n))


def wandering_device(n: int, width: int = 64, block: int = 128,
                     step_max: int = 2, seed: int = 0) -> COOMatrix:
    """Irregular-macro regime: a dense band whose center WANDERS.

    Each 128-row block g carries a ``width``-wide dense band centered at
    column ``i + 128*m_g``, where m_g is a reflected random walk (steps
    in [-step_max, step_max]).  Locally this is exactly banded64-like
    (dense 16x16 tiles, dense-ish 128x128 macro tiles, identical nnz and
    flop profile), but globally:

      * the diagonal census is ~64 * (#distinct walk values) >> 512, so
        the DIA tier refuses it (ops/dia.detect_dia);
      * the macro pair stream has no periodic signature, so the stencil
        macro planner's coverage collapses and the GENERIC macro path
        must carry it — the benchmark the reference's step 3
        (spgemm.cu:593-661) handles with no structural precondition.

    Offsets are multiples of ``block`` so macro tiles stay aligned; the
    walk is reflected into per-block bounds so every element is in
    range: nnz == n * width exactly.
    """
    import jax
    import jax.numpy as jnp
    assert n % block == 0, "n must be a multiple of block"
    nb = n // block
    w2 = width // 2
    rs = np.random.default_rng(seed)
    steps = rs.integers(-step_max, step_max + 1, nb)
    m = np.empty(nb, np.int64)
    cur = 1                                   # m_0 >= 1 keeps col-32 >= 0
    for g in range(nb):
        cur = int(np.clip(cur + steps[g], 1 - g, nb - g - 2))
        m[g] = cur
    m_dev = jnp.asarray(m, jnp.int32)

    # One broadcast (width, n) grid — see banded_device for why the
    # per-offset unrolled-loop formulation was replaced.
    @jax.jit
    def gen():
        r = jnp.arange(n, dtype=jnp.int32)
        center = r + jnp.int32(block) * m_dev[r // block]
        ks = jnp.arange(-w2, width - w2, dtype=jnp.int32)
        cols2 = ks[:, None] + center[None, :]          # (width, n) k-major
        rows2 = jnp.broadcast_to(r[None, :], cols2.shape)
        vals2 = jax.random.normal(jax.random.PRNGKey(seed), (width, n),
                                  jnp.float32)
        return (rows2.ravel(), cols2.ravel(), vals2.ravel())

    rows, cols, vals = gen()
    return COOMatrix(rows, cols, vals, (n, n))


def by_name(spec: str) -> COOMatrix:
    """Parse 'family:k=v,k=v' benchmark specs, e.g. 'banded:n=200000'."""
    name, _, argstr = spec.partition(":")
    kwargs = {}
    if argstr:
        for part in argstr.split(","):
            k, _, v = part.partition("=")
            kwargs[k] = float(v) if "." in v else int(v)
    fams = {"banded": banded, "power_law": power_law, "rmat": rmat,
            "uniform_random": uniform_random,
            "wandering": wandering_device}
    if name not in fams:
        raise ValueError(f"unknown synthetic family {name!r}; "
                         f"one of {sorted(fams)}")
    return fams[name](**kwargs)
