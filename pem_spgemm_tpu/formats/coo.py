"""Host-side COO container.

The reference reads MatrixMarket into pinned-host COO triplets
(read_matrix_market, spgemm.cu:43-110) and transposes for the A@A.T mode by
swapping the triplets (spgemm.cu:788-792).  This is the same boundary object:
plain numpy arrays on the host, handed to the jitted conversion pipeline.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _is_device_array(x) -> bool:
    """True for jax arrays (without importing jax at module load)."""
    return type(x).__module__.startswith("jax")


@dataclasses.dataclass
class COOMatrix:
    """COO triplets on the host. rows/cols int32, vals any float dtype."""

    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    shape: tuple  # (n_rows, n_cols)

    def __post_init__(self):
        # Device (jax) triplets stay on device: coercing them through numpy
        # would round-trip the data over the host boundary — in particular
        # it silently moved the H2D transfer INSIDE the timed conversion
        # kernels in the benchmark harness.
        if not _is_device_array(self.rows):
            self.rows = np.ascontiguousarray(self.rows, dtype=np.int32)
        if not _is_device_array(self.cols):
            self.cols = np.ascontiguousarray(self.cols, dtype=np.int32)
        if not _is_device_array(self.vals):
            self.vals = np.ascontiguousarray(self.vals)
        if not (len(self.rows) == len(self.cols) == len(self.vals)):
            raise ValueError("COO triplet arrays must have equal length")

    @property
    def nnz(self) -> int:
        return int(len(self.vals))

    def transpose(self) -> "COOMatrix":
        """A.T by swapping triplets (reference AAt mode, spgemm.cu:788-792)."""
        return COOMatrix(self.cols, self.rows, self.vals,
                         (self.shape[1], self.shape[0]))

    def to_scipy(self):
        import scipy.sparse as sp
        return sp.coo_matrix(
            (np.asarray(self.vals), (np.asarray(self.rows),
                                     np.asarray(self.cols))),
            shape=self.shape)

    @staticmethod
    def from_scipy(m) -> "COOMatrix":
        m = m.tocoo()
        return COOMatrix(m.row, m.col, m.data, m.shape)

    def sum_duplicates(self) -> "COOMatrix":
        """Canonicalize: sort by (row, col) and sum duplicate coordinates.

        MatrixMarket files are coordinate lists that may repeat entries; the
        bitmask tile format requires each (row, col) at most once.
        """
        order = np.lexsort((self.cols, self.rows))
        r, c, v = self.rows[order], self.cols[order], self.vals[order]
        if len(r) == 0:
            return COOMatrix(r, c, v, self.shape)
        first = np.empty(len(r), dtype=bool)
        first[0] = True
        first[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        idx = np.cumsum(first) - 1
        out_v = np.zeros(int(idx[-1]) + 1, dtype=v.dtype)
        np.add.at(out_v, idx, v)
        return COOMatrix(r[first], c[first], out_v, self.shape)
