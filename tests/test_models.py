"""Synthetic matrix generators: determinism and canonical form."""

import numpy as np
import pytest

from pem_spgemm_tpu.models import synthetic


def _assert_canonical(m):
    order = np.lexsort((m.cols, m.rows))
    assert (order == np.arange(m.nnz)).all()
    keys = m.rows.astype(np.int64) * m.shape[1] + m.cols
    assert len(np.unique(keys)) == m.nnz  # no duplicates


@pytest.mark.parametrize("spec", [
    "banded:n=1000",
    "power_law:n=5000,nnz=20000",
    "rmat:scale=10,edge_factor=4",
    "uniform_random:n_rows=500,n_cols=700,nnz=3000",
])
def test_generators(spec):
    m1 = synthetic.by_name(spec)
    m2 = synthetic.by_name(spec)
    _assert_canonical(m1)
    assert m1.nnz == m2.nnz
    np.testing.assert_array_equal(m1.rows, m2.rows)
    np.testing.assert_array_equal(m1.vals, m2.vals)
    assert (m1.rows >= 0).all() and (m1.rows < m1.shape[0]).all()
    assert (m1.cols >= 0).all() and (m1.cols < m1.shape[1]).all()


def test_power_law_is_skewed():
    m = synthetic.power_law(n=20000, nnz=100000, seed=1)
    deg = np.bincount(m.rows, minlength=m.shape[0])
    # scale-free: max row degree far above the mean
    assert deg.max() > 20 * deg.mean()


def test_bad_family():
    with pytest.raises(ValueError, match="unknown synthetic family"):
        synthetic.by_name("nope:n=3")
