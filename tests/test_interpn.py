"""Ports of the reference's `test/test_interpn.py` bounds-check tests plus
additional coverage of the one-shot helper's dispatch."""

import numpy as np
import pytest

from interpn_tpu import interpn


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_interpn_check_bounds_regular(dtype):
    grid = np.linspace(-1.0, 1.0, 5).astype(dtype)
    vals = np.linspace(0.0, 10.0, grid.size).astype(dtype)

    obs_inside = [np.array([-0.5, 0.5], dtype=dtype)]
    obs_outside = [np.array([-0.5, 1.5], dtype=dtype)]

    inside = interpn(
        obs=obs_inside, grids=[grid], vals=vals, method="linear", check_bounds=True
    )
    assert inside.shape == obs_inside[0].shape

    with pytest.raises(ValueError):
        interpn(
            obs=obs_outside, grids=[grid], vals=vals, method="linear",
            check_bounds=True,
        )


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_interpn_check_bounds_rectilinear(dtype):
    grid = np.array([-1.0, -0.25, 0.5, 2.0], dtype=dtype)
    vals = np.linspace(0.0, 10.0, grid.size).astype(dtype)

    obs_inside = [np.array([-0.5, 1.0], dtype=dtype)]
    obs_outside = [np.array([-1.5, 0.25], dtype=dtype)]

    inside = interpn(
        obs=obs_inside, grids=[grid], vals=vals, method="linear", check_bounds=True
    )
    assert inside.shape == obs_inside[0].shape

    with pytest.raises(ValueError):
        interpn(
            obs=obs_outside, grids=[grid], vals=vals, method="linear",
            check_bounds=True,
        )


def test_interpn_rejects_other_dtypes():
    grid = np.linspace(-1.0, 1.0, 5)
    with pytest.raises(AssertionError):
        interpn(
            obs=[np.array([0.0])],
            grids=[grid],
            vals=np.arange(5, dtype=np.int64),
        )


def test_interpn_out_reshape():
    """Output adopts the shape of the preallocated `out`."""
    grid = np.linspace(0.0, 1.0, 5)
    vals = grid.copy()
    obs = [np.linspace(0, 1, 6)]
    out = np.zeros((2, 3))
    res = interpn(obs=obs, grids=[grid], vals=vals, out=out)
    assert res.shape == (2, 3)
    np.testing.assert_allclose(res.ravel(), obs[0], atol=1e-15)


def test_interpn_regularity_autodetect_dispatch():
    """A not-exactly-regular grid must dispatch to the rectilinear kernel and
    still give correct results."""
    grid = np.array([0.0, 1.0, 2.0, 3.0 + 1e-9])
    vals = 2.0 * grid
    res = interpn(obs=[np.array([2.5])], grids=[grid], vals=vals)
    np.testing.assert_allclose(res, [5.0], atol=1e-7)


def test_empty_observation_batch():
    """Zero observation points is a valid (if silly) call on every path."""
    grid = np.linspace(0.0, 1.0, 5)
    vals = grid.copy()
    empty = [np.array([], dtype=np.float64)]
    out = interpn(obs=empty, grids=[grid], vals=vals)
    assert out.shape == (0,)

    import interpn_tpu as it

    m = it.MultilinearRegular.new([5], np.zeros(1), np.full(1, 0.25), vals)
    r = m.eval(empty)
    assert r.shape == (0,)


def test_interpn_noncontiguous_out_is_filled():
    """ravel() of a non-contiguous `out` returns a copy; interpn must fold
    results back into the caller's buffer instead of silently decoupling
    (the reference has this flaw; we keep the in-place contract)."""
    x = np.linspace(0.0, 4.0, 5)
    vals = 2.0 * x
    big = np.zeros((3, 4))
    out = big[:, 1]  # non-contiguous column view
    obs = [np.array([1.0, 2.5, 3.0])]
    res = interpn(obs, [x], vals, method="linear", out=out)
    np.testing.assert_allclose(out, [2.0, 5.0, 6.0])
    np.testing.assert_allclose(big[:, 1], [2.0, 5.0, 6.0])
    assert res is out
