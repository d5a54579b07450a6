"""1D fast-path tests, porting the reference's one_dim suite
(`src/one_dim/linear.rs:96-180`, `src/one_dim/hold.rs:118-180`)."""

import numpy as np
import pytest

from interpn_tpu.ops.one_dim import (
    Left1D,
    Linear1D,
    LinearHoldLast1D,
    Nearest1D,
    RectilinearGrid1D,
    RegularGrid1D,
    Right1D,
)


def _setup(n=77, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal(n)
    start, stop = -3.14, 314.0
    x_reg = np.linspace(start, stop, n)
    x_rect = np.sort(rng.standard_normal(n)) * (stop - start) + start
    locs = rng.standard_normal(3 * n) * 2.0 * (stop - start) + 2.0 * start
    return vals, x_reg, x_rect, locs


def _bracket(xs, loc):
    j = int(np.searchsorted(xs, loc, side="left")) - 1
    return min(max(j, 0), len(xs) - 2)


def test_linear_1d_regular_and_rectilinear():
    vals, x_reg, x_rect, locs = _setup()
    for xs, grid in [
        (x_reg, RegularGrid1D(x_reg[0], x_reg[1] - x_reg[0], vals)),
        (x_rect, RectilinearGrid1D(x_rect, vals)),
    ]:
        ys = np.asarray(Linear1D(grid).eval(locs))
        for i, loc in enumerate(locs):
            j = _bracket(xs, loc)
            slope = (vals[j + 1] - vals[j]) / (xs[j + 1] - xs[j])
            expected = vals[j] + slope * (loc - xs[j])
            assert abs((ys[i] - expected) / expected) < 1e-9


def test_linear_hold_last_1d():
    vals, x_reg, x_rect, locs = _setup()
    for xs, grid in [
        (x_reg, RegularGrid1D(x_reg[0], x_reg[1] - x_reg[0], vals)),
        (x_rect, RectilinearGrid1D(x_rect, vals)),
    ]:
        ys = np.asarray(LinearHoldLast1D(grid).eval(locs))
        for i, loc in enumerate(locs):
            if loc < xs[0]:
                assert ys[i] == vals[0]
            elif loc > xs[-1]:
                assert ys[i] == vals[-1]


def test_hold_1d():
    vals, x_reg, _, locs = _setup(seed=1)
    grid = RegularGrid1D(x_reg[0], x_reg[1] - x_reg[0], vals)
    y_left = np.asarray(Left1D(grid).eval(locs))
    y_right = np.asarray(Right1D(grid).eval(locs))
    y_near = np.asarray(Nearest1D(grid).eval(locs))
    for i, loc in enumerate(locs):
        j = _bracket(x_reg, loc)
        yl, yr = vals[j], vals[j + 1]
        if loc < x_reg[0]:
            assert y_left[i] == yl and y_right[i] == yl
        elif loc > x_reg[-1]:
            assert y_left[i] == yr and y_right[i] == yr
        else:
            assert y_left[i] == yl and y_right[i] == yr
        expected_near = yl if (loc - x_reg[j]) <= (x_reg[j + 1] - loc) else yr
        assert y_near[i] == expected_near


def test_one_dim_regular_unrepresentable_locations_nan():
    """The REGULAR reference grid errors on any location whose cell index
    is unrepresentable as isize — non-finite or huge finite
    ("Unrepresentable number", src/one_dim/mod.rs:99-115). The batched
    kernels cannot raise per point, so the documented deviation is NaN
    out — never a plausible-looking grid value (floor(NaN) previously
    cast to index 0 and Nearest1D returned vals[1])."""
    vals = np.array([10.0, 20.0, 30.0])
    locs = np.array([np.nan, np.inf, -np.inf, 1e300, -1e300, 1.0])
    grid = RegularGrid1D(0.0, 1.0, vals)
    for cls in (Linear1D, LinearHoldLast1D, Left1D, Right1D, Nearest1D):
        out = np.asarray(cls(grid).eval(locs))
        assert np.all(np.isnan(out[:5])), (cls.__name__, out)
        assert np.isfinite(out[5])


def test_one_dim_rectilinear_nonfinite_reference_values():
    """The RECTILINEAR reference grid never errors on non-finite
    locations (pure bisection, src/one_dim/mod.rs:152-166): NaN locates
    at the LOW edge cell with Inside extrapolation status, inf at the
    edges, and each interpolant's own arithmetic decides the value —
    per-point reference semantics, checked case by case."""
    vals = np.array([10.0, 20.0, 30.0])
    grid = RectilinearGrid1D(np.array([0.0, 1.0, 2.0]), vals)
    locs = np.array([np.nan, np.inf, -np.inf])
    # reference: match dx1 >= dx0 {true => y0, false => y1} with NaN
    # comparisons false -> y1; at +/-inf both distances are inf -> y0
    np.testing.assert_array_equal(
        np.asarray(Nearest1D(grid).eval(locs))[1:], [20.0, 10.0]
    )
    assert np.asarray(Nearest1D(grid).eval(locs))[0] == 20.0
    # Left1D: y1 only when OutsideHigh; NaN is "Inside" at the low cell
    np.testing.assert_array_equal(
        np.asarray(Left1D(grid).eval(locs)), [10.0, 30.0, 10.0]
    )
    # Right1D: y0 only when OutsideLow
    np.testing.assert_array_equal(
        np.asarray(Right1D(grid).eval(locs)), [20.0, 30.0, 10.0]
    )
    # LinearHoldLast1D holds edges at inf; NaN takes the interior branch
    hold = np.asarray(LinearHoldLast1D(grid).eval(locs))
    assert np.isnan(hold[0]) and hold[1] == 30.0 and hold[2] == 10.0
    # Linear1D: slope arithmetic carries NaN/inf through
    lin = np.asarray(Linear1D(grid).eval(locs))
    assert np.isnan(lin[0]) and lin[1] == np.inf and lin[2] == -np.inf


def test_one_dim_out_param_and_length_mismatch():
    """`eval(locs, out)` mirrors the reference's `Interp1D::eval(locs, out)`
    (src/one_dim/mod.rs:51-61): writes into the caller's buffer, returns it,
    and raises "Length mismatch" on a size disagreement."""
    vals = np.array([1.0, 2.0, 4.0])
    interp = Linear1D(RegularGrid1D(0.0, 1.0, vals))
    out = np.zeros(3)
    ret = interp.eval(np.array([0.5, 1.5, 2.5]), out)
    assert ret is out
    np.testing.assert_allclose(out, [1.5, 3.0, 5.0])
    with pytest.raises(ValueError, match="Length mismatch"):
        interp.eval(np.zeros(2), np.zeros(3))


def test_one_dim_grid_construction_length_mismatch():
    """Rectilinear construction enforces the reference's contract
    (grid/vals same length, >= 2 points; src/one_dim/mod.rs:148-154).
    Regular grids also refuse < 2 points (the reference's index() would
    underflow `len - 2` there — debug panic; refusing up front is the
    batched-safe version)."""
    with pytest.raises(ValueError, match="Length mismatch"):
        RectilinearGrid1D(np.arange(3.0), np.arange(4.0))
    with pytest.raises(ValueError, match="Length mismatch"):
        RectilinearGrid1D(np.arange(1.0), np.arange(1.0))
    with pytest.raises(ValueError, match="Length mismatch"):
        RegularGrid1D(0.0, 1.0, np.array([1.0]))
