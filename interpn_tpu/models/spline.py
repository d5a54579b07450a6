"""Persistent model classes for the spline extension methods.

The extension methods — ``pchip`` (monotone cubic, scipy semantics),
``cubic_spline`` / ``quintic`` (global not-a-knot tensor-product splines,
scipy RGI cubic/quintic semantics) — have no reference analogue, but the
reference's defining pattern is that every method gets a frozen pydantic
class with ``.new()/.eval()/.check_bounds()`` and a byte-stable JSON wire
format (`/root/reference/src/interpn/multicubic_regular.py:24-234`,
`serialization.py:18-77`). These two classes extend that pattern to the
spline family: one generalized model per grid kind, discriminated by a
``method`` field, in the established Array wire format.

Beyond parity with the house model API, the classes carry the spline
methods' expensive one-time work correctly:

* ``cubic_spline`` / ``quintic``: the per-axis collocation solves
  (`ops/bspline.py`) run ONCE, lazily, on first evaluation — through the
  content-keyed prep cache, so even rebuilding a model from JSON reuses a
  previous solve for the same table. Coefficients solve in float64 on the
  host regardless of model dtype; evaluation runs in the model dtype.
* ``pchip`` is nonlinear in the data (no precomputable basis); it
  evaluates through the tensor-product PCHIP gather engine
  (`ops/pchip.py`) with scipy's recursion order.
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray
from pydantic import model_validator

from ._base import InterpolatorBase, RectilinearGridMixin, RegularGridMixin, arrtype_for, prod_dims
from .serialization import Array

_DEGREE = {"cubic_spline": 3, "quintic": 5}
_WORDS = {4: "four", 6: "six"}


def _min_points(method: str) -> int:
    return 4 if method == "pchip" else _DEGREE[method] + 1


class _SplineBase(InterpolatorBase):
    """Shared eval plumbing for the two spline model classes.

    Subclasses declare the ``method`` field (after their grid fields, so
    it serializes last — matching the reference convention of trailing
    config fields, cf. ``linearize_extrapolation``)."""

    def _check_grid_sizes(self):
        # per-method stencil floor (the base class floor is a ClassVar;
        # here it depends on the `method` field)
        if self._grid_ok is None:
            floor = _min_points(self.method)
            object.__setattr__(
                self,
                "_grid_ok",
                all(int(d) >= floor for d in self._grid_sizes()),
            )
        if not self._grid_ok:
            n = _min_points(self.method)
            raise AssertionError(
                f"All grids must have at least {_WORDS.get(n, n)} entries"
            )

    def _spline_constants(self, grids_host, vals_host):
        """(knots, coeffs, k) device constants for the B-spline methods.

        The collocation solves run on HOST float64 (tables are concrete by
        model construction) through the content-keyed cache; knots and
        coefficients are then cast to the model dtype for device eval."""
        from ..ops import bspline as _bspline

        k = _DEGREE[self.method]
        knots, coeffs = _bspline.prep_bspline_cached(
            [np.asarray(g, dtype=np.float64) for g in grids_host],
            np.asarray(vals_host, dtype=np.float64),
            k,
        )
        dtype = self._dtype
        knots_j = tuple(jnp.asarray(t.astype(dtype, copy=False)) for t in knots)
        coeffs_j = jnp.asarray(coeffs.astype(dtype, copy=False))
        return knots_j, coeffs_j, k

    def _eval_device(self, dev, obs_j):
        from ..ops import bspline as _bspline
        from ..ops import pchip as _pchip

        tag = dev[0]
        if tag == "pchip_regular":
            _, dims, starts, steps, vals = dev
            return _pchip.jitted("regular")(dims, starts, steps, vals, obs_j)
        if tag == "pchip_rectilinear":
            _, grids, vals = dev
            return _pchip.jitted("rectilinear")(grids, vals, obs_j)
        _, knots, coeffs, k = dev
        return _bspline.jitted_eval()(knots, coeffs, obs_j, k)

    def _prepare_native(self):
        # no C++ kernels for the spline family (pchip slopes / Cox-de Boor
        # weights are the device engines' job); the device path serves all
        return None


class TensorSplineRegular(RegularGridMixin, _SplineBase):
    """Spline-family interpolation on a regular grid in up to 8 dimensions.

    ``method`` selects the interpolant:

    * ``"pchip"`` — monotone cubic Hermite (Fritsch-Carlson/Moler slopes),
      scipy ``RegularGridInterpolator(method="pchip")`` semantics incl.
      edge-interval extrapolation; needs >= 4 points per axis.
    * ``"cubic_spline"`` / ``"quintic"`` — global not-a-knot tensor-product
      interpolating splines of degree 3/5 (scipy RGI ``cubic``/``quintic``
      semantics, exact per-axis collocation solves); need >= 4/6 points
      per axis. Out-of-bounds queries evaluate the end span's polynomial.

    Construction expects flat (1D, contiguous) arrays sharing one float
    dtype, np.float64 or np.float32. There is no reference analogue; the
    class follows the reference's persistent-model pattern
    (`src/interpn/multicubic_regular.py:24-234`).
    """

    dims: list[int]
    starts: Array
    steps: Array
    vals: Array
    method: Literal["pchip", "cubic_spline", "quintic"]

    @classmethod
    def new(
        cls,
        dims: list[int],
        starts: NDArray,
        steps: NDArray,
        vals: NDArray,
        method: Literal["pchip", "cubic_spline", "quintic"] = "cubic_spline",
    ) -> "TensorSplineRegular":
        """Build a model from plain numpy inputs: arrays are flattened to
        contiguous storage and converted to the dtype of `vals` before
        validation.

        Args:
            dims: grid point count along each axis
            starts: first grid coordinate along each axis
            steps: spacing between grid points along each axis
            vals: grid-point value table, flattened in C (row-major) order
            method: "pchip", "cubic_spline", or "quintic"
        """
        arrtype = arrtype_for(np.asarray(vals))
        return cls(
            dims=dims,
            starts=arrtype(data=np.asarray(starts).flatten()),
            steps=arrtype(data=np.asarray(steps).flatten()),
            vals=arrtype(data=np.asarray(vals).flatten()),
            method=method,
        )

    @model_validator(mode="after")
    def _validate_model(self):
        ndims = self.ndims()
        assert ndims <= 8 and ndims >= 1, (
            "Number of dimensions must be at least 1 and no more than 8"
        )
        assert self.starts.data.size == ndims, "Grid dimension mismatch"
        assert self.steps.data.size == ndims, "Grid dimension mismatch"
        assert self.vals.data.size == prod_dims(self.dims), (
            "Size of value array does not match grid dims"
        )
        assert all([x > 0.0 for x in self.steps.data]), (
            "All grid steps must be positive and nonzero"
        )
        assert all(
            [x.data.dtype == self.vals.data.dtype for x in [self.steps, self.vals]]
        ), "All grid inputs must be of the same data type (np.float32 or np.float64)"
        assert all(
            [x.data.data.contiguous for x in [self.starts, self.steps, self.vals]]
        ), "Grid data must be contiguous"
        return self

    def ndims(self) -> int:
        return len(self.dims)

    def _grid_arrays_host(self):
        """Per-axis coordinate arrays reconstructed from starts/steps."""
        s = np.asarray(self.starts.data, dtype=np.float64)
        h = np.asarray(self.steps.data, dtype=np.float64)
        return [s[i] + h[i] * np.arange(d) for i, d in enumerate(self.dims)]

    def _device_constants(self):
        dims = tuple(int(d) for d in self.dims)
        if self.method == "pchip":
            return (
                "pchip_regular",
                dims,
                jnp.asarray(self.starts.data),
                jnp.asarray(self.steps.data),
                jnp.asarray(self.vals.data),
            )
        knots, coeffs, k = self._spline_constants(
            self._grid_arrays_host(), self.vals.data
        )
        return ("bspline", knots, coeffs, k)


class TensorSplineRectilinear(RectilinearGridMixin, _SplineBase):
    """Spline-family interpolation on a rectilinear grid in up to 8
    dimensions. See :class:`TensorSplineRegular` for the method semantics;
    grids must be strictly monotonically increasing."""

    grids: list[Array]
    vals: Array
    method: Literal["pchip", "cubic_spline", "quintic"]

    @classmethod
    def new(
        cls,
        grids: list[NDArray],
        vals: NDArray,
        method: Literal["pchip", "cubic_spline", "quintic"] = "cubic_spline",
    ) -> "TensorSplineRectilinear":
        """Build a model from per-axis coordinate arrays and a value table.

        Args:
            grids: per-axis coordinate arrays, each strictly increasing.
            vals: grid-point value table, flattened in C (row-major) order
            method: "pchip", "cubic_spline", or "quintic"
        """
        arrtype = arrtype_for(np.asarray(vals))
        return cls(
            grids=[arrtype(data=np.asarray(x)) for x in grids],
            vals=arrtype(data=np.asarray(vals).flatten()),
            method=method,
        )

    @model_validator(mode="after")
    def _validate_model(self):
        dims = self.dims()
        ndims = self.ndims()
        assert ndims <= 8 and ndims >= 1, (
            "Number of dimensions must be at least 1 and no more than 8"
        )
        assert self.vals.data.size == prod_dims(dims), (
            "Size of value array does not match grid dims"
        )
        assert all([np.all(np.diff(x.data) > 0.0) for x in self.grids]), (
            "All grids must be monotonically increasing"
        )
        assert all([x.data.dtype == self.vals.data.dtype for x in self.grids]), (
            "All grid inputs must be of the same data type (np.float32 or np.float64)"
        )
        assert (
            all([x.data.data.contiguous for x in self.grids])
            and self.vals.data.data.contiguous
        ), "Grid data must be contiguous"
        return self

    def ndims(self) -> int:
        return len(self.grids)

    def _device_constants(self):
        if self.method == "pchip":
            return (
                "pchip_rectilinear",
                tuple(jnp.asarray(g.data) for g in self.grids),
                jnp.asarray(self.vals.data),
            )
        knots, coeffs, k = self._spline_constants(
            [g.data for g in self.grids], self.vals.data
        )
        return ("bspline", knots, coeffs, k)
