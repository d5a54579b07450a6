"""JaxInterpolator (pytree) tests: transform-boundary behavior.

Parity baseline is the pydantic model classes (same dispatch layer); the
new surface under test is the pytree protocol: jit-as-argument without
retrace on table swap, vmap over tables, scan carries, autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpn_tpu as it
from interpn_tpu.functional import JaxInterpolator


def _mk(ndims, method, regular, rng):
    n = 6
    x = np.linspace(0.0, 1.0, n)
    grids = []
    for i in range(ndims):
        g = x.copy()
        if not regular:
            g = np.sort(rng.uniform(0.0, 1.0, n))
            g[0], g[-1] = 0.0, 1.0
            while np.any(np.diff(g) <= 1e-3):
                g = np.sort(rng.uniform(0.0, 1.0, n))
                g[0], g[-1] = 0.0, 1.0
        grids.append(g)
    vals = rng.standard_normal([n] * ndims)
    obs = [rng.uniform(-0.2, 1.2, 257) for _ in range(ndims)]
    if regular:
        itp = JaxInterpolator.regular(
            [n] * ndims, [g[0] for g in grids],
            [g[1] - g[0] for g in grids], vals, method=method,
        )
        model_cls = {
            "linear": it.MultilinearRegular,
            "cubic": it.MulticubicRegular,
            "nearest": it.NearestRegular,
        }[method]
        if method == "cubic":
            model = model_cls.new(
                [n] * ndims, np.zeros(ndims), np.full(ndims, x[1]),
                vals.ravel(),
            )
        else:
            model = model_cls.new(
                [n] * ndims, np.zeros(ndims), np.full(ndims, x[1]),
                vals.ravel(),
            )
    else:
        itp = JaxInterpolator.rectilinear(grids, vals, method=method)
        model_cls = {
            "linear": it.MultilinearRectilinear,
            "cubic": it.MulticubicRectilinear,
            "nearest": it.NearestRectilinear,
        }[method]
        model = model_cls.new(grids, vals.ravel())
    return itp, model, obs


@pytest.mark.parametrize("regular", [True, False])
@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_matches_model_classes(method, regular):
    rng = np.random.default_rng(42)
    itp, model, obs = _mk(3, method, regular, rng)
    out = np.asarray(itp(obs))
    ref = model.eval([np.ascontiguousarray(o) for o in obs])
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_jit_argument_no_retrace_on_table_swap():
    rng = np.random.default_rng(0)
    itp, model, obs = _mk(2, "linear", True, rng)
    obs_j = [jnp.asarray(o) for o in obs]

    traces = []

    @jax.jit
    def f(itp, obs):
        traces.append(1)
        return itp(obs)

    out1 = f(itp, obs_j)
    # same structure, new table: must NOT retrace
    vals2 = jnp.asarray(
        np.random.default_rng(1).standard_normal(itp.vals.shape)
    )
    leaves, treedef = jax.tree_util.tree_flatten(itp)
    itp2 = jax.tree_util.tree_unflatten(treedef, leaves[:-1] + [vals2])
    out2 = f(itp2, obs_j)
    assert len(traces) == 1
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # and the swapped-table result is correct
    ref = it.MultilinearRegular.new(
        [6, 6], np.zeros(2), np.full(2, 0.2), np.asarray(vals2)
    ).eval([np.ascontiguousarray(o) for o in obs])
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-12, atol=1e-12)


def test_vmap_over_tables():
    rng = np.random.default_rng(3)
    itp, _, obs = _mk(2, "linear", True, rng)
    obs_j = [jnp.asarray(o) for o in obs]
    nch = 4
    tables = jnp.asarray(rng.standard_normal((nch, *itp.vals.shape)))
    leaves, treedef = jax.tree_util.tree_flatten(itp)

    def eval_one(itp, obs):
        return itp(obs)

    batched = jax.tree_util.tree_unflatten(treedef, leaves[:-1] + [tables])
    out = jax.vmap(eval_one, in_axes=(itp.batch_axes(), None))(batched, obs_j)
    assert out.shape == (nch, len(obs[0]))
    for c in range(nch):
        single = jax.tree_util.tree_unflatten(
            treedef, leaves[:-1] + [tables[c]]
        )
        np.testing.assert_allclose(
            np.asarray(out[c]), np.asarray(single(obs_j)), rtol=1e-12
        )


def test_scan_carry():
    rng = np.random.default_rng(5)
    itp, _, obs = _mk(2, "linear", True, rng)
    obs_j = jnp.stack([jnp.asarray(o) for o in obs])  # (2, n)

    def step(itp, xs):
        return itp, jnp.sum(itp([xs[0], xs[1]]))

    xs = jnp.stack([obs_j, obs_j * 0.5 + 0.1])  # 2 steps
    _, sums = jax.lax.scan(step, itp, xs)
    assert sums.shape == (2,)
    np.testing.assert_allclose(
        float(sums[0]), float(jnp.sum(itp([o for o in obs_j]))), rtol=1e-12
    )


def test_grad_flows_to_table_and_obs():
    rng = np.random.default_rng(7)
    itp, _, obs = _mk(2, "cubic", True, rng)
    obs_j = [jnp.asarray(o[:31]) for o in obs]

    def loss_vals(vals):
        leaves, treedef = jax.tree_util.tree_flatten(itp)
        i2 = jax.tree_util.tree_unflatten(treedef, leaves[:-1] + [vals])
        return jnp.sum(i2(obs_j) ** 2)

    g = jax.grad(loss_vals)(itp.vals)
    assert g.shape == itp.vals.shape and bool(jnp.any(g != 0))
    # finite-difference spot check on one table entry
    eps = 1e-6
    e = jnp.zeros_like(itp.vals).at[10].set(eps)
    fd = (loss_vals(itp.vals + e) - loss_vals(itp.vals - e)) / (2 * eps)
    np.testing.assert_allclose(float(g[10]), float(fd), rtol=1e-4, atol=1e-7)

    def loss_obs(o0):
        return jnp.sum(itp([o0, obs_j[1]]))

    go = jax.grad(loss_obs)(obs_j[0])
    assert go.shape == obs_j[0].shape and bool(jnp.any(go != 0))


@pytest.mark.parametrize(
    "cls,args,method",
    [
        (it.MultilinearRegular, "reg", "linear"),
        (it.MulticubicRegular, "reg", "cubic"),
        (it.NearestRegular, "reg", "nearest"),
        (it.MultilinearRectilinear, "rect", "linear"),
        (it.MulticubicRectilinear, "rect", "cubic"),
        (it.NearestRectilinear, "rect", "nearest"),
    ],
)
def test_from_model(cls, args, method):
    rng = np.random.default_rng(11)
    n = 5
    vals = rng.standard_normal(n * n)
    if args == "reg":
        model = cls.new([n, n], np.zeros(2), np.full(2, 0.25), vals)
    else:
        g = np.linspace(0.0, 1.0, n) ** 1.3
        model = cls.new([g, g], vals)
    itp = JaxInterpolator.from_model(model)
    assert itp.method == method
    obs = [rng.uniform(0.05, 0.9, 65) for _ in range(2)]
    np.testing.assert_allclose(
        np.asarray(itp(obs)),
        model.eval([np.ascontiguousarray(o) for o in obs]),
        rtol=1e-12,
        atol=1e-12,
    )


def test_errors():
    with pytest.raises(ValueError, match="is not defined"):
        JaxInterpolator.regular([4], [0.0], [1.0], np.zeros(4), method="foo")
    with pytest.raises(AssertionError, match="Dimension mismatch"):
        JaxInterpolator.regular(
            [4] * 7, np.zeros(7), np.ones(7), np.zeros(4**7), method="nearest"
        )
    itp = JaxInterpolator.regular([4, 4], np.zeros(2), np.ones(2), np.zeros(16))
    with pytest.raises(AssertionError, match="Dimension mismatch"):
        itp([np.zeros(3)])
    with pytest.raises(AssertionError, match="Dimension mismatch"):
        itp([np.zeros(3), np.zeros(4)])


def test_pchip_method_matches_ops_and_transforms():
    """method='pchip' routes to ops.pchip (scipy-semantics monotone cubic)
    and composes with jit and vmap-over-tables like the other methods."""
    import jax

    from interpn_tpu import ops

    rng = np.random.default_rng(23)
    grids = [np.sort(rng.uniform(0.0, 1.0, n)) for n in (6, 7)]
    vals = rng.random(42)
    itp = JaxInterpolator.rectilinear(grids, vals, method="pchip")
    obs = [rng.uniform(-0.1, 1.1, 50) for _ in range(2)]
    ref = np.asarray(ops.pchip_rectilinear(grids, vals, obs))
    np.testing.assert_allclose(np.asarray(itp(obs)), ref, rtol=1e-13)
    # jit with the interpolator as a pytree argument
    jitted = jax.jit(lambda i, o: i(o))
    np.testing.assert_allclose(np.asarray(jitted(itp, obs)), ref, rtol=1e-13)
    # vmap over a batch of tables sharing the grid
    stack = np.stack([vals, vals[::-1].copy()])
    batched = jax.vmap(lambda v, o: JaxInterpolator.rectilinear(
        grids, v, method="pchip")(o), in_axes=(0, None))(stack, obs)
    np.testing.assert_allclose(np.asarray(batched[0]), ref, rtol=1e-13)
    ref1 = np.asarray(ops.pchip_rectilinear(grids, stack[1], obs))
    np.testing.assert_allclose(np.asarray(batched[1]), ref1, rtol=1e-13)
