"""int8-multipass MXU f64 engine: accuracy vs the f64 gather tree and the
double-float VPU engine (interpret mode on CPU; throughput is validated on
real TPU hardware, docs/perf.md).

Same bar as the df64 engine: <= 1e-13 interior, term-amplification-bounded
under deep extrapolation."""

import numpy as np
import pytest

import interpn_tpu  # noqa: F401  (enables x64)
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu import ops
from interpn_tpu.ops import pallas_df64 as df
from interpn_tpu.ops import pallas_i8 as i8


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _case(dims, seed=0, depth=2.0):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)))
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)))
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    n = 500
    obs = tuple(
        jnp.asarray(
            rng.uniform(
                float(starts[k]) - depth * float(steps[k]),
                float(starts[k]) + float(steps[k]) * (dims[k] - 1 + depth),
                n,
            )
        )
        for k in range(len(dims))
    )
    return starts, steps, vals, obs


@pytest.mark.parametrize("dims,method", [
    ((12, 12), "linear"),
    ((10, 10, 10), "cubic"),
    ((20, 20, 20), "cubic"),
    ((13, 13, 13, 4), "cubic"),
])
def test_i8_matches_df64_engine(dims, method):
    """The int8 engine matches the double-float engine at the double-float
    accuracy floor — the two independent 2^-47-class constructions agree
    far tighter than either is required to match the gather tree."""
    starts, steps, vals, obs = _case(dims, seed=sum(dims))
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs, method))
    b = np.asarray(df.eval_regular(dims, starts, steps, vals, obs, method))
    np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("dims,method,linearize", [
    ((10, 10, 10), "cubic", True),
    ((10, 10, 10), "cubic", False),
    ((20, 20, 20), "linear", True),
])
def test_i8_interior_parity_vs_gather(dims, method, linearize):
    rng = np.random.default_rng(3)
    starts = jnp.zeros(len(dims))
    steps = jnp.ones(len(dims))
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    obs = tuple(
        jnp.asarray(rng.uniform(0, d - 1.0, 400)) for d in dims
    )
    a = np.asarray(
        i8.eval_regular(dims, starts, steps, vals, obs, method, linearize)
    )
    if method == "linear":
        b = np.asarray(ops.linear.linear_regular(dims, starts, steps, vals, obs))
    else:
        b = np.asarray(
            ops.cubic.cubic_regular(dims, starts, steps, vals, obs, linearize)
        )
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-13)


def test_i8_rectilinear():
    rng = np.random.default_rng(7)
    dims = (9, 8, 10)
    grids = tuple(jnp.asarray(np.cumsum(0.2 + rng.random(d))) for d in dims)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    n = 400
    obs = tuple(
        jnp.asarray(rng.uniform(float(g[0]), float(g[-1]), n)) for g in grids
    )
    a = np.asarray(i8.eval_rectilinear(grids, vals, obs, "cubic", True))
    b = np.asarray(ops.cubic.cubic_rectilinear(grids, vals, obs, True))
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-13)


def test_i8_offset_table_row_centering():
    """A globally-offset table (temperatures ~300) costs nothing: the row
    centering keeps the fixed-point error on the LOCAL variation."""
    rng = np.random.default_rng(9)
    dims = (16, 16)
    vals64 = 300.0 + 0.01 * rng.standard_normal(256)
    vals = jnp.asarray(vals64)
    starts, steps = jnp.zeros(2), jnp.ones(2)
    obs = tuple(jnp.asarray(rng.uniform(0, 15, 300)) for _ in range(2))
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs, "cubic"))
    b = np.asarray(ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True))
    d = np.asarray(df.eval_regular(dims, starts, steps, vals, obs, "cubic"))
    # The remaining error is the f64 weight-sum chain (~300 * 2^-51), which
    # every engine carries on an offset table — anchor against the df64
    # engine rather than an absolute bar. Without the global-center
    # extraction the fixed-point error would be 300 * 2^-47 ~ 2e-12.
    err_i8 = np.max(np.abs(a - b))
    err_df = np.max(np.abs(d - b))
    assert err_i8 < 5e-13
    assert err_i8 < 4 * err_df + 1e-14


def test_i8_supported_gate():
    rng = np.random.default_rng(1)
    ok_vals = jnp.asarray(rng.standard_normal(8000))
    assert i8.supported((20, 20, 20), "cubic", ok_vals)
    assert i8.supported((20, 20, 20, 20), "cubic")
    assert not i8.supported((20, 20, 20), "nearest")
    assert not i8.supported((20,), "linear")
    # spiky rows (one huge value amid tiny ones) fall back to df64
    spiky = np.ones(8000) * 1e-6
    spiky[40] = 1e6
    assert not i8.supported((20, 20, 20), "cubic", jnp.asarray(spiky))
    # non-finite tables are never decomposed
    bad = np.zeros(8000)
    bad[3] = np.inf
    assert not i8.supported((20, 20, 20), "cubic", jnp.asarray(bad))
    # tracers can't be decomposed at trace time
    import jax

    seen = []
    jax.make_jaxpr(
        lambda v: seen.append(i8.supported((20, 20, 20), "cubic", v)) or v
    )(ok_vals)
    assert seen == [False]


def test_i8_cost_model_gate():
    """Beyond the hardware-validated regime (lead <= 2048, pieces <= 8 MB)
    shapes are admitted only on a predicted >= 1.5x win over the f64
    gather tree: large-grid cubic factorings with moderate padded volume
    qualify, 100^3 (predicted ~parity) and large-grid linear (gather is
    8x cheaper per query than cubic) do not."""
    assert i8.supported((50, 50, 50), "cubic")  # lead 2500: est 3.9 vs 0.97
    assert i8.supported((64, 64, 64), "cubic")  # lead 4096: est 2.5 vs 0.97
    assert i8.supported((17,) * 5, "cubic")  # 1.4M cells: est 0.67 vs 0.06
    assert not i8.supported((100, 100, 100), "cubic")  # est 1.0: no margin
    assert not i8.supported((50, 50, 50), "linear")  # gather linear ~7.8
    assert not i8.supported((1500, 1400), "cubic")  # est 0.6 vs 3.9


def test_i8_vmem_ceilings_bind_even_when_forced(monkeypatch):
    """INTERPN_TPU_F64=i8 skips the cost model and the spike gate but the
    VMEM ceilings are hard capability limits."""
    monkeypatch.setenv("INTERPN_TPU_F64", "i8")
    assert i8.supported((50, 50, 50), "cubic")
    assert not i8.supported((7000, 4), "cubic")  # pad(lead) > 6144
    assert not i8.supported((2000, 2000), "cubic")  # pieces 33.5 MB > 24


def test_i8_large_lead_parity():
    """A new-region shape (50^3: lead 2500 > the legacy 2048 cap) through
    the unchanged kernel, vs the f64 gather tree at the engine's bar."""
    rng = np.random.default_rng(11)
    dims = (50, 50, 50)
    starts, steps = jnp.zeros(3), jnp.ones(3)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    obs = tuple(jnp.asarray(rng.uniform(-1.0, d, 256)) for d in dims)
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs, "cubic"))
    b = np.asarray(ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True))
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-13)


def test_i8_env_override(monkeypatch):
    v = jnp.zeros(400)
    monkeypatch.setenv("INTERPN_TPU_F64", "df64")
    assert not i8.supported((20, 20), "cubic", v)
    monkeypatch.setenv("INTERPN_TPU_F64", "i8")
    spiky = np.ones(400) * 1e-6
    spiky[5] = 1e6
    assert i8.supported((20, 20), "cubic", jnp.asarray(spiky))  # gate skipped


def test_public_paths_route_to_i8(monkeypatch):
    """The raw entries and model classes must reach the int8 engine (the
    jitted cores trace vals, so routing happens EAGERLY in raw/_eval_device
    — a regression here silently demotes f64 to the 10-40x-slower paths)."""
    import interpn_tpu as it
    import jax

    from interpn_tpu import raw

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("INTERPN_TPU_NATIVE", "0")  # else the CPU fast path wins
    calls = []
    real = i8.eval_regular

    def spy(*a, **k):
        calls.append("regular")
        return real(*a, **k)

    monkeypatch.setattr(i8, "eval_regular", spy)
    # raw._try_i8_regular resolves ops.pallas_i8 lazily: patch there too
    rng = np.random.default_rng(2)
    dims = [20, 20, 20]
    vals = rng.standard_normal(8000)
    obs = [rng.uniform(0, 19, 4096) for _ in range(3)]
    out = np.zeros(4096)
    raw.interpn_cubic_regular_f64(
        dims, np.zeros(3), np.ones(3), vals, True, obs, out
    )
    assert calls == ["regular"]
    assert np.all(np.isfinite(out))

    # class path (device eval; native disabled so the device hook runs)
    monkeypatch.setenv("INTERPN_TPU_NATIVE", "0")
    m = it.MulticubicRegular.new(dims, np.zeros(3), np.ones(3), vals)
    m.eval(obs)
    assert len(calls) == 2


def test_i8_under_closure_jit_no_tracer_leak(monkeypatch):
    """A caller jitting over the dispatch path with the table closed over
    (scripts/warm_cache.py's pattern) traces prepare(): cached device
    conversions made inside a trace are tracers and leaked into later
    traces (UnexpectedTracerError, caught by the release dry-run). Two
    distinct traces plus an eager call must all work."""
    import jax

    from interpn_tpu.ops import dispatch

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(4)
    dims = (20, 20, 20)
    vals = jnp.asarray(rng.standard_normal(8000))
    st, sp = jnp.zeros(3), jnp.ones(3)
    outs = []
    for trial in range(2):
        obs = tuple(
            jnp.asarray(rng.uniform(0, 19, 2048 * (trial + 1)))
            for _ in range(3)
        )
        out = jax.jit(
            lambda o: dispatch.cubic_regular(dims, st, sp, vals, o, True)
        )(obs)
        outs.append(jax.block_until_ready(out))
    obs = tuple(jnp.asarray(rng.uniform(0, 19, 4096)) for _ in range(3))
    outs.append(
        jax.block_until_ready(
            dispatch.cubic_regular(dims, st, sp, vals, obs, True)
        )
    )
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


@pytest.mark.parametrize("dims,lin", [
    ((20, 20, 20), False),
    ((20, 20, 20, 20), True),
])
def test_i8_deep_extrapolation_parity(dims, lin):
    """Deep multi-axis extrapolation through the ENGINE at 0.5-3 cells:
    measured <= 7e-14 on all admitted shapes. Past ~4 cells the
    non-linearized weight-quantization floor surfaces even on admitted
    shapes (fuzz seed 300 round 375: 4.7e-8 on a 6400-cell 6D), which is
    why production routing also applies the per-batch depth gate
    (extrap_ok_*, capped at 2 cells — see test_i8_extrapolation_gate)."""
    rng = np.random.default_rng(17)
    nd = len(dims)
    starts, steps = jnp.zeros(nd), jnp.ones(nd)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    n = 300
    obs = tuple(
        jnp.asarray(np.concatenate([
            rng.uniform(-3.0, -0.5, n // 2),
            rng.uniform(dims[k] - 0.5, dims[k] + 2.0, n - n // 2),
        ]))
        for k in range(nd)
    )
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs, "cubic", lin))
    b = np.asarray(ops.cubic.cubic_regular(dims, starts, steps, vals, obs, lin))
    scale = max(float(np.max(np.abs(b))), 1.0)
    assert np.max(np.abs(a - b)) / scale < 5e-13


def test_i8_row_offset_table_k_not_multiple_of_128():
    """Per-row offsets on a shape whose contraction extent needs padding
    (20^3: k=400 -> 512): the decomposition must compute row midrange and
    scale over the TRUE row, not the zero-padded one — padding first
    inflates the fixed-point step from the row's local variation (~1e-2)
    to its offset (~1e6)."""
    rng = np.random.default_rng(21)
    dims = (20, 20, 20)
    g, lead, k = i8._shape(dims)
    assert k % 128 != 0  # the configuration under test
    # per-LEAD-row offsets spanning 1e6 plus tiny local variation
    v = (
        1.0e6 * np.linspace(-1.0, 1.0, lead)[:, None]
        + 0.01 * rng.standard_normal((lead, k))
    ).reshape(-1)
    vals = jnp.asarray(v)
    starts, steps = jnp.zeros(3), jnp.ones(3)
    obs = tuple(jnp.asarray(rng.uniform(0, 19, 300)) for _ in range(3))
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs, "cubic"))
    b = np.asarray(ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True))
    d = np.asarray(df.eval_regular(dims, starts, steps, vals, obs, "cubic"))
    err_i8 = np.max(np.abs(a - b))
    err_df = np.max(np.abs(d - b))
    # anchor against the df64 engine: both carry the f64 weight-sum chain
    # on a ~1e6 table; pre-fix the i8 error here was ~2^-47 * 5e5 ~ 4e-9
    assert err_i8 < 4 * err_df + 1e-9


def test_i8_span_overflow_gate():
    """Finite f64 tables whose value SPAN overflows the float32 row
    centers/scales are refused (the gather tree serves them); a huge
    ABSOLUTE magnitude with a modest span is fine — the global-center
    extraction bounds |v - c0| by span/2."""
    rng = np.random.default_rng(5)
    wide = rng.standard_normal(8000) * 1e39  # span ~1e39 > 2^120
    assert not i8.supported((20, 20, 20), "cubic", jnp.asarray(wide))
    offset = 1e39 + rng.standard_normal(8000)  # span ~1, magnitude 1e39
    assert i8.supported((20, 20, 20), "cubic", jnp.asarray(offset))


def test_i8_forced_tracer_still_declines(monkeypatch):
    """INTERPN_TPU_F64=i8 must not override the concrete-table
    requirement: prepare() would np.asarray() the tracer and crash
    mid-trace."""
    import jax

    monkeypatch.setenv("INTERPN_TPU_F64", "i8")
    seen = []
    jax.make_jaxpr(
        lambda v: seen.append(i8.supported((20, 20, 20), "cubic", v)) or v
    )(jnp.zeros(8000))
    assert seen == [False]


def test_i8_forced_small_grid_dispatches(monkeypatch):
    """INTERPN_TPU_F64=i8 reaches the engine below the 4096-cell VPU
    preference (supported() deliberately skips _MIN_CELLS when forced;
    the _prefer_i8 pre-gate must not silently undo that)."""
    from interpn_tpu.ops import dispatch

    monkeypatch.setenv("INTERPN_TPU_F64", "i8")
    assert dispatch._prefer_i8((10, 10, 10), "cubic")
    assert i8.supported((10, 10, 10), "cubic", jnp.zeros(1000))


def test_i8_prep_cache_content_keyed_for_numpy():
    """Host numpy tables key the prep/stat caches by CONTENT: repeated
    raw-style calls with equal-content (but distinct) arrays hit the
    cache, and in-place mutation is honored (fresh decomposition)."""
    rng = np.random.default_rng(6)
    v1 = rng.standard_normal(8000)
    dims = (20, 20, 20)
    p1 = i8.prepare(dims, v1)
    p2 = i8.prepare(dims, v1.copy())  # same content, different object
    assert p1 is p2
    v3 = v1.copy()
    v3[123] += 1.0
    p3 = i8.prepare(dims, v3)
    assert p3 is not p1
    assert not np.array_equal(
        np.asarray(p1[0]), np.asarray(p3[0])
    )  # pieces reflect the mutation


class TestExtrapolationGate:
    """Per-batch depth admission for non-linearized cubic
    (pallas_i8.extrap_ok_*): fuzz seed 300 round 375 measured 4.7e-8 on an
    admitted 6400-cell 6D shape at 3.5-6.5-cell extrapolation, so routing
    declines past _EXTRAP_CELLS_CUBIC cells (calibration:
    benches/exp_i8_extrap.py)."""

    dims = (4, 5, 4, 4, 5, 4)

    def _obs(self, depth, n=64, seed=3):
        rng = np.random.default_rng(seed)
        return tuple(
            jnp.asarray(rng.uniform(-depth, d - 1 + depth, n))
            for d in self.dims
        )

    def test_regular_gate_depth(self):
        nd = len(self.dims)
        st, sp = jnp.zeros(nd), jnp.ones(nd)
        shallow, deep = self._obs(1.5), self._obs(4.0)
        assert i8.extrap_ok_regular(self.dims, st, sp, shallow, "cubic", False)
        assert not i8.extrap_ok_regular(self.dims, st, sp, deep, "cubic", False)
        # linear and linearized cubic are ungated (measured clean to 6 cells)
        assert i8.extrap_ok_regular(self.dims, st, sp, deep, "cubic", True)
        assert i8.extrap_ok_regular(self.dims, st, sp, deep, "linear", True)
        # NaN coordinates decline (reference-parity engines own NaN flow)
        bad = (jnp.full(64, jnp.nan),) + shallow[1:]
        assert not i8.extrap_ok_regular(self.dims, st, sp, bad, "cubic", False)

    def test_rectilinear_gate_depth(self):
        grids = tuple(jnp.arange(float(d)) for d in self.dims)
        assert i8.extrap_ok_rectilinear(grids, self._obs(1.5), "cubic", False)
        assert not i8.extrap_ok_rectilinear(grids, self._obs(4.0), "cubic", False)

    def test_traced_obs_decline(self):
        import jax

        nd = len(self.dims)
        st, sp = jnp.zeros(nd), jnp.ones(nd)

        got = []

        def probe(*obs):
            got.append(i8.extrap_ok_regular(self.dims, st, sp, obs, "cubic", False))
            return obs[0]

        jax.jit(probe)(*self._obs(0.5))
        assert got == [False]

    def test_fuzz_round_375_regression(self, monkeypatch):
        """The fuzz-found config THROUGH THE DISPATCH LAYER with the i8
        arm live (backend spoofed to "tpu", pallas in interpret mode):
        first prove the engine itself still reproduces the >= 1e-9 error
        (the test has teeth), then that dispatch's gate demotion returns
        oracle-parity results. On the real CPU backend `_impl` never
        selects i8, which would make a raw-surface assertion vacuous."""
        import sys as _sys
        from pathlib import Path as _P

        _sys.path.insert(0, str(_P(__file__).parent))
        import oracle

        from interpn_tpu.ops import dispatch

        rng = np.random.default_rng(300)
        dims = tuple(self.dims)
        nd = len(dims)
        starts = rng.uniform(-3, 3, nd)
        steps = rng.uniform(0.2, 2.0, nd)
        vals = rng.standard_normal(int(np.prod(dims)))
        n = 2048  # >= MIN_PALLAS_QUERIES so _impl's f64 arm engages
        obs = [
            rng.uniform(starts[k] - 3, starts[k] + steps[k] * (dims[k] + 3), n)
            for k in range(nd)
        ]
        sj, stj = jnp.asarray(starts), jnp.asarray(steps)
        vj = jnp.asarray(vals)
        oj = tuple(jnp.asarray(o) for o in obs)
        sel = rng.integers(0, n, 96)
        orc = np.array([
            oracle.cubic_regular(list(dims), starts, steps, vals,
                                 [o[i] for o in obs], False)
            for i in sel
        ])
        scale = max(1.0, np.abs(orc).max())

        # the engine alone still exhibits the failure on this config
        raw_i8 = np.asarray(
            i8.eval_regular(dims, sj, stj, vj, oj, "cubic", False)
        )[sel]
        assert np.abs(raw_i8 - orc).max() / scale > 1e-10

        # dispatch with the i8 arm reachable must route around it — and
        # specifically BECAUSE the gate fired, not by accident of policy
        monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
        gate_calls = []
        real_gate = i8.extrap_ok_regular

        def spy(*a, **k):
            r = real_gate(*a, **k)
            gate_calls.append(r)
            return r

        monkeypatch.setattr(i8, "extrap_ok_regular", spy)
        got = np.asarray(
            dispatch.cubic_regular(dims, sj, stj, vj, oj, False)
        )[sel]
        assert gate_calls == [False], gate_calls
        assert np.abs(got - orc).max() / scale < 1e-12


def test_raw_eligibility_delegates_to_shared_predicate(monkeypatch):
    """raw._i8_eligible IS dispatch.i8_route (one predicate, two call
    sites): forcing the shared predicate flips the eager raw decision."""
    from interpn_tpu import raw
    from interpn_tpu.ops import dispatch

    seen = []

    def fake(dims, method, vals, obs0):
        seen.append((dims, method))
        return True

    monkeypatch.setattr(dispatch, "i8_route", fake)
    vals = np.zeros(16)
    obs0 = np.zeros(2048)
    assert raw._i8_eligible((4, 4), "linear", vals, obs0) is True
    assert seen == [((4, 4), "linear")]
    monkeypatch.setattr(dispatch, "i8_route", lambda *a: False)
    assert raw._i8_eligible((4, 4), "linear", vals, obs0) is False


def test_gate_demotion_targets(monkeypatch):
    """Concrete deep-extrapolation batches demote to the GATHER tree, not
    df64: the adversarial sweep (benches/exp_i8_adversarial.py) measured
    df64 at the same or WORSE error than i8 on every deep-extrapolation
    violating config (7D hf_sine e=6: 3.1e-9 vs 4.6e-10 rel_out), so only
    gather keeps the 1e-13 contract there. Traced batches (depth
    unknowable) still prefer df64 for the common jit envelope."""
    import jax

    from interpn_tpu.ops import dispatch, pallas_df64 as pdf

    dims = (4, 5, 4, 4, 5, 4)
    nd = len(dims)
    rng = np.random.default_rng(11)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    st, sp = jnp.zeros(nd), jnp.ones(nd)
    deep = tuple(
        jnp.asarray(rng.uniform(-4.0, d - 1 + 4.0, 2048)) for d in dims
    )
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")

    called = []
    monkeypatch.setattr(
        dispatch._pdf, "eval_regular",
        lambda *a, **k: called.append("df64") or dispatch._cubic_reg_gather(
            dims, st, sp, vals, deep, False),
    )
    monkeypatch.setattr(
        dispatch._pi8, "eval_regular",
        lambda *a, **k: called.append("i8"),
    )
    # concrete deep batch: neither fused engine may serve it
    out = dispatch.cubic_regular(dims, st, sp, vals, deep, False)
    assert called == [] and np.isfinite(np.asarray(out)).all()

    # traced batch: df64 serves (depth unknowable at trace time)
    jax.jit(
        lambda s, p, v, *o: dispatch.cubic_regular(dims, s, p, v, o, False)
    )(st, sp, vals, *deep)
    assert "df64" in called and "i8" not in called
