"""Split-complex (real-arithmetic) engine must match the complex engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from qnmfits_tpu.engine import SpectrumEvaluator, fit_core
from qnmfits_tpu.engine_real import (
    fit_core_real, merge, split, sweep_t0_modesets_real, sweep_t0_real)
from qnmfits_tpu.ops.windows import window_geq
from qnmfits_tpu.testing import synthetic_multimode


@pytest.fixture(scope="module")
def problem():
    syn = synthetic_multimode(seed=9)
    ev = SpectrumEvaluator(syn["modes"], syn["spherical_modes"])
    omega = np.asarray(ev.omega(syn["chif"], syn["Mf"]))
    mu = np.asarray(ev.mu(syn["chif"]))
    data = np.stack([syn["data_dict"][lm] for lm in syn["spherical_modes"]])
    data = data + 1e-3 * np.exp(-0.03 * np.abs(syn["times"]))
    return syn["times"].astype(float), data, omega, mu


def test_fit_core_real_matches_complex(problem):
    times, data, omega, mu = problem
    t0 = 4.2
    w = np.asarray((times >= t0) & (times < t0 + 80.0), float)

    C, mm = fit_core(jnp.asarray(times), jnp.asarray(data),
                     jnp.asarray(omega), jnp.asarray(mu), t0,
                     jnp.asarray(w), cdtype=jnp.complex128)

    dre, dim = split(data)
    wr, wi = split(omega)
    mre, mim = split(mu)
    Cre, Cim, mm_r = fit_core_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), t0, jnp.asarray(w))

    np.testing.assert_allclose(merge(Cre, Cim), np.asarray(C), atol=1e-11)
    assert abs(float(mm_r) - float(mm)) < 1e-13


def test_fit_core_real_col_mask(problem):
    times, data, omega, mu = problem
    t0 = 0.0
    w = np.asarray((times >= t0) & (times < t0 + 100.0), float)
    J = omega.shape[0]
    wr, wi = split(np.concatenate([omega, np.zeros(2, complex)]))
    mre, mim = split(np.concatenate([mu, np.ones((mu.shape[0], 2))], 1))
    dre, dim = split(data)
    mask = np.array([True] * J + [False] * 2)
    Cre, Cim, mm_p = fit_core_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), t0, jnp.asarray(w), col_mask=jnp.asarray(mask))
    assert np.all(np.asarray(Cre)[J:] == 0)
    assert np.all(np.asarray(Cim)[J:] == 0)

    wr0, wi0 = split(omega)
    mre0, mim0 = split(mu)
    Cre0, Cim0, mm0 = fit_core_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr0), jnp.asarray(wi0), jnp.asarray(mre0),
        jnp.asarray(mim0), t0, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(Cre)[:J], np.asarray(Cre0),
                               atol=1e-12)
    assert abs(float(mm_p) - float(mm0)) < 1e-13


def test_sweep_real_matches_loop(problem):
    times, data, omega, mu = problem
    t0s = np.linspace(0.0, 20.0, 6)
    Ts = np.full_like(t0s, 80.0)
    dre, dim = split(data)
    wr, wi = split(omega)
    mre, mim = split(mu)
    Cre, Cim, mm = sweep_t0_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), jnp.asarray(t0s), jnp.asarray(Ts))
    for b, t0 in enumerate(t0s):
        w = np.asarray((times >= t0) & (times < t0 + Ts[b]), float)
        C1, mm1 = fit_core(jnp.asarray(times), jnp.asarray(data),
                           jnp.asarray(omega), jnp.asarray(mu), t0,
                           jnp.asarray(w), cdtype=jnp.complex128)
        np.testing.assert_allclose(merge(Cre[b], Cim[b]), np.asarray(C1),
                                   atol=1e-10)
        assert abs(float(mm[b]) - float(mm1)) < 1e-12


def test_factored_sweep_matches_direct(problem):
    """The factored t0 sweep must equal the direct per-window kernel."""
    from qnmfits_tpu.engine_real import (
        sweep_t0_factored_real, sweep_t0_real)
    times, data, omega, mu = problem
    t0s = np.linspace(-3.0, 25.0, 11)
    Ts = np.full_like(t0s, 80.0)
    dre, dim = split(data)
    wr, wi = split(omega)
    mre, mim = split(mu)
    args = [jnp.asarray(x) for x in
            (times, dre, dim, wr, wi, mre, mim, t0s, Ts)]
    C1re, C1im, mm1 = sweep_t0_real(*args)
    C2re, C2im, mm2 = sweep_t0_factored_real(*args, chunk=4)
    np.testing.assert_allclose(np.asarray(mm2), np.asarray(mm1),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(merge(C2re, C2im), merge(C1re, C1im),
                               atol=1e-9)


def test_factored_sweep_with_padding(problem):
    from qnmfits_tpu.engine_real import sweep_t0_factored_real
    times, data, omega, mu = problem
    t0s = np.linspace(0.0, 10.0, 5)
    Ts = np.full_like(t0s, 60.0)
    J = omega.shape[0]
    omega_p = np.concatenate([omega, np.zeros(2, complex)])
    mu_p = np.concatenate([mu, np.ones((mu.shape[0], 2))], axis=1)
    mask = np.array([True] * J + [False] * 2)
    dre, dim = split(data)
    wr, wi = split(omega_p)
    mre, mim = split(mu_p)
    Cre, Cim, mm = sweep_t0_factored_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), jnp.asarray(t0s), jnp.asarray(Ts),
        col_mask=jnp.asarray(mask), chunk=4)
    assert np.all(np.asarray(Cre)[:, J:] == 0)
    wr0, wi0 = split(omega)
    mre0, mim0 = split(mu)
    from qnmfits_tpu.engine_real import sweep_t0_real
    C0re, C0im, mm0 = sweep_t0_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr0), jnp.asarray(wi0), jnp.asarray(mre0),
        jnp.asarray(mim0), jnp.asarray(t0s), jnp.asarray(Ts))
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mm0), atol=1e-12)


def test_suffix_sweep_matches_direct(problem):
    """The suffix-sum sweep must equal the direct per-window kernel."""
    from qnmfits_tpu.engine_real import (
        sweep_t0_real, sweep_t0_suffix_real)
    times, data, omega, mu = problem
    t0s = np.linspace(-3.0, 25.0, 11)
    Ts = np.full_like(t0s, 80.0)
    dre, dim = split(data)
    wr, wi = split(omega)
    mre, mim = split(mu)
    args = [jnp.asarray(x) for x in
            (times, dre, dim, wr, wi, mre, mim, t0s, Ts)]
    C1re, C1im, mm1 = sweep_t0_real(*args)
    C2re, C2im, mm2 = sweep_t0_suffix_real(*args, chunk=4)
    np.testing.assert_allclose(np.asarray(mm2), np.asarray(mm1),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(merge(C2re, C2im), merge(C1re, C1im),
                               atol=1e-8)


def test_suffix_sweep_deep_ladder():
    """Suffix sums must stay accurate for the ill-conditioned n<=7
    ladder with late windows (the cancellation-sensitive case)."""
    from qnmfits_tpu.engine import SpectrumEvaluator
    from qnmfits_tpu.engine_real import sweep_t0_real, sweep_t0_suffix_real
    from qnmfits_tpu.testing import synthetic_multimode

    modes = [(2, 2, n, 1) for n in range(8)]
    syn = synthetic_multimode(modes=modes, spherical_modes=[(2, 2), (3, 2)],
                              seed=21)
    ev = SpectrumEvaluator(modes, syn["spherical_modes"])
    omega = np.asarray(ev.omega(syn["chif"], syn["Mf"]))
    mu = np.asarray(ev.mu(syn["chif"]))
    data = np.stack([syn["data_dict"][lm] for lm in syn["spherical_modes"]])

    t0s = np.linspace(20.0, 45.0, 8)   # late windows
    Ts = np.full_like(t0s, 100.0)
    dre, dim = split(data)
    wr, wi = split(omega)
    mre, mim = split(mu)
    args = [jnp.asarray(x) for x in
            (syn["times"].astype(float), dre, dim, wr, wi, mre, mim,
             t0s, Ts)]
    _, _, mm1 = sweep_t0_real(*args)
    _, _, mm2 = sweep_t0_suffix_real(*args, chunk=8)
    np.testing.assert_allclose(np.asarray(mm2), np.asarray(mm1),
                               rtol=0, atol=1e-10)


def test_blocked_spectra_sweep_matches_per_item():
    """sweep_spectra_blocked_real (the recorded-negative blocked-Gram
    variant, PERF.md section 10) == the per-item grid kernel, including
    a non-divisible Q (padding slice) and a col_mask."""
    import jax
    from qnmfits_tpu.engine_real import (sweep_spectra_blocked_real,
                                         sweep_spectra_real)

    rng = np.random.default_rng(0)
    K, Q, J, I = 801, 37, 6, 2              # Q not a multiple of block
    times = np.linspace(0.0, 80.0, K)
    omega = (0.4 + 0.4 * rng.random((Q, J))) \
        - 1j * (0.05 + 0.4 * rng.random((Q, J)))
    mu = rng.standard_normal((Q, I, J)) + 1j * rng.standard_normal(
        (Q, I, J))
    data = rng.standard_normal((I, K)) + 1j * rng.standard_normal((I, K))
    w = ((times >= 5.0) & (times < 65.0)).astype(float)
    args = (times, data.real.copy(), data.imag.copy(),
            omega.real.copy(), omega.imag.copy(),
            mu.real.copy(), mu.imag.copy(), 5.0, w)
    for mask in (None, np.array([True] * (J - 2) + [False, False])):
        C1r, C1i, mm1 = jax.jit(
            lambda *a: sweep_spectra_real(*a, col_mask=mask,
                                          chunk=16))(*args)
        C2r, C2i, mm2 = jax.jit(
            lambda *a: sweep_spectra_blocked_real(*a, col_mask=mask,
                                                  block=16))(*args)
        np.testing.assert_allclose(np.asarray(mm2), np.asarray(mm1),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(C2r), np.asarray(C1r),
                                   rtol=0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(C2i), np.asarray(C1i),
                                   rtol=0, atol=1e-8)
        if mask is not None:
            assert np.all(np.asarray(C2r)[:, J - 2:] == 0.0)
