"""Mesh-sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]


@pytest.fixture(scope="module")
def problem():
    from qnmfits_tpu.engine import SpectrumEvaluator
    from qnmfits_tpu.testing import synthetic_multimode

    syn = synthetic_multimode(seed=41)
    ev = SpectrumEvaluator(syn["modes"], syn["spherical_modes"])
    omega = np.asarray(ev.omega(syn["chif"], syn["Mf"]))
    mu = np.asarray(ev.mu(syn["chif"]))
    data = np.stack([syn["data_dict"][lm] for lm in syn["spherical_modes"]])
    data = data + 1e-3 * np.exp(-0.05 * np.abs(syn["times"]))
    # Times length divisible by mesh time axes used below.
    K = (len(syn["times"]) // 8) * 8
    f64 = np.float64
    return (syn["times"][:K].astype(f64),
            data.real[:, :K].astype(f64), data.imag[:, :K].astype(f64),
            omega.real.astype(f64), omega.imag.astype(f64),
            mu.real.astype(f64), mu.imag.astype(f64))


def test_sharded_t0_sweep_matches_single_device(cpu_devices, problem):
    """DP over start times: sharded result == unsharded result."""
    from qnmfits_tpu.engine_real import sweep_t0_real
    from qnmfits_tpu.parallel.mesh import sharded_t0_sweep_real, sweep_mesh

    import jax.numpy as jnp

    mesh = sweep_mesh(n_sweep=4, n_time=1, devices=cpu_devices[:4])
    t0s = np.linspace(0.0, 20.0, 10)   # not divisible by 4: tests padding
    Ts = np.full_like(t0s, 60.0)

    Cre_s, Cim_s, mm_s = sharded_t0_sweep_real(*problem, t0s, Ts,
                                               mesh=mesh)
    args = [jnp.asarray(x) for x in problem] + [jnp.asarray(t0s),
                                                jnp.asarray(Ts)]
    Cre_1, Cim_1, mm_1 = sweep_t0_real(*args)
    np.testing.assert_allclose(np.asarray(mm_s), np.asarray(mm_1),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Cre_s), np.asarray(Cre_1),
                               atol=1e-10)


def test_time_sharded_fit_matches_single_device(cpu_devices, problem):
    """Sequence-parallel analogue: K-sharded psum Gram == unsharded."""
    from qnmfits_tpu.engine_real import fit_core_real
    from qnmfits_tpu.parallel.mesh import sharded_fit_core_real, sweep_mesh

    import jax.numpy as jnp

    times = problem[0]
    t0, T = 3.0, 60.0
    w = ((times >= t0) & (times < t0 + T)).astype(times.dtype)

    for n_time in (2, 4):
        mesh = sweep_mesh(n_sweep=8 // n_time, n_time=n_time,
                          devices=cpu_devices)
        Cre_s, Cim_s, mm_s = sharded_fit_core_real(
            *problem, np.float64(t0), w, mesh=mesh)
        args = [jnp.asarray(x) for x in problem]
        Cre_1, Cim_1, mm_1 = fit_core_real(*args, t0, jnp.asarray(w))
        assert abs(float(mm_s) - float(mm_1)) < 1e-12, n_time
        np.testing.assert_allclose(np.asarray(Cre_s), np.asarray(Cre_1),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(Cim_s), np.asarray(Cim_1),
                                   atol=1e-10)


def test_dryrun_multichip_entrypoint(cpu_devices):
    """The driver-facing dry run must pass on the virtual mesh."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


def test_cpu_only_hardening_semantics():
    """_cpu_only_hardening scrubs plugin paths ONLY under an explicit
    JAX_PLATFORMS=cpu, and never touches an initialised jax (live-
    outage verification: PARITY.md round-4 addendum)."""
    import subprocess
    import sys
    from pathlib import Path
    root = str(Path(__file__).resolve().parents[1])
    code = """
import os, sys
sys.path.insert(0, %r)
fake = os.path.join(%r, "..", "fake.axon_site")   # never created
import __graft_entry__ as g

# Not opted in: no-op even with a plugin-looking path present.
os.environ.pop("JAX_PLATFORMS", None)
sys.path.insert(0, fake)
g._cpu_only_hardening()
assert fake in sys.path

# Opted in, jax not yet imported: the path is scrubbed.
assert "jax" not in sys.modules
os.environ["JAX_PLATFORMS"] = "cpu"
g._cpu_only_hardening()
assert fake not in sys.path

# Initialised jax: untouched (the _backends guard).
import jax
jax.devices()
import jax._src.xla_bridge as xb
n = len(xb._backend_factories)
g._cpu_only_hardening()
assert len(xb._backend_factories) == n
print("ok")
""" % (root, root)
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = ""          # no real plugin in the child
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout


def test_sharded_factored_sweep_matches_fast_kernel(cpu_devices, problem):
    """The multi-chip factored sweep == the single-chip factored kernel
    (and both == the loop oracle, covered by test_batched)."""
    from qnmfits_tpu.engine_real import sweep_t0_factored_real
    from qnmfits_tpu.parallel.mesh import (
        sharded_t0_sweep_factored, sweep_mesh)

    times, dre, dim, wr, wi, mre, mim = problem
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    t0s = np.linspace(0.0, 30.0, 48)
    Ts = np.full_like(t0s, 60.0)

    Cre_s, Cim_s, mm_s = sharded_t0_sweep_factored(
        times, dre, dim, wr, wi, mre, mim, t0s, Ts, mesh=mesh, chunk=4)
    Cre_1, Cim_1, mm_1 = sweep_t0_factored_real(
        times, dre, dim, wr, wi, mre, mim, t0s, Ts, chunk=4)
    np.testing.assert_allclose(np.asarray(mm_s), np.asarray(mm_1),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Cre_s), np.asarray(Cre_1),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Cim_s), np.asarray(Cim_1),
                               rtol=0, atol=1e-9)


def test_public_sharded_engine_matches_loop(cpu_devices):
    """mismatch_t0_array(engine='sharded') == reference loop oracle."""
    from qnmfits_tpu import mismatch_t0_array, ref_impl
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_multimode

    syn = synthetic_multimode(seed=43)
    t0s = np.linspace(0.0, 24.0, 9)
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    mm_s = mismatch_t0_array(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
        syn["chif"], t0s, spherical_modes=syn["spherical_modes"],
        engine="sharded", mesh=mesh)
    mm_l = ref_impl.mismatch_t0_array(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
        syn["chif"], t0s, spherical_modes=syn["spherical_modes"])
    np.testing.assert_allclose(mm_s, mm_l, rtol=0, atol=1e-11)


def test_sharded_modesets_sweep_matches_single_device(cpu_devices, problem):
    """Multi-chip t0 x mode-set sweep == single-device vmapped kernel."""
    import jax.numpy as jnp
    from qnmfits_tpu.engine_real import sweep_t0_modesets_factored_real
    from qnmfits_tpu.parallel.mesh import (
        sharded_t0_sweep_modesets_factored, sweep_mesh)

    times, dre, dim, wr, wi, mre, mim = problem
    # Two mode sets: the full set and a truncated (masked) one.
    J = wr.shape[0]
    wrs = np.stack([wr, wr])
    wis = np.stack([wi, wi])
    mres = np.stack([mre, mre])
    mims = np.stack([mim, mim])
    masks = np.ones((2, J), bool)
    masks[1, J // 2:] = False

    mesh = sweep_mesh(n_sweep=4, n_time=1, devices=cpu_devices[:4])
    t0s = np.linspace(0.0, 18.0, 11)   # not divisible by 4*chunk: padding
    Ts = np.full_like(t0s, 60.0)

    Cre_s, Cim_s, mm_s = sharded_t0_sweep_modesets_factored(
        times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks,
        mesh=mesh, chunk=2)
    args = [jnp.asarray(x) for x in
            (times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks)]
    Cre_1, Cim_1, mm_1 = sweep_t0_modesets_factored_real(*args, chunk=2)
    np.testing.assert_allclose(np.asarray(mm_s), np.asarray(mm_1),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Cre_s), np.asarray(Cre_1),
                               atol=1e-10)


def test_public_modesets_mesh_matches_unsharded(cpu_devices):
    """batch_mismatch_t0_modesets(mesh=...) == mesh=None."""
    from qnmfits_tpu.batched import batch_mismatch_t0_modesets
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_multimode

    syn = synthetic_multimode(seed=43)
    mode_sets = [[(2, 2, n, 1) for n in range(nmax)] for nmax in (1, 3)]
    t0s = np.linspace(0.0, 16.0, 10)
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    mm_m = batch_mismatch_t0_modesets(
        syn["times"], syn["data_dict"], mode_sets, syn["Mf"], syn["chif"],
        t0s, T_array=70.0, spherical_modes=syn["spherical_modes"],
        mesh=mesh)
    mm_1 = batch_mismatch_t0_modesets(
        syn["times"], syn["data_dict"], mode_sets, syn["Mf"], syn["chif"],
        t0s, T_array=70.0, spherical_modes=syn["spherical_modes"])
    np.testing.assert_allclose(mm_m, mm_1, rtol=0, atol=1e-12)


def test_sharded_t0_sweep_closest_method(cpu_devices, problem):
    """t0_method='closest' must actually switch windows (regression:
    the parameter was accepted but geq always ran)."""
    import jax.numpy as jnp
    from qnmfits_tpu.engine import fit_core
    from qnmfits_tpu.ops.windows import window_closest
    from qnmfits_tpu.parallel.mesh import sharded_t0_sweep, sweep_mesh

    times, dre, dim, wr, wi, mre, mim = problem
    data = dre + 1j * dim
    omega = wr + 1j * wi
    mu = mre + 1j * mim
    mesh = sweep_mesh(n_sweep=2, n_time=1, devices=cpu_devices[:2])
    # t0 strictly between samples: 'closest' and 'geq' pick different
    # window starts.
    # fraction < 0.5: 'closest' keeps sample 40, 'geq' starts at 41
    t0s = np.array([times[40] + 0.4 * (times[41] - times[40])])
    Ts = np.array([60.0])
    C_s, mm_s = sharded_t0_sweep(times, data, omega, mu, t0s, Ts,
                                 mesh=mesh, cdtype=jnp.complex128,
                                 t0_method="closest")
    w = window_closest(jnp.asarray(times), float(t0s[0]), 60.0)
    C_1, mm_1 = fit_core(jnp.asarray(times), jnp.asarray(data),
                         jnp.asarray(omega), jnp.asarray(mu),
                         float(t0s[0]), w, jnp.complex128)
    np.testing.assert_allclose(np.asarray(mm_s)[0], float(mm_1),
                               rtol=0, atol=1e-12)
    # and it must differ from the geq window result
    _, mm_g = sharded_t0_sweep(times, data, omega, mu, t0s, Ts,
                               mesh=mesh, cdtype=jnp.complex128)
    assert abs(float(mm_g[0]) - float(mm_s[0])) > 0


def test_sharded_grid_sweeps_match_fast(cpu_devices):
    """engine='sharded' grid hot loops: DP over grid points on the
    spectrum-batched kernel == single-device fast engine (VERDICT r2
    item 5)."""
    from qnmfits_tpu import fitting
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=1e-4, seed=21)
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    kw = dict(t0=5.0, T=80.0, res=9)

    mm_f = fitting.mismatch_M_chi_grid(
        syn["times"], syn["data"], syn["modes"], (0.8, 1.1), (0.4, 0.9),
        engine="fast", **kw)
    mm_s = fitting.mismatch_M_chi_grid(
        syn["times"], syn["data"], syn["modes"], (0.8, 1.1), (0.4, 0.9),
        engine="sharded", mesh=mesh, **kw)
    np.testing.assert_allclose(mm_s, mm_f, rtol=0, atol=1e-12)

    mm_fo = fitting.mismatch_omega_grid(
        syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
        syn["chif"], (0.3, 0.8), (-0.4, -0.05), engine="fast", **kw)
    mm_so = fitting.mismatch_omega_grid(
        syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
        syn["chif"], (0.3, 0.8), (-0.4, -0.05), engine="sharded",
        mesh=mesh, **kw)
    np.testing.assert_allclose(mm_so, mm_fo, rtol=0, atol=1e-12)


def test_sharded_grid_analytic_matches_summation(cpu_devices):
    """The analytic (geometric-series) Gram path through the SHARDED
    grid kernel == the unsharded summation kernel (the TPU routing of
    batched._run_spectra_sweep, exercised explicitly here because the
    CPU-backend gate keeps it off the public route in this suite)."""
    import jax.numpy as jnp

    from qnmfits_tpu.engine_real import sweep_spectra_real
    from qnmfits_tpu.parallel.mesh import sharded_spectra_sweep, sweep_mesh

    rng = np.random.default_rng(17)
    t = np.arange(-10.0, 110.0, 0.1)
    Q, J, I = 11, 4, 2
    wr = rng.uniform(0.3, 0.9, (Q, J))
    wi = -rng.uniform(0.05, 0.5, (Q, J))
    mre = rng.normal(size=(Q, I, J))
    mim = rng.normal(size=(Q, I, J))
    dre = rng.normal(size=(I, t.size))
    dim = rng.normal(size=(I, t.size))
    t0 = 3.0
    w = ((t >= t0) & (t < t0 + 70.0)).astype(float)

    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    out_s = sweep_spectra_real(t, dre, dim, wr, wi, mre, mim, t0,
                               jnp.asarray(w), chunk=4, analytic=False)
    out_a = sharded_spectra_sweep(t, dre, dim, wr, wi, mre, mim, t0, w,
                                  mesh=mesh, chunk=4, analytic=True)
    for x_s, x_a in zip(out_s, out_a):
        np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_s),
                                   rtol=0, atol=1e-12)


def test_mesh_analytic_gated_on_nonuniform_grid(cpu_devices):
    """analytic=True on a NON-uniform grid at the mesh layer falls back
    to the exact summation kernels (the _analytic_ok gate): direct
    callers never get silently wrong closed-form Grams."""
    import jax.numpy as jnp

    from qnmfits_tpu.engine_real import (sweep_spectra_real,
                                         sweep_t0_factored_real)
    from qnmfits_tpu.parallel.mesh import (
        sharded_spectra_sweep, sharded_t0_sweep_factored, sweep_mesh)

    rng = np.random.default_rng(23)
    t = np.arange(-10.0, 110.0, 0.1)
    t_nu = t + 0.01 * np.sin(np.arange(t.size))       # non-uniform
    J, I = 4, 2
    wr = rng.uniform(0.3, 0.9, J)
    wi = -rng.uniform(0.05, 0.5, J)
    mre = rng.normal(size=(I, J))
    mim = rng.normal(size=(I, J))
    dre = rng.normal(size=(I, t.size))
    dim = rng.normal(size=(I, t.size))
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)

    # Factored t0 sweep.
    t0s = np.linspace(2.0, 20.0, 8)
    Ts = np.full_like(t0s, 40.0)
    _, _, mm_ref = sweep_t0_factored_real(
        jnp.asarray(t_nu), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), jnp.asarray(t0s), jnp.asarray(Ts), chunk=4)
    _, _, mm_a = sharded_t0_sweep_factored(
        t_nu, dre, dim, wr, wi, mre, mim, t0s, Ts, mesh=mesh, chunk=4,
        analytic=True)
    np.testing.assert_allclose(np.asarray(mm_a), np.asarray(mm_ref),
                               rtol=0, atol=1e-10)

    # Spectrum-batched grid kernel.
    Q = 9
    wr_q = rng.uniform(0.3, 0.9, (Q, J))
    wi_q = -rng.uniform(0.05, 0.5, (Q, J))
    mre_q = rng.normal(size=(Q, I, J))
    mim_q = rng.normal(size=(Q, I, J))
    t0 = 3.0
    w_nu = ((t_nu >= t0) & (t_nu < t0 + 70.0)).astype(float)
    out_s = sweep_spectra_real(t_nu, dre, dim, wr_q, wi_q, mre_q, mim_q,
                               t0, jnp.asarray(w_nu), chunk=4,
                               analytic=False)
    out_a = sharded_spectra_sweep(t_nu, dre, dim, wr_q, wi_q, mre_q,
                                  mim_q, t0, w_nu, mesh=mesh, chunk=4,
                                  analytic=True)
    for x_s, x_a in zip(out_s, out_a):
        np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_s),
                                   rtol=0, atol=1e-10)


def test_factored_2d_mesh_matches_single_device(cpu_devices, problem):
    """The factored production kernel with BOTH mesh axes live (windows
    over 'sweep', time samples over 'time' with psum'd Gram sums +
    halo-free trapezoid weights) == single-device factored sweep."""
    import jax.numpy as jnp
    from qnmfits_tpu.engine_real import sweep_t0_factored_real
    from qnmfits_tpu.parallel.mesh import (
        sharded_t0_sweep_factored_2d, sweep_mesh)

    times, dre, dim, wr, wi, mre, mim = problem
    K = times.shape[0]
    K4 = K - (K % 4)               # 'time' axis of 4 needs divisibility
    times, dre, dim = times[:K4], dre[:, :K4], dim[:, :K4]
    t0s = np.linspace(2.0, 20.0, 8)
    Ts = np.full_like(t0s, 40.0)

    _, _, mm_ref = sweep_t0_factored_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), jnp.asarray(t0s), jnp.asarray(Ts), chunk=4)

    mesh = sweep_mesh(n_sweep=2, n_time=4, devices=cpu_devices)
    Cre, Cim, mm = sharded_t0_sweep_factored_2d(
        times, dre, dim, wr, wi, mre, mim, t0s, Ts, mesh=mesh, chunk=4)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mm_ref),
                               rtol=0, atol=1e-10)

    # Analytic per-shard Gram partials: each shard's contiguous
    # in-window range is its own geometric series, trapezoid
    # half-weights applied only at shard-OWNED global window edges.
    # Windows here span shard boundaries (t0=2..20, T=40 over 4 time
    # shards), exercising ownership on both sides.
    _, _, mm_a = sharded_t0_sweep_factored_2d(
        times, dre, dim, wr, wi, mre, mim, t0s, Ts, mesh=mesh, chunk=4,
        analytic=True)
    np.testing.assert_allclose(np.asarray(mm_a), np.asarray(mm_ref),
                               rtol=0, atol=1e-10)

    # Padded/ragged mode set under the sharded analytic path: the
    # nu == 0 dead column (S_m = m limit) must survive the per-shard
    # edge weights and the identity-Gram masking.
    Jp = wr.shape[0] + 1
    wr_p = np.concatenate([wr, [0.0]])
    wi_p = np.concatenate([wi, [0.0]])
    mre_p = np.concatenate([mre, np.zeros((mre.shape[0], 1))], axis=1)
    mim_p = np.concatenate([mim, np.zeros((mim.shape[0], 1))], axis=1)
    mask = np.array([True] * (Jp - 1) + [False])
    _, _, mm_pref = sweep_t0_factored_real(
        jnp.asarray(times), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr_p), jnp.asarray(wi_p), jnp.asarray(mre_p),
        jnp.asarray(mim_p), jnp.asarray(t0s), jnp.asarray(Ts),
        col_mask=mask, chunk=4)
    _, _, mm_pa = sharded_t0_sweep_factored_2d(
        times, dre, dim, wr_p, wi_p, mre_p, mim_p, t0s, Ts, mesh=mesh,
        col_mask=mask, chunk=4, analytic=True)
    np.testing.assert_allclose(np.asarray(mm_pa), np.asarray(mm_pref),
                               rtol=0, atol=1e-10)

    # analytic=True on a NON-uniform grid must fall back to the exact
    # summation kernel (the closed forms assume uniform spacing): a
    # direct caller never gets silently wrong numbers.
    times_nu = times + 0.01 * np.sin(np.arange(K4))
    _, _, mm_nuref = sweep_t0_factored_real(
        jnp.asarray(times_nu), jnp.asarray(dre), jnp.asarray(dim),
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(mre),
        jnp.asarray(mim), jnp.asarray(t0s), jnp.asarray(Ts), chunk=4)
    _, _, mm_nu = sharded_t0_sweep_factored_2d(
        times_nu, dre, dim, wr, wi, mre, mim, t0s, Ts, mesh=mesh,
        chunk=4, analytic=True)
    np.testing.assert_allclose(np.asarray(mm_nu), np.asarray(mm_nuref),
                               rtol=0, atol=1e-10)


def test_public_modesets_dynamic_mesh_matches_unsharded(cpu_devices):
    """mismatch_t0_mode_sets(dynamic=True, mesh=...) == mesh=None: the
    dynamic (set x t0) sweep is pure window-DP (the spectrum tracks
    replicate), sharded on the split-complex dynamic kernel."""
    from qnmfits_tpu.fitting import mismatch_t0_mode_sets
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=1e-6, seed=17)
    K = len(syn["times"])
    Mf_t = syn["Mf"] * (1.0 + 0.02 * np.tanh(syn["times"] / 20.0))
    chif_t = np.clip(syn["chif"] * (1.0 - 0.03 *
                                    np.exp(-syn["times"] / 30.0)),
                     0.0, 0.99)
    assert Mf_t.shape == (K,)
    mode_sets = [[(2, 2, n, 1) for n in range(nmax)] for nmax in (1, 3)]
    t0s = np.linspace(0.0, 16.0, 10)          # 10 % 8 != 0: pad+trim
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    mm_m, C_m = mismatch_t0_mode_sets(
        syn["times"], syn["data"], mode_sets, Mf_t, chif_t, t0s,
        T_array=70.0, dynamic=True, mesh=mesh, return_amplitudes=True)
    mm_1, C_1 = mismatch_t0_mode_sets(
        syn["times"], syn["data"], mode_sets, Mf_t, chif_t, t0s,
        T_array=70.0, dynamic=True, return_amplitudes=True)
    np.testing.assert_allclose(mm_m, mm_1, rtol=0, atol=1e-11)
    for a, b in zip(C_m, C_1):
        assert a.shape == b.shape              # ragged sets trimmed alike
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_sharded_free_frequency_sweep_matches_unsharded(cpu_devices):
    """free_frequency_fit_array(mesh=...) == mesh=None: the in-jit
    optimiser sweep is pure DP over t0 (VERDICT r4 item 3)."""
    from qnmfits_tpu.optimize import free_frequency_fit_array
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=0.0, seed=7)
    t0s = np.linspace(0.0, 18.0, 10)          # 10 % 8 != 0: pad+trim
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    w_m, mm_m, ok_m = free_frequency_fit_array(
        syn["times"], syn["data"], t0s, mesh=mesh, return_mismatch=True)
    w_1, mm_1, ok_1 = free_frequency_fit_array(
        syn["times"], syn["data"], t0s, return_mismatch=True)
    np.testing.assert_allclose(w_m, w_1, rtol=0, atol=1e-12)
    np.testing.assert_allclose(mm_m, mm_1, rtol=0, atol=1e-14)
    np.testing.assert_array_equal(ok_m, ok_1)


def test_sharded_free_frequency_sweep_fixed_modes(cpu_devices):
    """Same with fixed QNM modes (the bordered seed stage runs under
    shard_map) on a 2D mesh: 'sweep' shards, 'time' replicates."""
    from qnmfits_tpu.optimize import free_frequency_fit_array
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=0.0, seed=7)
    kw = dict(modes=[(2, 2, 0, 1)], Mf=syn["Mf"], chif=syn["chif"])
    t0s = np.linspace(0.0, 10.0, 5)
    mesh = sweep_mesh(n_sweep=4, n_time=2, devices=cpu_devices)
    w_m = free_frequency_fit_array(syn["times"], syn["data"], t0s,
                                   mesh=mesh, **kw)
    w_1 = free_frequency_fit_array(syn["times"], syn["data"], t0s, **kw)
    np.testing.assert_allclose(w_m, w_1, rtol=0, atol=1e-12)


def test_sharded_optimizer_runner_is_cached(cpu_devices):
    """The jitted shard_map runner must be REUSED across calls with the
    same (modes, method, maxiter, mesh): jit caches by function
    identity, so rebuilding the closure per call would recompile the
    most expensive program in the module on every invocation."""
    from qnmfits_tpu.optimize import (_free_freq_sweep_sharded_fn,
                                      free_frequency_fit_array)
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=0.0, seed=7)
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    before = _free_freq_sweep_sharded_fn.cache_info()
    kw = dict(mesh=mesh, maxiter=5)
    free_frequency_fit_array(syn["times"], syn["data"],
                             np.linspace(0.0, 8.0, 9), **kw)
    free_frequency_fit_array(syn["times"], syn["data"],
                             np.linspace(1.0, 9.0, 9), **kw)
    after = _free_freq_sweep_sharded_fn.cache_info()
    assert after.hits >= before.hits + 1       # second call reused it


def test_sharded_free_frequency_dedup_matches_direct(cpu_devices):
    """Window dedup (PERF.md section 25) composed with the mesh on the
    optimiser sweep: a t0 grid finer than the sampling shrinks to the
    distinct windows (here a non-multiple of the device count -> the
    pad+trim path) and the scattered result must equal the unsharded
    direct (dedup=False) sweep."""
    from qnmfits_tpu.optimize import free_frequency_fit_array
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=0.0, seed=7)
    t0s = np.linspace(0.0, 1.5, 25)           # 0.0625 spacing vs dt=0.1
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    w_m, mm_m, ok_m = free_frequency_fit_array(
        syn["times"], syn["data"], t0s, mesh=mesh, dedup=True,
        return_mismatch=True)
    w_0, mm_0, ok_0 = free_frequency_fit_array(
        syn["times"], syn["data"], t0s, dedup=False,
        return_mismatch=True)
    np.testing.assert_allclose(w_m, w_0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(mm_m, mm_0, rtol=0, atol=1e-10)
    np.testing.assert_array_equal(ok_m, ok_0)


def test_sharded_epsilon_sweep_matches_unsharded(cpu_devices):
    """calculate_epsilon_array(mesh=...) == mesh=None (both the array
    and dict data routes)."""
    from qnmfits_tpu.optimize import calculate_epsilon_array
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_multimode, synthetic_single

    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=0.0, seed=5)
    t0s = np.linspace(0.0, 12.0, 10)          # 10 % 8 != 0: pad+trim
    out_m = calculate_epsilon_array(syn["times"], syn["data"],
                                    syn["modes"], syn["Mf"], syn["chif"],
                                    t0s, maxiter=12, mesh=mesh)
    out_1 = calculate_epsilon_array(syn["times"], syn["data"],
                                    syn["modes"], syn["Mf"], syn["chif"],
                                    t0s, maxiter=12)
    for a, b in zip(out_m, out_1):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-10)

    mm = synthetic_multimode(seed=3)
    t0s2 = np.linspace(0.0, 8.0, 4)
    out_md = calculate_epsilon_array(
        mm["times"], mm["data_dict"], mm["modes"], mm["Mf"], mm["chif"],
        t0s2, spherical_modes=mm["spherical_modes"], maxiter=10,
        mesh=mesh)
    out_1d = calculate_epsilon_array(
        mm["times"], mm["data_dict"], mm["modes"], mm["Mf"], mm["chif"],
        t0s2, spherical_modes=mm["spherical_modes"], maxiter=10)
    for a, b in zip(out_md, out_1d):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-10)


def test_sharded_modesets_dense_grid_dedup_matches_unsharded(cpu_devices):
    """Window dedup (PERF.md section 25) composed with the mesh: on a
    t0 grid finer than the sampling, the sharded sweep runs only the
    distinct windows per device and the scattered/rephased result must
    equal both the unsharded dedup and the direct (dedup=False) path."""
    from qnmfits_tpu import batched
    from qnmfits_tpu.parallel.mesh import sweep_mesh
    from qnmfits_tpu.testing import synthetic_multimode

    syn = synthetic_multimode(seed=21)
    mode_sets = [[(2, 2, 0, 1)], [(2, 2, 0, 1), (2, 2, 1, 1)]]
    t0s = np.linspace(0.0, 12.0, 247)          # ~2x finer than dt=0.1
    mesh = sweep_mesh(n_sweep=8, n_time=1, devices=cpu_devices)
    kw = dict(T_array=60.0, spherical_modes=syn["spherical_modes"],
              return_amplitudes=True)
    args = (syn["times"], syn["data_dict"], mode_sets,
            syn["Mf"], syn["chif"], t0s)
    mm_m, C_m = batched.batch_mismatch_t0_modesets(
        *args, mesh=mesh, dedup=True, **kw)
    mm_1, C_1 = batched.batch_mismatch_t0_modesets(
        *args, dedup=True, **kw)
    mm_0, C_0 = batched.batch_mismatch_t0_modesets(
        *args, dedup=False, **kw)
    np.testing.assert_allclose(mm_m, mm_1, rtol=0, atol=1e-12)
    np.testing.assert_allclose(mm_m, mm_0, rtol=0, atol=1e-12)
    for a, b in zip(C_m, C_0):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-11)
