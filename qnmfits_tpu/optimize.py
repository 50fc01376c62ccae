"""Gradient-based ringdown optimisers.

The reference runs derivative-free Nelder-Mead with a full Python
design-matrix rebuild per simplex step (calculate_epsilon,
free_frequency_fit; /root/reference/qnmfits/qnmfits.py:1418-1594,
1905-2043).  Here the spectrum tables are differentiable splines and the
fit core is a pure JAX function, so the mismatch is differentiable in
(Mf, chif) and in a free complex frequency; one jit-compiled
value-and-gradient powers scipy L-BFGS-B (bounded, superlinear).

Both optimisers keep the reference's Nelder-Mead behaviour available via
``min_method`` for parity checks (qnmfits_tpu.fitting delegates there).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .engine import SpectrumEvaluator, _device_for, _window, fit_core

__all__ = ["calculate_epsilon_gradient", "free_frequency_fit_gradient",
           "free_frequency_fit_array", "calculate_epsilon_array"]


def _optimizer_dedup(times, t0s, Ts, t0_method):
    """Unique-window keys for the array optimisers (PERF.md section 25):
    the mismatch objective is invariant under the basis t0-shift, so
    start times whose windows hold the same samples pose the SAME
    optimisation problem; every returned quantity is window-pure, so
    the scatter needs no rephase."""
    from .batched import _window_dedup, _window_dedup_closest
    if t0_method == "geq":
        return _window_dedup(times, t0s, Ts)
    return _window_dedup_closest(times, t0s, Ts)


def _canon(modes):
    return tuple(tuple(int(x) for x in m) for m in modes)


@lru_cache(maxsize=128)
def _epsilon_objective(modes, sph, t0_method, delta):
    """jitted (mismatch, grad) as a function of (Mf, chif)."""
    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)

    def mm_fn(x, times, data, t0, T, delta_factor):
        Mf, chif = x[0], jnp.clip(x[1], 0.0, 0.99)
        omega = ev.omega(chif, Mf, delta_factor)
        mu = jnp.ones((1, omega.shape[0])) if sph is None else ev.mu(chif)
        w = _window(times, t0, T, t0_method)
        _, mm = fit_core(times, data, omega, mu, t0, w, jnp.complex128)
        return mm

    return jax.jit(jax.value_and_grad(mm_fn))


def calculate_epsilon_gradient(times, data, modes, Mf, chif, t0,
                               t0_method="geq", T=100,
                               spherical_modes=None, delta=0.0, x0=None):
    """L-BFGS-B remnant recovery on the differentiable mismatch.

    Same contract as the reference's calculate_epsilon
    (qnmfits.py:1418-1594): returns (epsilon, Mf_bestfit, chif_bestfit)
    with bounds Mf in [0, 2], chif in [0, 0.99].
    """
    from scipy.optimize import minimize
    from .ref_impl import _delta_factor

    if isinstance(data, dict):
        if spherical_modes is None:
            spherical_modes = list(data.keys())
        rows = np.stack([np.asarray(data[lm]) for lm in spherical_modes])
        sph = tuple(tuple(lm) for lm in spherical_modes)
    else:
        rows = np.asarray(data)[None, :]
        sph = None

    vg = _epsilon_objective(_canon(modes), sph, t0_method, None)
    # Reference semantics: delta applies to single-series fits only
    # ('Only used if using ringdown_fit' -- the multimode fit routes,
    # qnmfits.py:1418-1594, ignore it).  The Nelder-Mead parity path
    # does the same; applying it here gave a wildly different remnant
    # for dict data depending on min_method.
    df = np.asarray(_delta_factor(0.0 if sph is not None else delta,
                                  len(modes)))
    dev = _device_for("x64")
    args = [jax.device_put(np.asarray(a), dev)
            for a in (np.asarray(times, float), rows, float(t0), float(T),
                      df)]

    def obj(x):
        v, g = vg(jax.device_put(np.asarray(x, float), dev), *args)
        return float(v), np.asarray(g, float)

    res = minimize(obj, x0 if x0 is not None else [Mf, chif],
                   jac=True, method="L-BFGS-B",
                   bounds=[(0.0, 2.0), (0.0, 0.99)],
                   options={"ftol": 1e-15, "gtol": 1e-12})
    Mf_bf, chif_bf = res.x
    eps = float(np.sqrt((Mf_bf - Mf) ** 2 + (chif_bf - chif) ** 2))
    return eps, float(Mf_bf), float(chif_bf)


@lru_cache(maxsize=128)
def _free_freq_objective(modes, t0_method):
    """jitted (mismatch, grad) in the free complex frequency (re, im)."""
    ev = SpectrumEvaluator(list(modes)) if modes else None

    def mm_fn(x, times, data, Mf, chif, t0, T):
        if ev is not None:
            fixed = ev.omega(chif, Mf)
        else:
            fixed = jnp.zeros((0,), jnp.complex128)
        omega = jnp.concatenate(
            [fixed, (x[0] + 1j * x[1])[None].astype(jnp.complex128)])
        mu = jnp.ones((1, omega.shape[0]))
        w = _window(times, t0, T, t0_method)
        _, mm = fit_core(times, data, omega, mu, t0, w, jnp.complex128)
        return mm

    return jax.jit(jax.value_and_grad(mm_fn))


def free_frequency_fit_gradient(times, data, t0, modes=[], Mf=None,
                                chif=None, t0_method="geq", T=100,
                                x0=(1.0, -0.5)):
    """L-BFGS-B free complex-frequency fit (reference
    free_frequency_fit, qnmfits.py:1905-2043).  Returns omega_bestfit."""
    from scipy.optimize import minimize

    vg = _free_freq_objective(_canon(modes), t0_method)
    dev = _device_for("x64")
    if modes and (Mf is None or chif is None):
        # The reference fails loudly here (omega/None TypeError); a
        # silent Mf=1/chif=0 default would bias the fixed frequencies
        # and therefore the recovered free frequency.
        raise ValueError(
            "free_frequency_fit with fixed QNM modes requires Mf and "
            "chif")
    Mf_v = 1.0 if Mf is None else float(Mf)
    chif_v = 0.0 if chif is None else float(chif)
    args = [jax.device_put(np.asarray(a), dev)
            for a in (np.asarray(times, float),
                      np.asarray(data, complex)[None, :],
                      Mf_v, chif_v, float(t0), float(T))]

    def obj(x):
        v, g = vg(jax.device_put(np.asarray(x, float), dev), *args)
        return float(v), np.asarray(g, float)

    res = minimize(obj, list(x0), jac=True, method="L-BFGS-B",
                   bounds=[(0.0, 2.0), (-1.0, 0.0)],
                   options={"ftol": 1e-15, "gtol": 1e-14})
    return res.x[0] + 1j * res.x[1]


# ---------------------------------------------------------------------------
# Batched optimiser sweeps: every start time in ONE jitted program
# ---------------------------------------------------------------------------
#
# The reference's free-frequency / epsilon studies loop a scipy
# Nelder-Mead per start time (free_frequency_fitting.ipynb cell 3 around
# qnmfits.py:1905-2043; epsilon envelopes around :1418-1594) -- one
# Python round-trip per optimisation.  Here the whole t0 axis is a vmap
# over an in-jit optimiser, so B optimisations run lock-step as one
# device program.  The optimiser is deterministic seed-grid + damped
# Newton: an in-jit BFGS (jax.scipy.optimize.minimize) was measured
# both slower (line-search while_loops run lock-step across the batch)
# and less robust (stalls on the flat mid-t0 shelves of this landscape)
# than 20-30 Newton steps from the best grid seed, at equal accuracy.

def _newton_polish(mm_fn, x0, f0, iters: int = 12):
    """Damped-Newton (Levenberg) local stage for a tiny (2-D) objective.

    With only 2 parameters the exact Hessian via jax.hessian costs one
    extra fit per step and converges quadratically to the
    machine-precision optimum -- no line search, so the lock-step
    vmapped cost is a fixed `iters` fits.  Steps that fail to decrease
    the objective are rejected and the damping grows (NaN-safe: a NaN
    trial never replaces x).
    """
    eye = jnp.eye(x0.shape[0], dtype=x0.dtype)

    def body(carry, _):
        x, fx, lam = carry
        g = jax.grad(mm_fn)(x)
        H = jax.hessian(mm_fn)(x)
        step = jnp.linalg.solve(H + lam * eye, -g)
        xn = x + step
        fn_ = mm_fn(xn)
        better = fn_ < fx
        x = jnp.where(better, xn, x)
        fx = jnp.where(better, fn_, fx)
        lam = jnp.where(better, lam * 0.3, lam * 8.0)
        return (x, fx, lam), None

    # Initial damping derived from f0 (not a fresh constant) so it
    # carries f0's varying-manual-axes under shard_map: the carry's
    # vma must be loop-invariant (scan-vma rule).
    lam0 = jnp.zeros_like(f0) + 1e-9
    (x, fx, _), _ = jax.lax.scan(body, (x0, f0, lam0), None,
                                 length=iters)
    return x, fx


@lru_cache(maxsize=64)
def _free_freq_sweep_parts(modes, t0_method, maxiter):
    """(ev, one): the spectrum evaluator and the per-window optimiser.

    Shared by the single-device vmapped program and the mesh-sharded
    runner so both run the IDENTICAL per-window computation."""
    ev = SpectrumEvaluator(list(modes)) if modes else None

    # Deterministic coarse seeding over the scipy path's search box
    # (re in (0, 2), im in (-1, 0)): the mid-t0 landscape has spurious
    # shelves where a single-start quasi-Newton stalls; evaluating a
    # static candidate grid is a tiny vmapped batch of fits and puts
    # the local stage inside the right basin.
    re_g = np.linspace(0.08, 1.9, 16)
    im_g = np.geomspace(0.012, 0.9, 12)
    GRID = np.stack(np.meshgrid(re_g, -im_g, indexing="ij"),
                    axis=-1).reshape(-1, 2)

    def one(times, data, fixed, t0, T, x0):
        w = _window(times, t0, T, t0_method)

        def mm_fn(x):
            # Same box as the scipy path's L-BFGS-B bounds
            # (re in [0, 2], im in [-1, 0]): the clip keeps an accepted
            # Newton step from wandering into growing-mode territory
            # where the two paths would silently diverge.
            re = jnp.clip(x[0], 0.0, 2.0)
            im = jnp.clip(x[1], -1.0, 0.0)
            omega = jnp.concatenate(
                [fixed, (re + 1j * im)[None].astype(jnp.complex128)])
            mu = jnp.ones((1, omega.shape[0]))
            _, mm = fit_core(times, data, omega, mu, t0, w,
                             jnp.complex128)
            return mm

        cand = jnp.concatenate([jnp.asarray(GRID), x0[None, :]], axis=0)
        # Bordered seed evaluation (VERDICT r3 item 3): every candidate
        # shares this window's fixed-QNM Gram block, so assemble and
        # factorise it ONCE and evaluate the 193 candidates as cheap
        # bordered border solves (engine_real._omega_border_*) instead
        # of 193 full Gram assemblies + Cholesky factorisations.  The
        # bordered mismatch agrees with mm_fn's to ~1e-11 -- only the
        # argmin is consumed; the winner is re-evaluated exactly.
        from .engine_real import _omega_border_apply, _omega_border_prep

        prep = _omega_border_prep(times, jnp.real(data[0]),
                                  jnp.imag(data[0]), jnp.real(fixed),
                                  jnp.imag(fixed), t0, w)
        dt = prep[0]
        cre = jnp.clip(cand[:, 0], 0.0, 2.0)
        cim = jnp.clip(cand[:, 1], -1.0, 0.0)
        Ef = jnp.exp(cim[:, None] * dt[None, :])
        ph = cre[:, None] * dt[None, :]
        *_, vals = _omega_border_apply(prep, Ef * jnp.cos(ph),
                                       -Ef * jnp.sin(ph), Ef * Ef)
        k = jnp.nanargmin(vals)
        x, fx = _newton_polish(mm_fn, cand[k], mm_fn(cand[k]),
                               iters=maxiter)
        x = jnp.stack([jnp.clip(x[0], 0.0, 2.0),
                       jnp.clip(x[1], -1.0, 0.0)])
        # Converged = first-order stationary at the final point (a
        # stalled polish on a shelf leaves a large gradient).
        ok = jnp.linalg.norm(jax.grad(mm_fn)(x)) < 1e-7
        return x, fx, ok

    return ev, one


@lru_cache(maxsize=64)
def _free_freq_sweep_fn(modes, t0_method, maxiter):
    ev, one = _free_freq_sweep_parts(modes, t0_method, maxiter)

    def run(times, data, Mf, chif, t0s, Ts, x0):
        fixed = ev.omega(chif, Mf) if ev is not None \
            else jnp.zeros((0,), jnp.complex128)
        return jax.vmap(one, in_axes=(None, None, None, 0, 0, None))(
            times, data, fixed, t0s, Ts, x0)

    return jax.jit(run)


@lru_cache(maxsize=64)
def _free_freq_sweep_sharded_fn(modes, t0_method, maxiter, mesh):
    """Cached jitted shard_map runner (jit caches by function identity,
    so the closure must be built once per (modes, method, maxiter,
    mesh) -- same rule as every other *_fn here)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ev, one = _free_freq_sweep_parts(modes, t0_method, maxiter)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("sweep"), P("sweep"), P()),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, data_, fixed_, t0_loc, T_loc, x0_):
        return jax.vmap(one, in_axes=(None, None, None, 0, 0, None))(
            times_, data_, fixed_, t0_loc, T_loc, x0_)

    return ev, jax.jit(run)


def _free_freq_sweep_sharded(modes, t0_method, maxiter, mesh,
                             times, data, Mf, chif, t0s, Ts, x0):
    """Mesh-sharded free-frequency sweep: start times DP over 'sweep'.

    Pure data parallelism (SURVEY section 2.6's only parallel axis for
    this workload): every device runs the IDENTICAL per-window
    seed-grid + damped-Newton optimiser on its t0 block; the only
    communication is the result all-gather.  x64/complex work, so this
    targets CPU meshes (and future TPU generations with native f64) --
    the split-complex TPU sweeps are the batched.* surfaces."""
    from .batched import _on_host
    from .parallel.mesh import _pad_to

    ev, fn = _free_freq_sweep_sharded_fn(modes, t0_method, maxiter, mesh)
    n_sweep = mesh.shape["sweep"]
    t0s_p, B = _pad_to(np.asarray(t0s, float), n_sweep)
    Ts_p, _ = _pad_to(np.asarray(Ts, float), n_sweep)
    if ev is not None:
        with _on_host():    # eager complex splines never on the TPU
            fixed = np.asarray(ev.omega(chif, Mf))
    else:
        fixed = np.zeros((0,), complex)

    x, mm, ok = fn(np.asarray(times, float), np.asarray(data, complex),
                   fixed, t0s_p, Ts_p, np.asarray(x0, float))
    return x[:B], mm[:B], ok[:B]


def free_frequency_fit_array(times, data, t0_array, modes=[], Mf=None,
                             chif=None, t0_method="geq", T_array=100,
                             x0=(1.0, -0.5), maxiter=30,
                             return_mismatch=False, mesh=None,
                             dedup=True):
    """Free complex-frequency fit at EVERY start time in one program.

    The in-jit equivalent of looping free_frequency_fit over t0_array
    (the reference's free_frequency_fitting.ipynb cell-3 loop: one
    scipy optimisation and device round-trip per t0): a deterministic
    seed grid over the search box then `maxiter` damped-Newton steps,
    vmapped over the whole t0 axis.  Matches the per-item gradient path
    to <= 1e-6 in omega (tests/test_optimize.py).

    Returns omega_bestfit (B,) complex; with return_mismatch=True also
    the (B,) mismatch at the optimum and the (B,) success mask.

    With ``mesh=`` (a ``parallel.mesh.sweep_mesh``) the t0 axis is
    sharded over the mesh's 'sweep' devices -- pure DP, identical
    per-window computation, one result all-gather.

    dedup=True (default) optimises each DISTINCT window once on t0
    grids finer than the data sampling (batched._window_dedup, PERF.md
    section 25): the objective is phase-invariant in t0 (the basis
    shift is a column rescale), so duplicate windows pose the same
    optimisation problem and every returned quantity (omega, mismatch,
    success) is window-pure -- the scatter needs no rephase.
    """
    if modes and (Mf is None or chif is None):
        raise ValueError(
            "free_frequency_fit with fixed QNM modes requires Mf and chif")
    from .engine import check_spin
    check_spin(chif)
    t0s = np.asarray(t0_array, float)
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))
    dd = _optimizer_dedup(times, t0s, Ts, t0_method) if dedup else None
    if dd is not None:
        rep, inverse = dd
        t0s, Ts = t0s[rep], Ts[rep]
    if mesh is not None:
        x, mm, ok = _free_freq_sweep_sharded(
            _canon(modes), t0_method, int(maxiter), mesh,
            times, np.asarray(data, complex)[None, :],
            1.0 if Mf is None else float(Mf),
            0.0 if chif is None else float(chif), t0s, Ts,
            np.asarray(x0, float))
    else:
        fn = _free_freq_sweep_fn(_canon(modes), t0_method, int(maxiter))
        dev = _device_for("x64")
        args = [jax.device_put(np.asarray(a), dev)
                for a in (np.asarray(times, float),
                          np.asarray(data, complex)[None, :],
                          1.0 if Mf is None else float(Mf),
                          0.0 if chif is None else float(chif),
                          t0s, Ts, np.asarray(x0, float))]
        x, mm, ok = fn(*args)
    x = np.asarray(x)
    if dd is not None:
        x = x[inverse]
        mm = np.asarray(mm)[inverse]
        ok = np.asarray(ok)[inverse]
    omega = x[:, 0] + 1j * x[:, 1]
    if return_mismatch:
        return omega, np.asarray(mm), np.asarray(ok)
    return omega


@lru_cache(maxsize=64)
def _epsilon_sweep_parts(modes, sph, t0_method, maxiter):
    """(one,): the per-window tiered-seed remnant optimiser (shared by
    the vmapped program and the mesh-sharded runner)."""
    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)

    # Local seed offsets around the caller's x0 (the true remnant, as
    # in the reference): the optimum is near-interior by construction,
    # a +-0.12 patch of candidates guards against starting on a shelf.
    d = np.linspace(-0.12, 0.12, 5)
    OFFS = np.stack(np.meshgrid(d, d, indexing="ij"), -1).reshape(-1, 2)
    # Coarse bounded global (Mf, chif) grid for cold starts (the
    # reference's bounded global Nelder-Mead intent,
    # qnmfits.py:1519-1537).  A single argmin over coarse samples is
    # NOT enough: overtone models are flexible enough that a
    # wrong-remnant ridge can coarse-score BELOW the sample nearest
    # the true remnant (measured on the 4-overtone synthetic: 2.5e-4
    # on the ridge vs 6e-4 at 0.03 from truth, whose own mismatch is
    # ~1e-16 -- the true basin is razor thin).  So: refine a local
    # patch around each of the top-NPOL coarse cells, Newton-polish
    # every refined winner AND the x0-patch winner, and keep the best
    # POLISHED endpoint.  A good x0's trajectory is unchanged -- its
    # polished fit wins the final comparison.
    gm = np.linspace(0.3, 1.9, 8)
    gc = np.linspace(0.0, 0.95, 8)
    GLOBAL = np.stack(np.meshgrid(gm, gc, indexing="ij"), -1).reshape(-1, 2)
    NPOL = 4

    def one(times, data, t0, T, delta_factor, x0):
        w = _window(times, t0, T, t0_method)

        def mm_fn(x):
            # Same interior clip as the single-fit objective: the
            # L-BFGS-B bounds (Mf in [0,2], chif in [0,0.99]) protect an
            # interior optimum; outside starts are clipped back.
            Mf = jnp.clip(x[0], 1e-3, 2.0)
            chif = jnp.clip(x[1], 0.0, 0.99)
            omega = ev.omega(chif, Mf, delta_factor)
            mu = jnp.ones((1, omega.shape[0])) if sph is None \
                else ev.mu(chif)
            _, mm = fit_core(times, data, omega, mu, t0, w,
                             jnp.complex128)
            return mm

        cand_l = x0[None, :] + jnp.asarray(OFFS)
        vals_l = jax.vmap(mm_fn)(cand_l)
        k_l = jnp.nanargmin(vals_l)

        vals_g = jax.vmap(mm_fn)(jnp.asarray(GLOBAL))
        _, top = jax.lax.top_k(-jnp.nan_to_num(vals_g, nan=jnp.inf),
                               NPOL)
        patches = (jnp.asarray(GLOBAL)[top][:, None, :]
                   + jnp.asarray(OFFS)[None])          # (NPOL, 25, 2)
        vals_p = jax.vmap(jax.vmap(mm_fn))(patches)
        k_p = jnp.nanargmin(vals_p, axis=1)
        rows = jnp.arange(NPOL)

        seeds = jnp.concatenate([cand_l[k_l][None], patches[rows, k_p]])
        f0 = jnp.concatenate([vals_l[k_l][None], vals_p[rows, k_p]])
        xs, fxs = jax.vmap(
            lambda s, f: _newton_polish(mm_fn, s, f, iters=maxiter)
        )(seeds, f0)
        # Prefer the x0-seeded endpoint unless a global one is
        # MEANINGFULLY better: near the optimum all polished fits agree
        # to ~machine eps and an unbiased argmin would break the tie
        # arbitrarily (measured: a warm-start example's recovered
        # remnant moved 1e-12 -> 1e-7 from such a tie flip).
        f_loc = fxs[0]
        margin = jnp.where(jnp.isnan(f_loc), 0.0,
                           jnp.maximum(1e-13, 1e-6 * jnp.abs(f_loc)))
        j = jnp.nanargmin(fxs + margin * (jnp.arange(NPOL + 1) > 0))
        x, fx = xs[j], fxs[j]
        x = x.at[0].set(jnp.clip(x[0], 1e-3, 2.0))
        x = x.at[1].set(jnp.clip(x[1], 0.0, 0.99))
        # Converged = first-order stationary at the final point.
        ok = jnp.linalg.norm(jax.grad(mm_fn)(x)) < 1e-7
        return x, fx, ok

    return one


@lru_cache(maxsize=64)
def _epsilon_sweep_fn(modes, sph, t0_method, maxiter):
    one = _epsilon_sweep_parts(modes, sph, t0_method, maxiter)

    def run(times, data, t0s, Ts, delta_factor, x0):
        return jax.vmap(one, in_axes=(None, None, 0, 0, None, None))(
            times, data, t0s, Ts, delta_factor, x0)

    return jax.jit(run)


@lru_cache(maxsize=64)
def _epsilon_sweep_sharded_fn(modes, sph, t0_method, maxiter, mesh):
    """Cached jitted shard_map runner (see _free_freq_sweep_sharded_fn)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    one = _epsilon_sweep_parts(modes, sph, t0_method, maxiter)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("sweep"), P("sweep"), P(), P()),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, data_, t0_loc, T_loc, df_, x0_):
        return jax.vmap(one, in_axes=(None, None, 0, 0, None, None))(
            times_, data_, t0_loc, T_loc, df_, x0_)

    return jax.jit(run)


def _epsilon_sweep_sharded(modes, sph, t0_method, maxiter, mesh,
                           times, rows, t0s, Ts, df, x0):
    """Mesh-sharded epsilon sweep: start times DP over 'sweep' (the
    same layout as _free_freq_sweep_sharded; x64 work, CPU meshes)."""
    from .parallel.mesh import _pad_to

    fn = _epsilon_sweep_sharded_fn(modes, sph, t0_method, maxiter, mesh)
    n_sweep = mesh.shape["sweep"]
    t0s_p, B = _pad_to(np.asarray(t0s, float), n_sweep)
    Ts_p, _ = _pad_to(np.asarray(Ts, float), n_sweep)

    x, mm, ok = fn(np.asarray(times, float), np.asarray(rows, complex),
                   t0s_p, Ts_p, np.asarray(df), np.asarray(x0, float))
    return x[:B], mm[:B], ok[:B]


def calculate_epsilon_array(times, data, modes, Mf, chif, t0_array,
                            t0_method="geq", T_array=100,
                            spherical_modes=None, delta=0.0, x0=None,
                            maxiter=30, return_remnant=True, mesh=None,
                            dedup=True):
    """Remnant recovery (epsilon) at EVERY start time in one program.

    The in-jit (seed patch + damped Newton, vmapped) equivalent of
    looping calculate_epsilon over t0_array (reference
    qnmfits.py:1418-1594 per start time).  Returns
    (eps (B,), Mf_bf (B,), chif_bf (B,)) -- or just eps with
    return_remnant=False.

    Seeding is tiered: a +-0.12 patch around x0 (default [Mf, chif],
    the reference's own start) plus a coarse bounded global (Mf, chif)
    grid whose best cells are patch-refined; the x0-patch winner and
    each refined global winner are Newton-polished independently and
    the best POLISHED endpoint is returned.  A cold-start x0 far from
    the optimum therefore still recovers the global basin (the
    reference's bounded global Nelder-Mead behaviour,
    qnmfits.py:1519-1537) even when a wrong-remnant ridge out-scores
    the true basin at coarse resolution; a good x0 is unaffected (its
    polished fit wins the final comparison).

    With ``mesh=`` (a ``parallel.mesh.sweep_mesh``) the t0 axis is
    sharded over the mesh's 'sweep' devices -- pure DP, identical
    per-window computation, one result all-gather.

    dedup=True (default) optimises each DISTINCT window once on t0
    grids finer than the data sampling (batched._window_dedup, PERF.md
    section 25): the mismatch objective is invariant under the basis
    t0-shift, so duplicate windows pose the same remnant-recovery
    problem and (eps, Mf, chif) are window-pure.
    """
    from .ref_impl import _delta_factor
    from .engine import check_spin
    check_spin(chif)

    if isinstance(data, dict):
        if spherical_modes is None:
            spherical_modes = list(data.keys())
        rows = np.stack([np.asarray(data[lm]) for lm in spherical_modes])
        sph = tuple(tuple(lm) for lm in spherical_modes)
    else:
        rows = np.asarray(data)[None, :]
        sph = None

    df = np.asarray(_delta_factor(0.0 if sph is not None else delta,
                                  len(modes)))
    t0s = np.asarray(t0_array, float)
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))
    x0_v = np.asarray(x0 if x0 is not None else [Mf, chif], float)
    dd = _optimizer_dedup(times, t0s, Ts, t0_method) if dedup else None
    if dd is not None:
        rep, inverse = dd
        t0s, Ts = t0s[rep], Ts[rep]
    if mesh is not None:
        x, mm, ok = _epsilon_sweep_sharded(
            _canon(modes), sph, t0_method, int(maxiter), mesh,
            times, rows, t0s, Ts, df, x0_v)
    else:
        fn = _epsilon_sweep_fn(_canon(modes), sph, t0_method,
                               int(maxiter))
        dev = _device_for("x64")
        args = [jax.device_put(np.asarray(a), dev)
                for a in (np.asarray(times, float), rows, t0s, Ts, df,
                          x0_v)]
        x, mm, ok = fn(*args)
    x = np.asarray(x)
    if dd is not None:
        x = x[inverse]
    eps = np.sqrt((x[:, 0] - Mf) ** 2 + (x[:, 1] - chif) ** 2)
    if return_remnant:
        return eps, x[:, 0], x[:, 1]
    return eps
