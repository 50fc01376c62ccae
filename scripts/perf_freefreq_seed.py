"""Seed-stage shoot-out for free_frequency_fit_array (PERF.md section
16; VERDICT r3 item 3): the 193-candidate seed grid per window used to
re-assemble the full Gram per candidate; the bordered route factorises
the window's fixed block once and evaluates all candidates as border
solves.

Both variants are built here from the same pieces so the comparison is
one flag, not two checkouts.  CPU x64 (the optimiser path never runs on
the TPU device).  Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python
scripts/perf_freefreq_seed.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from qnmfits_tpu.engine import SpectrumEvaluator, fit_core
from qnmfits_tpu.engine_real import (_omega_border_apply,
                                     _omega_border_prep)
from qnmfits_tpu.optimize import _newton_polish, _window
from qnmfits_tpu.testing import synthetic_single

REPS = 3

re_g = np.linspace(0.08, 1.9, 16)
im_g = np.geomspace(0.012, 0.9, 12)
GRID = np.stack(np.meshgrid(re_g, -im_g, indexing="ij"),
                axis=-1).reshape(-1, 2)


def build(modes, bordered, maxiter=30):
    ev = SpectrumEvaluator(list(modes)) if modes else None

    def one(times, data, fixed, t0, T, x0):
        w = _window(times, t0, T, "geq")

        def mm_fn(x):
            re = jnp.clip(x[0], 0.0, 2.0)
            im = jnp.clip(x[1], -1.0, 0.0)
            omega = jnp.concatenate(
                [fixed, (re + 1j * im)[None].astype(jnp.complex128)])
            mu = jnp.ones((1, omega.shape[0]))
            _, mm = fit_core(times, data, omega, mu, t0, w,
                             jnp.complex128)
            return mm

        cand = jnp.concatenate([jnp.asarray(GRID), x0[None, :]], axis=0)
        if bordered:
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
            f0 = mm_fn(cand[k])
        else:
            vals = jax.vmap(mm_fn)(cand)
            k = jnp.nanargmin(vals)
            f0 = vals[k]
        x, fx = _newton_polish(mm_fn, cand[k], f0, iters=maxiter)
        x = jnp.stack([jnp.clip(x[0], 0.0, 2.0),
                       jnp.clip(x[1], -1.0, 0.0)])
        return x, fx

    def run(times, data, Mf, chif, t0s, Ts, x0):
        fixed = ev.omega(chif, Mf) if ev is not None \
            else jnp.zeros((0,), jnp.complex128)
        return jax.vmap(one, in_axes=(None, None, None, 0, 0, None))(
            times, data, fixed, t0s, Ts, x0)

    return jax.jit(run)


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out[0])
    ts = []
    for _ in range(REPS):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0])
        ts.append(time.perf_counter() - t)
    return min(ts), out


def main():
    ladder = [(2, 2, n, 1) for n in range(7)]
    syn = synthetic_single(modes=ladder, noise=1e-6, seed=5)
    times = syn["times"]
    data = np.asarray(syn["data"], complex)[None, :]
    t0s = np.linspace(0.0, 30.0, 50)
    Ts = np.full_like(t0s, 100.0)
    x0 = np.array([1.0, -0.5])

    for label, modes in (("modes=[] (example workload)", ()),
                         ("Jf=7 fixed ladder", tuple(ladder[:7]))):
        outs = {}
        for bordered in (False, True):
            fn = build(modes, bordered)
            t, out = timed(fn, times, data, syn["Mf"], syn["chif"],
                           t0s, Ts, x0)
            outs[bordered] = (t, np.asarray(out[0]))
            print(f"{label:28s} bordered={int(bordered)}: "
                  f"{t*1e3:7.1f} ms for 50 windows "
                  f"({50/t:,.0f} windows/s)")
        dx = np.max(np.abs(outs[True][1] - outs[False][1]))
        print(f"{'':28s} speedup {outs[False][0]/outs[True][0]:.2f}x, "
              f"max |x_new - x_old| = {dx:.2e}")


if __name__ == "__main__":
    main()
