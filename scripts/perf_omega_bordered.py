"""Bordered free-omega grid kernel vs the per-item spectrum-batched
kernel (PERF.md section 15; VERDICT r3 item 2).

Hot loop #3's res=50 workload (Q=2500 grid points, K=2001 samples,
Jf=7 fixed modes + 1 free = J=8 columns, I=1): the per-item kernel
rebuilds and refactorises the full Gram at every point; the bordered
kernel factorises the shared fixed block once and does an O(Jf)
bordered solve per point.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python
scripts/perf_omega_bordered.py
"""

import time

import numpy as np

import jax

from qnmfits_tpu.engine_real import (sweep_omega_grid_bordered_real,
                                     sweep_spectra_real)

REPS = 5


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out[-1])                     # force (incl. one-time load)
    ts = []
    for _ in range(REPS):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t)
    return min(ts), out


def main():
    print("device:", jax.devices()[0])

    rng = np.random.default_rng(1)
    K, res, Jf = 2001, 50, 7
    Q = res * res
    times = np.linspace(-20.0, 180.0, K)
    # a plausible fixed 220-ladder-like spectrum
    wr = 0.55 - 0.01 * np.arange(Jf)
    wi = -0.085 * (1.0 + 2.0 * np.arange(Jf))
    re_axis = np.linspace(0.1, 1.2, res)
    im_axis = np.linspace(-0.45, -0.01, res)
    data = rng.standard_normal(K) + 1j * rng.standard_normal(K)
    w = ((times >= 0.0) & (times < 100.0)).astype(float)
    t0 = 0.0

    # -- per-item baseline (shipped fast engine pre-round-4) -----------
    RE, IM = np.meshgrid(re_axis, im_axis, indexing="ij")
    wf = (RE + 1j * IM).ravel()
    omegas = np.concatenate(
        [np.broadcast_to(wr + 1j * wi, (Q, Jf)), wf[:, None]], axis=1)
    mus = np.ones((Q, 1, Jf + 1), complex)
    base_fn = jax.jit(lambda *a: sweep_spectra_real(*a, chunk=64))
    t_base, _ = timed(base_fn, times, data.real[None].copy(),
                      data.imag[None].copy(), omegas.real.copy(),
                      omegas.imag.copy(), mus.real.copy(),
                      mus.imag.copy(), t0, w)
    print(f"per-item spectra kernel: {t_base*1e3:8.1f} ms "
          f"({Q/t_base:,.0f} fits/s)")

    # -- bordered kernel, a_chunk sweep --------------------------------
    for a_chunk in (2, 4, 8, 16, 50):
        fn = jax.jit(lambda *a, c=a_chunk:
                     sweep_omega_grid_bordered_real(*a, a_chunk=c))
        t_b, out = timed(fn, times, data.real.copy(), data.imag.copy(),
                         wr, wi, re_axis, im_axis, t0, w)
        print(f"bordered a_chunk={a_chunk:3d}:    {t_b*1e3:8.1f} ms "
              f"({Q/t_b:,.0f} fits/s, {t_base/t_b:4.1f}x)")

    # -- analytic cross Grams (PERF.md section 20) ----------------------
    for a_chunk in (4, 8, 16, 50):
        fn = jax.jit(lambda *a, c=a_chunk:
                     sweep_omega_grid_bordered_real(*a, a_chunk=c,
                                                    analytic=True))
        t_a, out_a = timed(fn, times, data.real.copy(), data.imag.copy(),
                           wr, wi, re_axis, im_axis, t0, w)
        print(f"analytic a_chunk={a_chunk:3d}:    {t_a*1e3:8.1f} ms "
              f"({Q/t_a:,.0f} fits/s, {t_base/t_a:4.1f}x)")

    # equality spot check on this workload
    _, out = timed(jax.jit(lambda *a:
                           sweep_omega_grid_bordered_real(*a, a_chunk=8)),
                   times, data.real.copy(), data.imag.copy(),
                   wr, wi, re_axis, im_axis, t0, w)
    print("max |mm_analytic - mm_bordered| =",
          np.max(np.abs(np.asarray(out_a[-1]) - np.asarray(out[-1]))))
    _, base = timed(base_fn, times, data.real[None].copy(),
                    data.imag[None].copy(), omegas.real.copy(),
                    omegas.imag.copy(), mus.real.copy(),
                    mus.imag.copy(), t0, w)
    print("max |mm_bordered - mm_per_item| =",
          np.max(np.abs(np.asarray(out[-1]) - np.asarray(base[-1]))))


if __name__ == "__main__":
    main()
