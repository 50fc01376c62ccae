"""Grid-engine analytic-Gram timing (PERF.md section 19): the
spectrum-batched (Mf, chif) grid kernel on the PERF.md section 10
workload (res=50 grid, 7-overtone ladder, K=2001), summation Grams vs
closed-form geometric-series Grams.

The spectrum is the REAL (2,2,n) ladder over the grid (the production
workload): random frequencies can land nearly coincident, driving the
Gram condition number to ~1e12 where BOTH paths' last-ulp differences
are kappa-amplified into the 1e-6 range -- physical spectra stay
well-conditioned and the two paths agree at the 1e-12 level.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_grid_analytic.py
Run (CPU): JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/perf_grid_analytic.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from qnmfits_tpu.batched import _on_host
    from qnmfits_tpu.engine import SpectrumEvaluator
    from qnmfits_tpu.engine_real import sweep_spectra_real
    from qnmfits_tpu.ref_impl import ringdown

    dev = jax.devices()[0]
    print("device:", dev)

    # PERF.md section 10 workload: res=50 -> Q=2500 grid points,
    # J=7 overtones, K=2001 samples, I=1.
    res, J, K = 50, 7, 2001
    modes = [(2, 2, n, 1) for n in range(J)]
    times = np.arange(-20.0, 180.05, 0.1)[:K]
    Mf_axis = np.linspace(0.90, 1.00, res)
    chif_axis = np.linspace(0.60, 0.80, res)
    MM, CC = np.meshgrid(Mf_axis, chif_axis, indexing="ij")

    ev = SpectrumEvaluator(modes)
    with _on_host():
        omegas = np.asarray(ev.omega(CC.ravel(), MM.ravel())).T  # (Q, J)
        w_true = np.asarray(ev.omega(0.692, 0.952))
    rng = np.random.default_rng(0)
    A = rng.normal(size=J) + 1j * rng.normal(size=J)
    data = ringdown(times, 0.0, A, w_true)[None, :]
    mus = np.ones((omegas.shape[0], 1, J))

    t0 = 5.0
    w = ((times >= t0) & (times < t0 + 100.0)).astype(float)
    Q = omegas.shape[0]

    f64 = np.float64
    args_np = (times.astype(f64), data.real.astype(f64),
               data.imag.astype(f64), omegas.real.astype(f64),
               omegas.imag.astype(f64), mus.astype(f64),
               np.zeros_like(mus), f64(t0), w.astype(f64))
    args = [jax.device_put(np.asarray(x), dev) for x in args_np]

    mm_ref = None
    for analytic in (False, True):
        fn = jax.jit(lambda *a, _an=analytic: sweep_spectra_real(
            *a, chunk=64, analytic=_an))
        _, _, mm = fn(*args)
        mm0 = np.asarray(mm)                       # warmup + program load
        reps = []
        for _ in range(5):
            t0_ = time.perf_counter()
            _, _, mm = fn(*args)
            np.asarray(mm)
            reps.append(time.perf_counter() - t0_)
        el = min(reps)
        label = "analytic" if analytic else "summation"
        print(f"{label:9s}: {el*1e3:7.1f} ms  {Q/el:,.0f} fits/s")
        if analytic:
            d = np.abs(mm0 - mm_ref)
            print(f"|mm_analytic - mm_summation|: max {np.max(d):.3e}  "
                  f"median {np.median(d):.3e}")
        else:
            mm_ref = mm0


if __name__ == "__main__":
    main()
