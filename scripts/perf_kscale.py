"""K-scaling of the factored mode-set sweep: longer waveforms (denser
sampling over the same physical range) at fixed B=2048, S=16.

Usage: python scripts/perf_kscale.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from qnmfits_tpu.engine import SpectrumEvaluator
    from qnmfits_tpu.engine_real import sweep_t0_modesets_factored_real
    from qnmfits_tpu.testing import synthetic_multimode

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    Mf, chif = 0.952, 0.692
    sph = [(2, 2), (3, 2)]
    for K, dt in ((2001, 0.1), (8001, 0.025), (16001, 0.0125)):
        times = np.arange(-50.0, 150.0 + dt / 2, dt)[:K]
        with jax.default_device(cpu):
            syn = synthetic_multimode(
                modes=[(2, 2, n, 1) for n in range(8)],
                spherical_modes=sph, Mf=Mf, chif=chif, times=times,
                seed=11)
        mode_sets = (
            [[(2, 2, n, 1) for n in range(nm)] for nm in range(1, 9)]
            + [[(2, 2, n, 1) for n in range(nm)] + [(2, 2, 0, -1)]
               for nm in range(1, 5)]
            + [[(2, 2, n, 1) for n in range(nm)]
               + [(3, 2, 0, 1), (3, 2, 1, 1)] for nm in range(1, 5)])
        S = len(mode_sets)
        J = max(len(ms) for ms in mode_sets)
        omegas = np.zeros((S, J), complex)
        mus = np.zeros((S, 2, J), complex)
        masks = np.zeros((S, J), bool)
        with jax.default_device(cpu):
            for si, ms in enumerate(mode_sets):
                ev = SpectrumEvaluator(ms, sph)
                omegas[si, :len(ms)] = np.asarray(ev.omega(chif, Mf))
                mus[si, :, :len(ms)] = np.asarray(ev.mu(chif))
                masks[si, :len(ms)] = True
        data = np.stack([syn["data_dict"][lm] for lm in sph])
        B = 2048
        t0s = np.linspace(-5.0, 46.2, B)
        Ts = np.full_like(t0s, 100.0)
        f64 = np.float64
        args = [jax.device_put(np.asarray(x, f64), dev) for x in (
            times, data.real, data.imag, omegas.real, omegas.imag,
            mus.real, mus.imag, t0s, Ts)]
        args.append(jax.device_put(masks, dev))
        fn = jax.jit(lambda *a: sweep_t0_modesets_factored_real(
            *a, chunk=512))
        mm = np.asarray(fn(*args)[-1])
        ts = []
        for _ in range(3):
            t = time.perf_counter()
            mm = np.asarray(fn(*args)[-1])
            ts.append(time.perf_counter() - t)
        n = S * B
        print(f"K={K:6d}: {n/min(ts):9.0f} fits/s  {min(ts)*1e3:7.1f} ms"
              f"  nan={np.isnan(mm).sum()}", flush=True)


if __name__ == "__main__":
    main()
