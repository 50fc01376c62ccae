"""Mapping-fit t0 sweep timing (PERF.md section 8): the 2048-window
mapping sweep on the factored split-complex kernel.

Workload: 4 spherical modes, 6 design columns (2 linear QNM columns +
one quadratic mapping mode's 4 identity-block columns), K=2001
samples, 2048 start times -- the shape behind the "33.5k mapping
fits/s" round-3 figure, re-measurable after kernel changes (the sweep
routes through the same factored kernel as the bench, so the analytic
window Grams apply on uniform grids).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_mapping_sweep.py
Run (CPU): JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/perf_mapping_sweep.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REPS = 5


def build():
    from qnmfits_tpu.ref_impl import get_qnm, ringdown

    Mf, chif = 0.952, 0.692
    times = np.arange(-50.0, 150.05, 0.1)          # K = 2001
    q = get_qnm()
    spherical_modes = [(2, 2), (3, 2), (4, 4), (5, 4)]
    lin_modes = [(2, 2, 0, 1), (2, 2, 1, 1)]
    quad_mode = (2, 2, 0, 1, 2, 2, 0, 1)

    rng = np.random.default_rng(7)
    amps_lin = rng.standard_normal(2) + 1j * rng.standard_normal(2)
    amp_quad = rng.standard_normal(4) + 1j * rng.standard_normal(4)

    w_lin = np.array(q.omega_list(lin_modes, chif, Mf))
    [w_quad] = q.omega_list([quad_mode], chif, Mf)

    data = {}
    for i, lm in enumerate(spherical_modes):
        mu = np.array(q.mu_list([lm + m for m in lin_modes], chif))
        h = ringdown(times, 0.0, mu * amps_lin, w_lin)
        h = h + ringdown(times, 0.0, [amp_quad[i]], [w_quad])
        scale = 1e-4 * np.max(np.abs(h))
        data[lm] = h + scale * (rng.standard_normal(len(h))
                                + 1j * rng.standard_normal(len(h)))
    modes = list(lin_modes) + [quad_mode]
    return dict(times=times, data=data, Mf=Mf, chif=chif,
                spherical_modes=spherical_modes, modes=modes,
                quad_mode=quad_mode)


def main():
    import jax

    from qnmfits_tpu.spatial_engine import mapping_mismatch_t0_array

    s = build()
    print("device:", jax.devices()[0])

    t0s = np.linspace(0.0, 40.0, 2048)
    kw = dict(T_array=100.0, spherical_modes=s["spherical_modes"])

    mm = mapping_mismatch_t0_array(
        s["times"], s["data"], s["modes"], s["Mf"], s["chif"], t0s,
        [s["quad_mode"]], engine="fast", **kw)     # warmup + compile
    ts = []
    for _ in range(REPS):
        t_ = time.perf_counter()
        mm = mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"], t0s,
            [s["quad_mode"]], engine="fast", **kw)
        np.asarray(mm)
        ts.append(time.perf_counter() - t_)
    el = min(ts)
    print(f"fast sweep: {el*1e3:7.1f} ms  {len(t0s)/el:,.0f} mapping fits/s")

    # Parity spot vs the x64 batched path on a 9-window subset.
    sub = t0s[:: len(t0s) // 9][:9]
    mm_f = mapping_mismatch_t0_array(
        s["times"], s["data"], s["modes"], s["Mf"], s["chif"], sub,
        [s["quad_mode"]], engine="fast", **kw)
    mm_b = mapping_mismatch_t0_array(
        s["times"], s["data"], s["modes"], s["Mf"], s["chif"], sub,
        [s["quad_mode"]], engine="batched", **kw)
    print(f"max |fast - batched| over 9 windows: "
          f"{np.max(np.abs(np.asarray(mm_f) - np.asarray(mm_b))):.3e}")


if __name__ == "__main__":
    main()
