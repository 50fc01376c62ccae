"""Prototype: closed-form (geometric-series) window Grams on a uniform
time grid vs direct summation (PERF.md section 18 groundwork).

For uniform times t_k = t_a + m*dt inside a contiguous window, each
Gram entry sums a geometric series:

    Gt[j,l]   = sum_k w_k conj(phi_kj) phi_kl
              = e^{nu (t_a - t0)} * (z^{M+1} - 1)/(z - 1),
    z = e^{nu dt},  nu = i(conj(w_j) - w_l),

and the trapezoid-weighted Gram is the plain sum minus half the two
edge terms:  Gtau = dt * (Gt - (term_a + term_b)/2).

This script measures, in complex128 on CPU, the deviation of the
closed forms from direct summation over a realistic sweep (J=8
overtone ladder, K~1400, 401 windows), and the resulting mismatch
deviation through the full normal-equations solve.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/proto_analytic_gram.py
"""

import numpy as np


def cexpm1(x):
    """Accurate complex expm1: e^{a+ib} - 1 with a <= 0."""
    a, b = x.real, x.imag
    ea = np.exp(a)
    re = np.expm1(a) - 2.0 * ea * np.sin(b / 2.0) ** 2
    im = ea * np.sin(b)
    return re + 1j * im


def analytic_grams(w, t0, t_a, dt, M):
    """Closed-form (Gt, Gtau) for window samples t_a + m*dt, m=0..M,
    design phi = exp(-i w (t - t0))."""
    nu = 1j * (np.conj(w)[:, None] - w[None, :])           # (J, J)
    lead = np.exp(nu * (t_a - t0))
    num = cexpm1(nu * dt * (M + 1))
    den = cexpm1(nu * dt)
    small = np.abs(nu * dt) < 1e-30
    S = np.where(small, float(M + 1), num / np.where(small, 1.0, den))
    Gt = lead * S
    term_a = lead
    term_b = np.exp(nu * (t_a + M * dt - t0))
    Gtau = dt * (Gt - 0.5 * (term_a + term_b))
    return Gt, Gtau


def summed_grams(times, w, t0, win):
    phi = np.exp(-1j * w[None, :] * (times[:, None] - t0))
    ww = win.astype(float)
    Gt = (phi.conj() * ww[:, None]).T @ phi
    dts = times[1:] - times[:-1]
    seg = ww[:-1] * ww[1:] * dts * 0.5
    tau = np.concatenate([seg, [0.0]]) + np.concatenate([[0.0], seg])
    Gtau = (phi.conj() * tau[:, None]).T @ phi
    return Gt, Gtau


def main():
    from qnmfits_tpu.engine import SpectrumEvaluator

    Mf, chif = 0.952, 0.692
    modes = [(2, 2, n, 1) for n in range(8)]
    w = np.asarray(SpectrumEvaluator(modes).omega(chif, Mf))
    times = np.arange(-20.0, 120.0, 0.1)
    T = 100.0

    worst_g = worst_gt = 0.0
    t0s = np.linspace(0.0, 40.0, 401)
    for t0 in t0s:
        win = (times >= t0) & (times < t0 + T)
        idx = np.where(win)[0]
        a, b = idx[0], idx[-1]
        dt = float(times[1] - times[0])
        Gt_s, Gtau_s = summed_grams(times, w, t0, win)
        Gt_a, Gtau_a = analytic_grams(w, t0, float(times[a]), dt, b - a)
        scale = np.abs(Gt_s).max()
        worst_g = max(worst_g, np.abs(Gt_a - Gt_s).max() / scale)
        worst_gt = max(worst_gt, np.abs(Gtau_a - Gtau_s).max()
                       / np.abs(Gtau_s).max())
    print(f"windows={len(t0s)} K={times.size} J={w.size}")
    print(f"max rel |Gt_analytic  - Gt_summed|  = {worst_g:.3e}")
    print(f"max rel |Gtau_analytic - Gtau_summed| = {worst_gt:.3e}")

    # End-to-end: mismatch through the engine oracle with each Gram.
    from qnmfits_tpu import ref_impl
    rng = np.random.default_rng(3)
    amps = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    data = ref_impl.ringdown(times, 0.0, amps, w)
    worst_mm = 0.0
    for t0 in t0s[::40]:
        win = (times >= t0) & (times < t0 + T)
        idx = np.where(win)[0]
        a, b = idx[0], idx[-1]
        dt = float(times[1] - times[0])
        phi = np.exp(-1j * w[None, :] * (times[:, None] - t0))
        ww = win.astype(float)
        dts = times[1:] - times[:-1]
        seg = ww[:-1] * ww[1:] * dts * 0.5
        tau = np.concatenate([seg, [0.0]]) + np.concatenate([[0.0], seg])

        def mm_from(Gt, Gtau):
            rhs = (phi.conj() * ww[:, None]).T @ data
            C = np.linalg.solve(Gt, rhs)
            rt = (phi.conj() * tau[:, None]).T @ data
            num = np.real(np.sum(C * rt.conj()))
            mnorm = np.real(C.conj() @ (Gtau @ C))
            dnorm = np.sum(tau * np.abs(data) ** 2)
            return 1.0 - num / np.sqrt(mnorm * dnorm)

        mm_s = mm_from(*summed_grams(times, w, t0, win))
        mm_a = mm_from(*analytic_grams(w, t0, float(times[a]), dt, b - a))
        ref = ref_impl.ringdown_fit(times, data, [(2, 2, n, 1) for n in
                                                  range(8)], Mf, chif,
                                    float(t0), T=T)["mismatch"]
        worst_mm = max(worst_mm, abs(mm_a - mm_s), abs(mm_a - ref))
    print(f"max |mm_analytic - mm_summed/ref|    = {worst_mm:.3e}")


if __name__ == "__main__":
    main()
