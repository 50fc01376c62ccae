"""Prototype 2: the integer-power expm1-form analytic Gram, exactly as
the TPU kernel will compute it (split arithmetic, bit-decomposed powers
of z = e^{nu dt}), vs direct summation and vs the ref_impl oracle.

u-form representation: u(z^p) = z^p - 1.
  squaring:  u(z^{2p}) = u^2 + 2u
  combining: u(z^{p+q}) = u_p u_q + u_p + u_q
No absolute-1 cancellation anywhere; the geometric sum is
  S_m = u(z^m) / u(z),   with the nu == 0 limit S_m = m.

The leading factor e^{nu (t_a - tref)} is a DIRECT complex exp, not a
u-form power: it multiplies every term of its Gram entry, so it needs
eps-RELATIVE accuracy even at tiny magnitudes (fast modes deep into a
chunk), where reconstructing z^n = u + 1 from u ~ -1 bottoms out at
absolute eps (measured 1.5e-6 relative on the bench ladder's n=2
diagonal before the fix).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/proto_analytic_gram2.py
"""

import numpy as np


def analytic_grams_uform(wr, wi, tref, t_first, dlt, a, m, nbits):
    """Split-complex closed-form (Gt, Gtau) for a BATCH of windows on a
    uniform grid: window b covers samples a[b] .. a[b]+m[b]-1, design
    referenced at tref.  Returns complex arrays (B, J, J)."""
    J = wr.shape[0]
    B = a.shape[0]
    nu_re = wi[:, None] + wi[None, :]
    nu_im = wr[:, None] - wr[None, :]

    # u(z), z = e^{nu dlt}  (complex expm1, small argument)
    ex = np.exp(nu_re * dlt)
    den_re = np.expm1(nu_re * dlt) - 2.0 * ex * np.sin(nu_im * dlt / 2) ** 2
    den_im = ex * np.sin(nu_im * dlt)

    a0 = a.min()
    n = (a - a0).astype(int)
    t_a0 = t_first + a0 * dlt
    s_b = (t_a0 - tref) + n * dlt
    arg_re = nu_re[None] * s_b[:, None, None]
    arg_im = nu_im[None] * s_b[:, None, None]
    e = np.exp(arg_re)
    F_re, F_im = e * np.cos(arg_im), e * np.sin(arg_im)

    usq_re, usq_im = den_re.copy(), den_im.copy()
    um_re = np.zeros((B, J, J)); um_im = np.zeros((B, J, J))
    for i in range(nbits):
        bit = ((m >> i) & 1).astype(float)[:, None, None]
        comb_re = um_re * usq_re - um_im * usq_im + usq_re
        comb_im = um_re * usq_im + um_im * usq_re + usq_im
        um_re += bit * comb_re
        um_im += bit * comb_im
        usq_re, usq_im = (usq_re * usq_re - usq_im * usq_im + 2 * usq_re,
                          2 * usq_re * usq_im + 2 * usq_im)

    den2 = den_re ** 2 + den_im ** 2
    safe = den2 > 0
    dsr = np.where(safe, den_re, 1.0)
    dsi = np.where(safe, den_im, 0.0)
    d2s = dsr * dsr + dsi * dsi
    S_re = (um_re * dsr + um_im * dsi) / d2s
    S_im = (um_im * dsr - um_re * dsi) / d2s
    mf = m.astype(float)[:, None, None]
    S_re = np.where(safe[None], S_re, mf)
    S_im = np.where(safe[None], S_im, 0.0)

    Gt_re = F_re * S_re - F_im * S_im
    Gt_im = F_re * S_im + F_im * S_re

    zm_re, zm_im = um_re + 1.0, um_im
    z_re, z_im = den_re + 1.0, den_im
    z2 = z_re * z_re + z_im * z_im
    zb_re = (zm_re * z_re[None] + zm_im * z_im[None]) / z2[None]
    zb_im = (zm_im * z_re[None] - zm_re * z_im[None]) / z2[None]
    tb_re = F_re * zb_re - F_im * zb_im
    tb_im = F_re * zb_im + F_im * zb_re
    nonempty = (m > 0).astype(float)[:, None, None]
    Gtau_re = dlt * (Gt_re - 0.5 * (F_re + tb_re)) * nonempty
    Gtau_im = dlt * (Gt_im - 0.5 * (F_im + tb_im)) * nonempty
    return Gt_re + 1j * Gt_im, Gtau_re + 1j * Gtau_im


def main():
    from qnmfits_tpu.engine import SpectrumEvaluator

    Mf, chif = 0.952, 0.692
    modes = [(2, 2, n, 1) for n in range(8)]
    w = np.asarray(SpectrumEvaluator(modes).omega(chif, Mf))
    # padded column (exact-zero omega), like the mode-set sweeps
    w = np.concatenate([w, [0.0 + 0.0j]])
    times = np.arange(-50.0, 150.05, 0.1)
    K = times.size
    nbits = int(np.ceil(np.log2(K + 1)))
    dlt = float(times[1] - times[0])

    t0s = np.linspace(-5.0, 46.2, 513)
    Ts = np.full_like(t0s, 100.0)
    tref = t0s[0]
    W = (times[None, :] >= t0s[:, None]) & (times[None, :] < (t0s + Ts)[:, None])
    a = np.sum(times[None, :] < t0s[:, None], axis=1)
    m = W.sum(axis=1)

    Gt_a, Gtau_a = analytic_grams_uform(w.real, w.imag, tref, times[0],
                                        dlt, a, m, nbits)

    # reference: direct summation in the same tref-referenced basis
    worst_g = worst_gt = 0.0
    dt0 = np.maximum(times - tref, 0.0)
    phi0 = np.exp(-1j * w[None, :] * dt0[:, None])
    dts = times[1:] - times[:-1]
    for b in range(len(t0s)):
        ww = W[b].astype(float)
        Gt_s = (phi0.conj() * ww[:, None]).T @ phi0
        seg = ww[:-1] * ww[1:] * dts * 0.5
        tau = np.concatenate([seg, [0.0]]) + np.concatenate([[0.0], seg])
        Gtau_s = (phi0.conj() * tau[:, None]).T @ phi0
        # ENTRYWISE relative error: the leading factor must hold
        # eps-relative accuracy even on tiny diagonal entries (fast
        # modes deep into a chunk) -- the matmul kernel does.
        worst_g = max(worst_g, np.max(
            np.abs(Gt_a[b] - Gt_s) / np.maximum(np.abs(Gt_s), 1e-300)))
        worst_gt = max(worst_gt, np.max(
            np.abs(Gtau_a[b] - Gtau_s)
            / np.maximum(np.abs(Gtau_s), 1e-30 * np.abs(Gtau_s).max())))
    print(f"B={len(t0s)} K={K} J={w.size} (incl. padded zero column)")
    print(f"max entrywise rel |Gt_uform  - Gt_summed|   = {worst_g:.3e}")
    print(f"max entrywise rel |Gtau_uform - Gtau_summed| = {worst_gt:.3e}")


if __name__ == "__main__":
    main()
