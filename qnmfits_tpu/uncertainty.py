"""Statistical uncertainty of fitted QNM amplitudes.

The least-squares amplitudes of a ringdown fit (`ringdown_fit` /
`multimode_ringdown_fit`, reference qnmfits.py:142-315, 478-673) are
point estimates; overtone-significance and mode-spectroscopy claims
need their error bars.  Under the standard white-complex-noise model
d = a C + n (i.i.d. circular complex Gaussian per sample, variance
sigma^2 = E|n_k|^2), the lstsq estimator Chat = (a^H a)^{-1} a^H d has

    Cov(Chat) = sigma^2 (a^H a)^{-1},

and with sigma unknown the unbiased residual estimate is
sigma_hat^2 = ||d - a Chat||^2 / (n_obs - J)   (complex samples and
complex parameters each count once).  The design matrix `a` here is
EXACTLY the one the fits solve -- masked samples, plain (unweighted)
rows, mixing-stacked spherical modes -- so the covariance quantifies
the shipped amplitudes, not a reweighted cousin.

No counterpart exists in the reference package (it reports point
estimates only); this is a beyond-reference capability in the spirit
of the orthonormal-mode diagnostics (orthonormal.py).

Caveats stated so they cannot be mis-used silently:
* NR waveform "noise" (truncation error, junk radiation) is neither
  white nor Gaussian; for NR data the per-mode sigma is a
  scale-of-sensitivity diagnostic, not a calibrated posterior.  For
  detector-like white noise the formula is exact.
* The covariance conditions on the mode set and (Mf, chif, t0) being
  fixed; remnant/start-time uncertainty is separate (see
  `calculate_epsilon`).
"""

from __future__ import annotations

import numpy as np

__all__ = ["amplitude_uncertainty"]


def amplitude_uncertainty(times, data, modes, Mf, chif, t0,
                          t0_method="geq", T=100, spherical_modes=None,
                          sigma=None):
    """Covariance of the least-squares QNM amplitudes of one fit.

    Arguments mirror `ringdown_fit` (array data) /
    `multimode_ringdown_fit` (dict data).  `sigma`, if given, is the
    KNOWN per-sample complex noise standard deviation (E|n_k|^2 =
    sigma^2); otherwise it is estimated from the fit residual.

    Returns a dict:
      omega      (J,) complex QNM frequencies,
      C          (J,) lstsq amplitudes (identical to the fit's),
      cov        (J, J) complex Hermitian amplitude covariance,
      sigma_C    (J,) per-mode 1-sigma amplitude uncertainty,
                 sqrt(E|Chat_j - C_j|^2) = sqrt(diag cov),
      corr       (J, J) correlation matrix cov_ij/(s_i s_j): which
                 modes trade off against each other on this window,
      snr        (J,) |C_j| / sigma_C_j -- per-mode amplitude
                 significance,
      sigma2     the noise variance used (estimated unless given),
      n_obs      complex data samples in the fit (I * K_masked),
      dof        n_obs - J residual degrees of freedom.
    """
    from .batched import _canon, _prep
    from .engine import SpectrumEvaluator, _window, check_spin

    times, rows, sph = _prep(times, data, spherical_modes)
    check_spin(chif)
    ev = SpectrumEvaluator(list(_canon(modes)),
                           list(sph) if sph else None)
    omega = np.asarray(ev.omega(chif, Mf))
    mu = np.ones((1, omega.shape[0]), complex) if sph is None \
        else np.asarray(ev.mu(chif))
    J = omega.shape[0]
    if rows.shape[0] != mu.shape[0]:
        raise ValueError(
            f"data has {rows.shape[0]} spherical-mode rows but the "
            f"mixing matrix expects {mu.shape[0]}")

    mask = np.asarray(_window(np.asarray(times), float(t0), float(T),
                              t0_method)).astype(bool)
    if not np.any(mask):
        raise ValueError("empty fit window (check t0/T)")
    tm = np.asarray(times)[mask]

    # The fits' design matrix exactly (reference qnmfits.py:280-283,
    # 628-631): per spherical mode i, columns mu_ij e^{-i w_j (t-t0)},
    # vertically stacked.
    phi = np.exp(-1j * omega[None, :] * (tm - float(t0))[:, None])
    a = (mu[:, None, :] * phi[None, :, :]).reshape(-1, J)   # (I*Km, J)
    d = rows[:, mask].reshape(-1)

    C, *_ = np.linalg.lstsq(a, d, rcond=None)

    n_obs = d.shape[0]
    dof = n_obs - J
    if sigma is not None:
        sigma2 = float(sigma) ** 2
    else:
        if dof <= 0:
            raise ValueError(
                f"cannot estimate the noise level: {n_obs} samples "
                f"for {J} modes leaves no residual degrees of freedom "
                "(pass sigma= explicitly)")
        r = d - a @ C
        sigma2 = float(np.real(np.vdot(r, r))) / dof

    G = a.conj().T @ a
    try:
        L = np.linalg.cholesky(G)
    except np.linalg.LinAlgError as e:
        raise ValueError(
            "the mode set is numerically degenerate on this window "
            "(normal-equation Gram is singular); the lstsq amplitudes "
            "are a minimum-norm choice among exact ties and have no "
            "finite covariance -- drop duplicated modes or widen the "
            "window") from e
    Linv = np.linalg.solve(L, np.eye(J, dtype=L.dtype))
    Ginv = Linv.conj().T @ Linv
    cov = sigma2 * Ginv

    sigma_C = np.sqrt(np.real(np.diag(cov)))
    denom = np.outer(sigma_C, sigma_C)
    corr = np.where(denom > 0, cov / np.where(denom > 0, denom, 1.0),
                    0.0 + 0.0j)
    with np.errstate(divide="ignore"):
        snr = np.where(sigma_C > 0, np.abs(C) / sigma_C, np.inf)
    return {
        "omega": omega,
        "C": C,
        "cov": cov,
        "sigma_C": sigma_C,
        "corr": corr,
        "snr": snr,
        "sigma2": sigma2,
        "n_obs": int(n_obs),
        "dof": int(dof),
    }
