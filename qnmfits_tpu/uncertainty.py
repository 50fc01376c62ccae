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

__all__ = ["amplitude_uncertainty", "mode_selection"]


def _masked_design(times, data, modes, Mf, chif, t0, t0_method, T,
                   spherical_modes, mapping_modes=None):
    """(a, d, omega): the EXACT lstsq system one fit solves.

    Shared by `amplitude_uncertainty` and `mode_selection` so every
    statistic quantifies the shipped fit (reference design matrix
    qnmfits.py:280-283 single-mode, :628-631 multimode stacking).

    Covers every fit family of the package:
    * static (scalar Mf/chif) single- and multimode fits;
    * DYNAMIC fits (array Mf(t)/chif(t), the same routing convention
      as the fits themselves): time-dependent design entries
      mu(t_k) exp(-i omega(t_k)(t_k - t0)) (reference
      qnmfits.py:438-444, 863-864) -- `omega` is then the (Km, J)
      frequency track over the masked window;
    * MAPPING fits (``mapping_modes=``): the identity-block design of
      mapping_multimode_ringdown_fit via spatial_engine.mapping_design
      (reference spatial_mapping_functions.py:212-248) -- `omega` is
      (J,) over the expanded column list.
    """
    from .batched import _canon, _on_host, _prep
    from .engine import SpectrumEvaluator, _window, check_spin

    times, rows, sph = _prep(times, data, spherical_modes)
    dynamic = np.ndim(Mf) > 0 or np.ndim(chif) > 0

    with _on_host():        # eager f64 window op never on the TPU
        mask = np.asarray(_window(np.asarray(times), float(t0), float(T),
                                  t0_method)).astype(bool)
    if not np.any(mask):
        raise ValueError("empty fit window (check t0/T)")
    tm = np.asarray(times)[mask]
    d = rows[:, mask].reshape(-1)

    if mapping_modes is not None:
        if dynamic:
            raise ValueError(
                "mapping fits take a static (scalar) remnant")
        if sph is None:
            raise ValueError(
                "mapping fits need dict data over spherical modes")
        check_spin(chif)
        from .spatial_engine import mapping_design

        _, omega, mu = mapping_design(
            list(sph), list(_canon(modes)),
            [tuple(m) for m in mapping_modes], float(chif), float(Mf))
        omega = np.asarray(omega)
        mu = np.asarray(mu)
        J = omega.shape[0]
        phi = np.exp(-1j * omega[None, :] * (tm - float(t0))[:, None])
        a = (mu[:, None, :] * phi[None, :, :]).reshape(-1, J)
        return a, d, omega

    if dynamic:
        from .ref_impl import get_qnm

        K = np.asarray(times).shape[0]
        # Validate BEFORE masking: boolean-indexing a wrong-length
        # track would raise a cryptic IndexError first.
        if np.ndim(Mf) and np.asarray(Mf).shape[0] != K:
            raise ValueError("Mf track length != times length")
        if np.ndim(chif) and np.asarray(chif).shape[0] != K:
            raise ValueError("chif track length != times length")
        Mf_t = np.asarray(Mf)[mask] if np.ndim(Mf) \
            else np.full(len(tm), float(Mf))
        chif_t = np.asarray(chif)[mask] if np.ndim(chif) \
            else np.full(len(tm), float(chif))
        q = get_qnm()
        canon = list(_canon(modes))
        omega = np.array(q.omega_list(canon, chif_t, Mf_t)).T  # (Km, J)
        J = omega.shape[1]
        decay = np.exp(-1j * omega * (tm[:, None] - float(t0)))
        if sph is None:
            a = decay
        else:
            mu_blocks = [np.array(q.mu_list(
                [tuple(lm) + m for m in canon], chif_t)).T
                for lm in sph]                               # (Km, J)
            a = np.concatenate([mu * decay for mu in mu_blocks])
        return a, d, omega

    check_spin(chif)
    ev = SpectrumEvaluator(list(_canon(modes)),
                           list(sph) if sph else None)
    from .batched import _on_host
    with _on_host():        # eager complex splines never on the TPU
        omega = np.asarray(ev.omega(chif, Mf))
        mu = np.ones((1, omega.shape[0]), complex) if sph is None \
            else np.asarray(ev.mu(chif))
    J = omega.shape[0]
    if rows.shape[0] != mu.shape[0]:
        raise ValueError(
            f"data has {rows.shape[0]} spherical-mode rows but the "
            f"mixing matrix expects {mu.shape[0]}")

    phi = np.exp(-1j * omega[None, :] * (tm - float(t0))[:, None])
    a = (mu[:, None, :] * phi[None, :, :]).reshape(-1, J)   # (I*Km, J)
    return a, d, omega


def amplitude_uncertainty(times, data, modes, Mf, chif, t0,
                          t0_method="geq", T=100, spherical_modes=None,
                          sigma=None, mapping_modes=None):
    """Covariance of the least-squares QNM amplitudes of one fit.

    Arguments mirror `ringdown_fit` (array data) /
    `multimode_ringdown_fit` (dict data); array Mf/chif route the
    DYNAMIC design (mirroring `dynamic_*_ringdown_fit` -- `omega` in
    the result is then the (Km, J) frequency track), and
    ``mapping_modes=`` routes the mapping-fit design (mirroring
    `mapping_multimode_ringdown_fit`; the identity-block columns get
    their own sigma_C per spherical mode).  `sigma`, if given, is the
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
    a, d, omega = _masked_design(times, data, modes, Mf, chif, t0,
                                 t0_method, T, spherical_modes,
                                 mapping_modes=mapping_modes)
    J = a.shape[1]

    C, _, rank, _ = np.linalg.lstsq(a, d, rcond=None)
    if rank < J:
        # lstsq silently truncated (rcond regularisation): C would be a
        # minimum-norm solution while the Cholesky-based covariance
        # below describes the full-rank estimator -- two different
        # estimators.  Refuse, like mode_selection does.
        raise ValueError(
            f"design rank {rank} < {J} modes: the lstsq amplitudes are "
            "a minimum-norm choice with no finite covariance -- drop "
            "degenerate modes or widen the window")

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
    # invalid='ignore' too: with sigma=0 and a zero amplitude the eager
    # np.abs(C)/sigma_C branch is 0/0 before np.where discards it.
    with np.errstate(divide="ignore", invalid="ignore"):
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


def mode_selection(times, data, models, Mf, chif, t0, t0_method="geq",
                   T=100, spherical_modes=None, mapping_modes=None):
    """Rank candidate QNM mode sets on one window by AIC/BIC + F-tests.

    "How many overtones does the data actually support?" -- the
    question behind overtone-ladder studies (reference
    even_more_overtones.ipynb sweeps the ladder but offers no
    selection criterion).  Each entry of `models` is a mode list as
    accepted by `ringdown_fit`; all are fit on the SAME window with
    the same design-matrix semantics as the shipped fits.

    Treating each complex sample as two real observations with equal
    per-quadrature variance (the white-complex-noise model of
    `amplitude_uncertainty`), a J-mode fit has k = 2J + 1 real
    parameters (Re/Im amplitudes + the noise variance), N = 2 n_obs
    real observations, and concentrated Gaussian criteria

        AIC = N ln(RSS/N) + 2 k,      BIC = N ln(RSS/N) + k ln N.

    Between CONSECUTIVE candidates where the earlier mode set is a
    subset of the later (a nested pair, e.g. an overtone ladder), the
    extra-sum-of-squares F statistic and its p-value are reported:
    small p means the added modes buy statistically real residual
    reduction.  Non-nested consecutive pairs get NaN.

    Returns a dict of aligned lists/arrays over the candidates:
      models, n_modes, n_params, rss, aic, bic,
      delta_aic / delta_bic (vs the respective minimum),
      best_aic / best_bic   (argmin indices -- best_bic is THE answer),
      fstat, pvalue         ((len(models)-1,) consecutive nested tests),
      n_obs.

    Caveats: identical to `amplitude_uncertainty` -- exact for white
    complex noise, a relative diagnostic on NR truncation error.  On
    noiseless synthetic data RSS underflows to rounding noise and the
    criteria degenerate; add noise or interpret only the RSS column.
    """
    if len(models) < 2:
        raise ValueError("mode_selection needs at least two candidate "
                         "mode sets to compare")
    rss, n_par, n_modes, n_obs = [], [], [], None
    for ci, modes in enumerate(models):
        a, d, omega = _masked_design(times, data, modes, Mf, chif, t0,
                                     t0_method, T, spherical_modes,
                                     mapping_modes=mapping_modes)
        J = a.shape[1]
        C, _, rank, _ = np.linalg.lstsq(a, d, rcond=None)
        if rank < J:
            raise ValueError(
                f"candidate {ci} is numerically degenerate on this "
                f"window (design rank {rank} < {J} modes); "
                "its parameter count -- and every criterion built on "
                "it -- would be fictitious.  Drop duplicated/degenerate "
                "modes or widen the window")
        r = d - a @ C
        rss.append(float(np.real(np.vdot(r, r))))
        n_modes.append(J)
        n_par.append(2 * J + 1)
        # d is built from times/data/t0/T only, so the window is shared
        # across candidates by construction.
        n_obs = d.shape[0]
    rss = np.asarray(rss)
    n_par = np.asarray(n_par)
    N = 2 * n_obs
    if np.any(n_par >= N):
        raise ValueError(f"a candidate has {n_par.max()} parameters for "
                         f"{N} real observations")
    # Floor RSS at a denormal so noiseless round-trips stay finite.
    logterm = N * np.log(np.maximum(rss, 1e-280) / N)
    aic = logterm + 2.0 * n_par
    bic = logterm + n_par * np.log(N)

    from scipy import stats

    fstat = np.full(len(models) - 1, np.nan)
    pval = np.full(len(models) - 1, np.nan)
    for i in range(len(models) - 1):
        small = {tuple(m) for m in models[i]}
        big = {tuple(m) for m in models[i + 1]}
        if not (small < big):
            continue                      # not nested: no F-test
        # Extra-sum-of-squares test on the MEAN parameters: the shared
        # variance parameter cancels from df1 and is excluded from the
        # residual dof (df2 = N - 2 J_big, matching
        # amplitude_uncertainty's dof = n_obs - J in real counts).
        df1 = 2 * (n_modes[i + 1] - n_modes[i])
        df2 = N - 2 * n_modes[i + 1]
        num = max(rss[i] - rss[i + 1], 0.0) / df1
        den = max(rss[i + 1], 1e-280) / df2
        fstat[i] = num / den
        pval[i] = float(stats.f.sf(fstat[i], df1, df2))

    return {
        "models": list(models),
        "n_modes": np.asarray(n_modes),
        "n_params": n_par,
        "rss": rss,
        "aic": aic,
        "bic": bic,
        "delta_aic": aic - aic.min(),
        "delta_bic": bic - bic.min(),
        "best_aic": int(np.argmin(aic)),
        "best_bic": int(np.argmin(bic)),
        "fstat": fstat,
        "pvalue": pval,
        "n_obs": int(n_obs),
    }
