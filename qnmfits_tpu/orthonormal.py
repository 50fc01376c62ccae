"""Orthonormal-mode ringdown analysis.

QNM exponentials are far from orthogonal over a finite fit window --
overtone ladders have Gram condition numbers of 1e6+ -- so raw
least-squares amplitudes are notoriously unstable and per-mode "power"
is ill-defined.  Orthonormalizing the mode functions over the window
(in the same trapezoid-weighted inner product the mismatch uses,
reference qnmfits.py:73-139) gives projection coefficients whose
squared magnitudes ADD UP: each |b_j|^2 is the new data power explained
by mode j beyond the modes listed before it, and their cumulative sum
against the data norm is a stable "how many modes matter" diagnostic.
Motivated by the orthonormal-mode ringdown programme of
arXiv:2507.12376; no counterpart exists in the reference package.

Gram-Schmidt in a Hermitian inner product IS the Cholesky factor of
the Gram matrix: with G = L L^H and the design columns phi_j, the
orthonormal functions are e = phi L^{-H}, and the data projections are
b = L^{-1} r where r_j = <phi_j, d>.  Everything here therefore reuses
the engine's closed Gram contractions -- no per-sample Gram-Schmidt
loop, and the whole analysis is three triangular solves.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["orthonormal_decomposition", "orthonormal_t0_sweep"]


def orthonormal_decomposition(times, data, modes, Mf, chif, t0,
                              t0_method="geq", T=100,
                              spherical_modes=None):
    """Project ringdown data onto window-orthonormalized QNM modes.

    Modes are orthonormalized IN THE ORDER GIVEN (Gram-Schmidt order
    matters: |b_j|^2 is the power mode j explains beyond modes
    0..j-1).  For an overtone study, list the fundamental first.

    times/data/modes/Mf/chif/t0/t0_method/T/spherical_modes: exactly as
    `multimode_ringdown_fit` (dict data) / `ringdown_fit` (array data).

    Returns a dict:
      omega        (J,) complex QNM frequencies,
      C            (J,) least-squares amplitudes in the tau-weighted
                   inner product (the projection's physical-basis
                   coordinates; close to, but not identical to,
                   `ringdown_fit`'s plain-sum-window amplitudes),
      b            (J,) orthonormal-mode projection coefficients,
      power        (J,) |b_j|^2 -- additive per-mode explained power,
      data_norm    <d, d> over the window,
      explained_fraction    sum(power)/data_norm in [0, 1],
      cumulative_explained  (J,) running explained fraction,
      mismatch     1 - sqrt(explained_fraction): the tau-product
                   projection mismatch of the full mode set.
    """
    from scipy.linalg import solve_triangular

    from .batched import _canon, _on_host, _prep
    from .engine import SpectrumEvaluator, _window, check_spin
    from .ops.windows import trapz_weights

    times, rows, sph = _prep(times, data, spherical_modes)
    check_spin(chif)
    ev = SpectrumEvaluator(list(_canon(modes)),
                           list(sph) if sph else None)
    with _on_host():        # eager complex splines never on the TPU
        omega = np.asarray(ev.omega(chif, Mf))
        mu = np.ones((1, omega.shape[0]), complex) if sph is None \
            else np.asarray(ev.mu(chif))
    J = omega.shape[0]
    if rows.shape[0] != mu.shape[0]:
        raise ValueError(
            f"data has {rows.shape[0]} spherical-mode rows but the "
            f"mixing matrix expects {mu.shape[0]}")

    with _on_host():        # eager f64 window/trapz ops never on the TPU
        w = np.asarray(_window(np.asarray(times), float(t0), float(T),
                               t0_method))
        tau = np.asarray(trapz_weights(times, w))

    # Window-clamped phases (w binary: products with w/tau unchanged,
    # no backward-in-time overflow) -- the engine.fit_core convention.
    dt = (times[:, None] - float(t0)) * w[:, None]
    phi = np.exp(-1j * omega[None, :] * dt)                  # (K, J)

    # tau-weighted Gram and data projections, sky-summed with the
    # mixing as an elementwise (J, J) factor (reference design matrix
    # qnmfits.py:628-631).
    phit = phi * tau[:, None]
    Gt_tau = phit.conj().T @ phi                             # (J, J)
    G = (mu.conj().T @ mu) * Gt_tau
    pd = np.einsum("kj,ik->ij", phit.conj(), rows)           # (I, J)
    r = np.einsum("ij,ij->j", mu.conj(), pd)                 # (J,)
    data_norm = float(np.real(
        np.sum(tau[None, :] * rows * np.conj(rows))))
    if data_norm <= 0.0:
        raise ValueError("empty fit window: no data power under the "
                         "trapezoid weights (check t0/T)")

    degenerate_msg = (
        "the mode set is numerically degenerate on this window "
        "(tau-weighted Gram is at the f64 singularity floor); drop "
        "duplicated modes or the most-damped overtones, or widen the "
        "window")
    try:
        L = np.linalg.cholesky(G)
    except np.linalg.LinAlgError as e:
        raise ValueError(degenerate_msg) from e
    d = np.real(np.diag(L))
    # potrf can squeak through an exactly singular Gram on rounding
    # noise; diag(L) ratio 1e-7 ~ Gram condition 1e14.  Physical
    # overtone ladders sit at 1e5-1e6 diag ratio -- well clear.
    if not np.all(d > 1e-7 * d.max()):
        raise ValueError(degenerate_msg)

    b = solve_triangular(L, r, lower=True)
    C = solve_triangular(L.conj().T, b, lower=False)
    power = np.abs(b) ** 2
    cum = np.cumsum(power) / data_norm
    explained = float(cum[-1])
    return {
        "omega": omega,
        "C": C,
        "b": b,
        "power": power,
        "data_norm": data_norm,
        "explained_fraction": explained,
        "cumulative_explained": cum,
        "mismatch": 1.0 - float(np.sqrt(max(explained, 0.0))),
    }


@lru_cache(maxsize=64)
def _sweep_fn(modes, sph, t0_method):
    import jax
    import jax.numpy as jnp

    from .engine import SpectrumEvaluator
    from .ops.windows import trapz_weights, window_closest, window_geq

    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)
    window = window_geq if t0_method == "geq" else window_closest

    def one(times, rows, omega, mu, args):
        t0, T = args
        w = window(times, t0, T)
        tau = trapz_weights(times, w)
        dt = (times[:, None] - t0) * w[:, None]
        phi = jnp.exp(-1j * omega[None, :] * dt)
        phit = phi * tau[:, None]
        G = (mu.conj().T @ mu) * (phit.conj().T @ phi)
        pd = jnp.einsum("kj,ik->ij", phit.conj(), rows)
        r = jnp.einsum("ij,ij->j", mu.conj(), pd)
        dn = jnp.real(jnp.sum(tau[None, :] * rows * jnp.conj(rows)))
        L = jnp.linalg.cholesky(G)      # NaN rows on a degenerate set
        b = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return jnp.abs(b) ** 2, dn

    def run(times, rows, Mf, chif, t0s, Ts):
        omega = ev.omega(chif, Mf)
        mu = jnp.ones((1, omega.shape[0]), jnp.complex128) \
            if sph is None else ev.mu(chif)
        return jax.lax.map(
            lambda a: one(times, rows, omega, mu, a), (t0s, Ts),
            batch_size=64)

    return jax.jit(run)


def orthonormal_t0_sweep(times, data, modes, Mf, chif, t0_array,
                         t0_method="geq", T_array=100,
                         spherical_modes=None):
    """`orthonormal_decomposition`'s per-mode powers over a whole t0
    axis as ONE jitted program (the sweep shape every analysis takes in
    this package): at which start time does each overtone stop carrying
    power?

    Returns a dict of arrays over the (B,) t0 axis:
      power (B, J), cumulative_explained (B, J),
      explained_fraction (B,), mismatch (B,), data_norm (B,),
      ok (B,) -- False where the mode set is numerically degenerate on
      that window (the in-jit Cholesky yields NaN there instead of
      raising like the single-shot API).
    """
    from .batched import _canon, _prep
    from .engine import check_spin, cpu_device
    import jax

    times, rows, sph = _prep(times, data, spherical_modes)
    check_spin(chif)
    t0s = np.asarray(t0_array, float)
    Ts = np.broadcast_to(np.asarray(T_array, float), t0s.shape)
    fn = _sweep_fn(_canon(modes), sph, t0_method)
    dev = cpu_device()                   # complex128: CPU backend
    power, dn = fn(*(jax.device_put(x, dev) for x in
                     (times, np.asarray(rows, complex), float(Mf),
                      float(chif), t0s, Ts)))
    power = np.asarray(power)
    dn = np.asarray(dn)
    cum = np.cumsum(power, axis=1) / dn[:, None]
    explained = cum[:, -1]
    return {
        "power": power,
        "data_norm": dn,
        "cumulative_explained": cum,
        "explained_fraction": explained,
        "mismatch": 1.0 - np.sqrt(np.maximum(explained, 0.0)),
        "ok": np.all(np.isfinite(power), axis=1),
    }
