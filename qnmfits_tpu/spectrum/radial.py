"""Leaver continued-fraction solver for Kerr quasinormal frequencies.

Solves the radial Teukolsky equation's QNM boundary-value problem with
Leaver's (1985) three-term-recurrence continued fraction, with the angular
separation constant A supplied by the spectral solver in
``qnmfits_tpu.spectrum.angular``.

This module is the from-scratch replacement for the external ``qnm``
package's Leaver solver whose cached tables the reference loads
(/root/reference/qnmfits/qnm.py:134).  It is host-side NumPy: the output is
baked into interpolation tables consumed on TPU (see tables.py).

Units
-----
Public API uses the standard M=1 convention: spin chi in [0, 1), frequency
M*omega.  Internally the CF uses Leaver's 2M=1 convention:

    a_L = chi / 2,   omega_L = 2 * (M omega),   c = a_L * omega_L = chi * M omega.

Tail handling
-------------
The infinite continued-fraction tail is started at depth N from the Nollert
(1993)-style asymptotic expansion of the minimal-solution ratio

    r_n = a_{n+1}/a_n ~ 1 + u n^{-1/2} + v n^{-1},
    u = -sqrt(-2 i b omega_L),   v = (u^2 + 1/2 + G1 - A1) / 2,

(derived order-by-order from the recurrence; see solver tests) and recursed
downward.  The error injected at depth N is damped like exp(-2|Re u| sqrt(N)),
so modest N gives near-machine accuracy away from the imaginary axis.
"""

from __future__ import annotations

import numpy as np

__all__ = ["leaver_coeffs", "radial_cf", "solve_omega"]


def leaver_coeffs(s: int, m: int, a: float, omega, A):
    """Leaver's c0..c4 for the Kerr radial recurrence (2M=1 units).

    Parameters are in Leaver units: ``a`` in [0, 0.5), ``omega`` = omega_L,
    ``A`` the standard angular separation constant (A -> l(l+1) - s(s+1) as
    a*omega -> 0).  ``omega`` and ``A`` may be broadcasting ndarrays.
    """
    omega = np.asarray(omega, dtype=complex)
    A = np.asarray(A, dtype=complex)
    b = np.sqrt(1.0 - 4.0 * a * a)
    phi = omega / 2.0 - a * m  # recurring combination (omega/2 - a m)

    c0 = 1.0 - s - 1j * omega - (2j / b) * phi
    c1 = -4.0 + 2j * omega * (2.0 + b) + (4j / b) * phi
    c2 = s + 3.0 - 3j * omega - (2j / b) * phi
    c3 = (
        omega**2 * (4.0 + 2.0 * b - a * a)
        - 2.0 * a * m * omega
        - s
        - 1.0
        + (2.0 + b) * 1j * omega
        - A
        + ((4.0 * omega + 2j) / b) * phi
    )
    c4 = s + 1.0 - 2.0 * omega**2 - (2.0 * s + 3.0) * 1j * omega \
        - ((4.0 * omega + 2j) / b) * phi
    return c0, c1, c2, c3, c4


def _alpha_beta_gamma(n, c0, c1, c2, c3, c4):
    """Three-term recurrence coefficients at index n (broadcasting)."""
    alpha = n * n + (c0 + 1.0) * n + c0
    beta = -2.0 * n * n + (c1 + 2.0) * n + c3
    gamma = n * n + (c2 - 3.0) * n + c4 - c2 + 2.0
    return alpha, beta, gamma


def radial_cf(omega, a: float, A, s: int, m: int, n_inv: int,
              N: int = 4000):
    """Evaluate the n_inv-times-inverted Leaver continued fraction.

    All of ``omega``/``A`` may be ndarrays of a common shape (the spin grid
    or a Newton batch); the recursions run in lockstep across the array.
    A zero of this function in ``omega`` (Leaver units) is the QNM with
    overtone number ``n_inv`` (the inversion selects the overtone's
    convergence basin, per Leaver 1985).

    Returns the CF residual, same shape as ``omega``.
    """
    omega = np.asarray(omega, dtype=complex)
    A = np.broadcast_to(np.asarray(A, dtype=complex), omega.shape)
    c0, c1, c2, c3, c4 = leaver_coeffs(s, m, a, omega, A)

    b = np.sqrt(1.0 - 4.0 * a * a)

    # Upward (finite) part: U_k = beta_k - alpha_{k-1} gamma_k / U_{k-1}.
    alpha_prev = None
    U = None
    for k in range(n_inv + 1):
        alpha_k, beta_k, gamma_k = _alpha_beta_gamma(float(k), c0, c1, c2, c3, c4)
        if k == 0:
            U = beta_k.copy() if hasattr(beta_k, "copy") else beta_k
        else:
            U = beta_k - alpha_prev * gamma_k / U
        alpha_prev = alpha_k

    # Downward tail: T_k = alpha_k gamma_{k+1} / (beta_{k+1} - T_{k+1}),
    # initialised at depth N from the Nollert-style expansion
    # T_N = -alpha_N r_N, r_N = 1 + u/sqrt(N) + v/N.
    u = -np.sqrt(-2j * b * omega)
    # Enforce the decaying branch (minimal solution): Re(u) <= 0.
    u = np.where(u.real > 0, -u, u)
    A1 = c0 + 1.0   # linear coefficient of alpha_n
    G1 = c2 - 3.0   # linear coefficient of gamma_n
    v = (u * u + 0.5 + G1 - A1) / 2.0

    alpha_N, _, _ = _alpha_beta_gamma(float(N), c0, c1, c2, c3, c4)
    rN = 1.0 + u / np.sqrt(N) + v / N
    T = -alpha_N * rN

    for k in range(N - 1, n_inv - 1, -1):
        alpha_k, _, _ = _alpha_beta_gamma(float(k), c0, c1, c2, c3, c4)
        _, beta_k1, gamma_k1 = _alpha_beta_gamma(float(k + 1), c0, c1, c2, c3, c4)
        T = alpha_k * gamma_k1 / (beta_k1 - T)

    return U - T


def solve_omega(omega_guess, a: float, s: int, m: int, n_inv: int,
                A_fn, N: int = 4000, tol: float = 1e-12, maxiter: int = 50):
    """Newton-solve the radial CF for omega (Leaver units), with the angular
    separation constant re-evaluated each step via ``A_fn(omega)``.

    ``omega_guess`` may be an ndarray (lockstep Newton across a batch; each
    element converges independently, frozen once below tol).

    ``A_fn`` maps omega (same shape) -> A (same shape).

    Returns (omega, A, converged_mask).
    """
    omega = np.atleast_1d(np.asarray(omega_guess, dtype=complex)).copy()
    scalar_in = np.isscalar(omega_guess) or np.ndim(omega_guess) == 0
    active = np.ones(omega.shape, dtype=bool)
    A = A_fn(omega)

    h = 1e-8
    for _ in range(maxiter):
        f0 = radial_cf(omega, a, A, s, m, n_inv, N)
        # Numerical derivative in the complex plane (CF is analytic, so a
        # single real-direction difference gives the complex derivative).
        A_h = A_fn(omega + h)
        f1 = radial_cf(omega + h, a, A_h, s, m, n_inv, N)
        df = (f1 - f0) / h
        step = np.where(df != 0, f0 / np.where(df != 0, df, 1.0), 0.0)
        # Cap steps to avoid jumping basins.
        step_mag = np.abs(step)
        cap = 0.1 * np.maximum(np.abs(omega), 0.1)
        step = np.where(step_mag > cap, step * cap / np.where(step_mag == 0, 1, step_mag), step)
        omega = np.where(active, omega - step, omega)
        A = A_fn(omega)
        newly_done = np.abs(step) < tol * np.maximum(1.0, np.abs(omega))
        active &= ~newly_done
        if not active.any():
            break

    converged = ~active
    if scalar_in:
        return omega[0], np.atleast_1d(A)[0], bool(converged[0])
    return omega, A, converged
