"""Kerr QNM mode tracking over a spin grid.

Produces, for each mode (l, m, n), the arrays omega(chi), A(chi) and the
spherical-spheroidal mixing vector C(chi) on a dense spin grid.  These are
the raw tables that replace the external `qnm` package's cached Leaver
tables consumed by the reference (/root/reference/qnmfits/qnm.py:134-160).

Strategy per track (vectorised two-pass):
  1. Coarse pass: sequential continuation in chi on a coarse subgrid with
     per-point Newton (shallow CF).  Guesses extrapolated from previous
     points.
  2. Fine pass: interpolate the coarse track onto the full grid, then run
     Newton *in lockstep across all grid points simultaneously* (NumPy
     vector ops over the grid axis; batched eig for the angular problem).

m < 0 modes are the retrograde branch with Re(omega) > 0 (the `qnm`
package's labelling, which the reference's sign=-1 mirror transform
assumes, qnm.py:220, 232-233); they are solved directly with m < 0 in the
radial CF and angular problem, starting from the same Schwarzschild seed.
"""

from __future__ import annotations

import numpy as np

from .angular import angular_matrix, lmin
from .radial import radial_cf
from . import cf_native

__all__ = ["default_chi_grid", "schwarzschild_seeds", "track_mode"]


def _cf(omega, aL, A, s, m, n_inv, N):
    """CF evaluation dispatch: native C++ kernel if available, else NumPy.

    ``omega``/``A`` are (B,) complex; ``aL`` scalar or (B,) Leaver-unit
    spins; ``n_inv`` scalar int.
    """
    omega = np.asarray(omega, complex)
    if cf_native.available():
        return cf_native.radial_cf_batch(omega, aL, A, s, m,
                                         np.int32(n_inv), N)
    if np.ndim(aL) == 0:
        return radial_cf(omega, float(aL), A, s, m, n_inv, N)
    return _cf_vec_a(omega, np.asarray(aL), A, s, m, n_inv, N)


def default_chi_grid(n_points: int = 400, chi_max: float = 0.9995) -> np.ndarray:
    """Spin grid on [0, chi_max], clustered toward extremal spin.

    Uses a sinh-type stretching so spacing shrinks near chi_max where
    prograde frequencies vary fastest.
    """
    u = np.linspace(0.0, 1.0, n_points)
    # Cluster near u=1: map through a power law blended with linear.
    x = 0.5 * u + 0.5 * (1.0 - (1.0 - u) ** 2)
    return chi_max * x


def _batched_angular_eig(s: int, m: int, c_arr: np.ndarray, nl: int):
    """Eigen-decompose the angular matrix for every c in c_arr.

    Returns (A_all, C_all): (B, nl) eigenvalues and (B, nl, nl) right
    eigenvectors (columns), unsorted.
    """
    B = c_arr.shape[0]
    mats = np.empty((B, nl, nl), dtype=complex)
    for i in range(B):  # matrix build is cheap; eig dominates
        mats[i] = angular_matrix(s, m, c_arr[i], nl)
    A_all, C_all = np.linalg.eig(mats)
    return A_all, C_all


def _select_eig(A_all, C_all, A_guess, l, m, s):
    """Pick, per batch element, the eigenpair closest to A_guess and apply
    the diagonal-real-positive phase convention."""
    k = np.argmin(np.abs(A_all - A_guess[:, None]), axis=1)
    rows = np.arange(A_all.shape[0])
    A = A_all[rows, k]
    C = C_all[rows, :, k]
    diag = C[rows, l - lmin(s, m)]
    phase = np.where(diag != 0, np.abs(diag) / np.where(diag == 0, 1, diag), 1.0)
    C = C * phase[:, None]
    C = C / np.sqrt(np.sum(np.abs(C) ** 2, axis=1))[:, None]
    return A, C


def schwarzschild_seeds(l_max: int = 8, n_max: int = 7, s: int = -2,
                        N: int = 6000, tol: float = 1e-13,
                        n_max_low_l: int | None = None) -> dict:
    """Schwarzschild (chi=0) QNM frequencies omega(l, n) in M=1 units.

    Continuation in n from the n=0 mode of each l; the n=0 seeds for
    l >= 5 are extrapolated from lower l.  Returns {(l, n): omega}.

    n_max_low_l caps the overtone ladder for l < l_max (the lower-l
    ladders are only needed for the n=0 extrapolation chain); use 0 when
    seeding a single high-l mode so the l=2 ladder never walks into the
    algebraically special point at n=8.
    """
    # Trusted n=0 anchors per spin weight (standard published values,
    # M=1 units).  Newton polishes these to full precision, so ~1e-4
    # anchor accuracy suffices.
    anchors_by_s = {
        -2: {2: 0.3736716844 - 0.0889623157j,
             3: 0.5994432884 - 0.0927030477j,
             4: 0.8091783775 - 0.0941640768j},
        0: {0: 0.110455 - 0.104896j,
            1: 0.292936 - 0.097660j,
            2: 0.483644 - 0.096759j},
        -1: {1: 0.248263 - 0.092488j,
             2: 0.457596 - 0.095004j,
             3: 0.656899 - 0.095616j},
    }
    anchors = anchors_by_s.get(s, {})
    l_start = abs(s) if s in (0, -1) else 2
    out = {}
    for l in range(l_start, l_max + 1):
        if l in anchors:
            w_guess = anchors[l]
        elif (l - 1, 0) in out and (l - 2, 0) in out and (l - 3, 0) in out:
            # Quadratic extrapolation in l of the last three n=0 roots.
            ws = [out[(lp, 0)] for lp in (l - 3, l - 2, l - 1)]
            w_guess = 3.0 * ws[2] - 3.0 * ws[1] + ws[0]
        else:
            # Eikonal estimate (good to a few percent): enough for Newton.
            w_guess = ((l + 0.5) - 0.5j) / (3.0 * np.sqrt(3.0))
        A = float(l * (l + 1) - s * (s + 1))
        prev = None
        n_top = n_max if (l == l_max or n_max_low_l is None) else n_max_low_l
        for n in range(0, n_top + 1):
            if n > 0:
                w_guess = out[(l, n - 1)] + (out[(l, n - 1)] - prev
                                             if n >= 2 else -0.19j)
            wL = np.array([2.0 * w_guess])
            w, conv = _newton_fixed_A(wL, 0.0, A, s, l, n, N, tol)
            if not conv[0]:
                raise RuntimeError(f"Schwarzschild seed failed for l={l} n={n}")
            prev = out.get((l, n - 1))
            out[(l, n)] = w[0] / 2.0
    return out


def _newton_fixed_A(omega_L, a, A, s, m, n_inv, N, tol, maxiter=60):
    """Newton on the radial CF with A held fixed (Schwarzschild case:
    A is omega-independent)."""
    omega = omega_L.astype(complex).copy()
    active = np.ones(omega.shape, bool)
    h = 1e-8
    Aarr = np.broadcast_to(np.asarray(A, complex), omega.shape)
    for _ in range(maxiter):
        f0 = _cf(omega, a, Aarr, s, m, n_inv, N)
        f1 = _cf(omega + h, a, Aarr, s, m, n_inv, N)
        df = (f1 - f0) / h
        step = np.where(active & (df != 0), f0 / np.where(df == 0, 1, df), 0)
        mag = np.abs(step)
        cap = 0.05 * np.maximum(np.abs(omega), 0.2)
        step = np.where(mag > cap, step * cap / np.where(mag == 0, 1, mag), step)
        omega = omega - step
        active &= np.abs(step) >= tol * np.maximum(1.0, np.abs(omega))
        if not active.any():
            break
    return omega, ~active


def track_mode(l: int, m: int, n: int, omega0: complex,
               chi_grid: np.ndarray, s: int = -2,
               nl_extra: int = 24,
               coarse_stride: int = 8,
               N_coarse: int = 2000, N_fine: int = 6000,
               tol: float = 1e-12):
    """Track one QNM from chi=0 across the spin grid.

    Parameters
    ----------
    omega0 : Schwarzschild frequency (M=1 units) for this (l, n).
    chi_grid : ascending spin grid; chi_grid[0] may be 0.

    Returns
    -------
    omega : (P,) complex, M=1 units.
    A : (P,) complex separation constants.
    C : (P, nl) complex mixing vectors (l' = lmin .. lmin+nl-1).
    """
    # NOTE: m < 0 modes are NOT the -conj mirror of m > 0 -- they are the
    # retrograde branch with Re(omega) > 0 (the `qnm` package convention the
    # reference relies on, qnm.py:220).  They start from the same
    # Schwarzschild seed and are tracked directly with m < 0 in the CF.
    l0 = lmin(s, m)
    nl = l - l0 + 1 + nl_extra
    P = len(chi_grid)

    # ---- coarse pass: sequential continuation --------------------------
    coarse_idx = list(range(0, P, coarse_stride))
    if coarse_idx[-1] != P - 1:
        coarse_idx.append(P - 1)
    w_coarse = np.empty(len(coarse_idx), complex)
    A_coarse = np.empty(len(coarse_idx), complex)

    def _solve_point(chi, w_guess, A_guess, chi_from, depth=0):
        """Newton at one spin, with recursive chi-substepping from the
        last good point on failure (robust near extremal spin)."""
        aL = chi / 2.0
        b = np.sqrt(max(1.0 - chi * chi, 1e-12))
        N_c = max(N_coarse, int(400.0 / b))
        w, A, ok = _newton_coupled(np.array([2.0 * w_guess]), aL,
                                   np.array([A_guess]), s, l, m, n,
                                   nl, N_c, tol * 10)
        if ok[0]:
            return w[0] / 2.0, A[0]
        if depth >= 6:
            raise RuntimeError(
                f"coarse track failed: mode ({l},{m},{n}) chi={chi:.4f}")
        chi_mid = 0.5 * (chi_from + chi)
        w_mid, A_mid = _solve_point(chi_mid, w_guess, A_guess, chi_from,
                                    depth + 1)
        return _solve_point(chi, w_mid, A_mid, chi_mid, depth + 1)

    w_prev = omega0          # M=1 units
    A_prev = complex(l * (l + 1) - s * (s + 1))
    chi_prev = 0.0
    coarse_fail = None
    for j, gi in enumerate(coarse_idx):
        chi = chi_grid[gi]
        # Predictor: linear extrapolation from previous two coarse points.
        if j >= 2:
            dchi = (chi_grid[coarse_idx[j]] - chi_grid[coarse_idx[j - 1]])
            dchi_p = (chi_grid[coarse_idx[j - 1]] - chi_grid[coarse_idx[j - 2]])
            w_guess = w_coarse[j - 1] + (w_coarse[j - 1] - w_coarse[j - 2]) \
                * (dchi / max(dchi_p, 1e-30))
            A_guess = A_coarse[j - 1]
        else:
            w_guess, A_guess = w_prev, A_prev
        try:
            w_coarse[j], A_coarse[j] = _solve_point(chi, w_guess, A_guess,
                                                    chi_prev)
        except RuntimeError:
            # Deep-overtone tracks can defeat the CF very close to
            # extremal spin; fill the remainder by extrapolation (same
            # policy as the l=2 extended-ladder tracks -- the reference's
            # own optimisers clamp chif at 0.99, qnmfits.py:1534-1537).
            if chi < 0.985 or j < 4:
                raise
            coarse_fail = j
            break
        w_prev, A_prev = w_coarse[j], A_coarse[j]
        chi_prev = chi

    chi_reliable = np.inf
    if coarse_fail is not None:
        cidx = np.asarray(coarse_idx)
        fit = np.arange(max(0, coarse_fail - 6), coarse_fail)
        xs = chi_grid[cidx[fit]]
        for arr in (w_coarse, A_coarse):
            cr = np.polyfit(xs, arr[fit].real, 2)
            ci = np.polyfit(xs, arr[fit].imag, 2)
            xf = chi_grid[cidx[coarse_fail:]]
            arr[coarse_fail:] = (np.polyval(cr, xf)
                                 + 1j * np.polyval(ci, xf))
        chi_reliable = chi_grid[cidx[coarse_fail - 1]]

    # ---- fine pass: lockstep Newton across the whole grid ---------------
    w_fine = np.interp(chi_grid, chi_grid[coarse_idx], w_coarse.real) \
        + 1j * np.interp(chi_grid, chi_grid[coarse_idx], w_coarse.imag)
    A_fine = np.interp(chi_grid, chi_grid[coarse_idx], A_coarse.real) \
        + 1j * np.interp(chi_grid, chi_grid[coarse_idx], A_coarse.imag)

    omega = np.empty(P, complex)
    Aout = np.empty(P, complex)
    Cout = np.empty((P, nl), complex)

    # CF depth must grow toward extremal spin: the tail error damps like
    # exp(-2|Re u| sqrt(N)) with u ~ sqrt(b*omega), b = sqrt(1-chi^2), so
    # N ~ 1/b for fixed accuracy.  Solve the grid in depth tiers.
    b_grid = np.sqrt(np.maximum(1.0 - chi_grid**2, 1e-12))
    N_req = np.maximum(N_fine, (800.0 / b_grid).astype(int))

    # chi points must be solved per-a (CF depends on scalar a); batch the
    # angular eig across the grid but loop radial Newton per point in
    # vector groups sharing nothing -> instead, loop Newton iterations with
    # per-point a via a vectorised CF where `a` enters only through
    # coefficients.  radial_cf takes scalar a, so we extend: solve each
    # point independently but lockstep via object arrays is messy; instead
    # we exploit that radial_cf broadcasts omega/A, and generalise over a
    # by evaluating coefficients per point.  Simplest correct approach:
    # vectorise over the grid by inlining a vector `a`.
    # Grid points beyond the last reliably-solved coarse spin are filled
    # from the extrapolated track (no Newton -- the CF has no usable root
    # there); their mixing vectors still come from the exact angular
    # eigenproblem at the extrapolated omega.
    extrap = chi_grid > chi_reliable

    tiers = sorted(set(int(2 ** np.ceil(np.log2(nr))) for nr in N_req))
    tier_of = np.array([int(2 ** np.ceil(np.log2(nr))) for nr in N_req])
    for Nt in tiers:
        sel = np.where((tier_of == Nt) & ~extrap)[0]
        if sel.size == 0:
            continue
        w, A, C, ok = _newton_coupled_vec_a(
            2.0 * w_fine[sel], chi_grid[sel] / 2.0, A_fine[sel],
            s, l, m, n, nl, Nt, tol)
        # Retry unconverged points with progressively deeper CF.
        for retry in range(3):
            if ok.all():
                break
            bad = np.where(~ok)[0]
            Nt_r = Nt * 3 ** (retry + 1)
            w_b, A_b, C_b, ok_b = _newton_coupled_vec_a(
                w[bad], chi_grid[sel][bad] / 2.0, A[bad],
                s, l, m, n, nl, Nt_r, tol)
            w[bad], A[bad], C[bad] = w_b, A_b, C_b
            ok[bad] = ok_b
        if not ok.all():
            # Near-extremal stragglers fall back to the interpolated
            # coarse track (accuracy there is set by the coarse pass,
            # not the fine polish); anything below 0.985 is a hard error.
            badchi = chi_grid[sel][~ok]
            if np.min(badchi) < 0.985:
                raise RuntimeError(
                    f"fine polish failed: mode ({l},{m},{n}) "
                    f"at chi={badchi[:5]}")
            bad = np.where(~ok)[0]
            w[bad] = 2.0 * w_fine[sel][bad]
            A[bad] = A_fine[sel][bad]
            _, C[bad] = _angular_A_C(
                s, l, m, (chi_grid[sel][bad] / 2.0) * w[bad], nl, A[bad])
        omega[sel] = w / 2.0
        Aout[sel] = A
        Cout[sel] = C

    if extrap.any():
        ext = np.where(extrap)[0]
        omega[ext] = w_fine[ext]
        Aout[ext] = A_fine[ext]
        _, Cout[ext] = _angular_A_C(
            s, l, m, (chi_grid[ext] / 2.0) * (2.0 * w_fine[ext]), nl,
            A_fine[ext])
    return omega, Aout, Cout


def _cf_vec_a(omega, a_vec, A, s, m, n_inv, N):
    """radial_cf generalised to a per-element spin array (Leaver units).

    DELIBERATE duplication of radial.radial_cf's recurrence (and of the
    C++ csrc/cf_kernel.cpp): the three implementations cross-validate
    each other in tests, and consolidating the validated recurrences
    behind one code path would trade that redundancy for a single point
    of numerical failure.  Any fix to the tail/recurrence must be
    applied to all three."""
    from .radial import leaver_coeffs, _alpha_beta_gamma
    omega = np.asarray(omega, complex)
    b = np.sqrt(1.0 - 4.0 * a_vec * a_vec)
    c0, c1, c2, c3, c4 = leaver_coeffs(s, m, a_vec, omega, A)

    U = None
    alpha_prev = None
    for k in range(n_inv + 1):
        al, be, ga = _alpha_beta_gamma(float(k), c0, c1, c2, c3, c4)
        U = be if k == 0 else be - alpha_prev * ga / U
        alpha_prev = al

    u = -np.sqrt(-2j * b * omega)
    u = np.where(u.real > 0, -u, u)
    A1 = c0 + 1.0
    G1 = c2 - 3.0
    v = (u * u + 0.5 + G1 - A1) / 2.0
    alpha_N, _, _ = _alpha_beta_gamma(float(N), c0, c1, c2, c3, c4)
    T = -alpha_N * (1.0 + u / np.sqrt(N) + v / N)
    for k in range(N - 1, n_inv - 1, -1):
        al, _, _ = _alpha_beta_gamma(float(k), c0, c1, c2, c3, c4)
        _, be1, ga1 = _alpha_beta_gamma(float(k + 1), c0, c1, c2, c3, c4)
        T = al * ga1 / (be1 - T)
    return U - T


def _angular_A_C(s, l, m, c_arr, nl, A_guess):
    A_all, C_all = _batched_angular_eig(s, m, c_arr, nl)
    return _select_eig(A_all, C_all, A_guess, l, m, s)


def _newton_coupled(omega_L, aL, A_guess, s, l, m, n_inv, nl, N, tol,
                    maxiter=60):
    """Coupled Newton for scalar spin aL: iterate A(omega) and CF root."""
    omega = omega_L.astype(complex).copy()
    A = A_guess.astype(complex).copy()
    active = np.ones(omega.shape, bool)
    h = 1e-8
    for _ in range(maxiter):
        A, _ = _angular_A_C(s, l, m, aL * omega, nl, A)
        f0 = _cf(omega, aL, A, s, m, n_inv, N)
        A_h, _ = _angular_A_C(s, l, m, aL * (omega + h), nl, A)
        f1 = _cf(omega + h, aL, A_h, s, m, n_inv, N)
        df = (f1 - f0) / h
        step = np.where(active & (df != 0), f0 / np.where(df == 0, 1, df), 0)
        mag = np.abs(step)
        cap = 0.05 * np.maximum(np.abs(omega), 0.2)
        step = np.where(mag > cap, step * cap / np.where(mag == 0, 1, mag), step)
        omega = omega - step
        last_step = np.abs(step)
        active &= last_step >= tol * np.maximum(1.0, np.abs(omega))
        if not active.any():
            break
    active &= last_step >= 1e-9 * np.maximum(1.0, np.abs(omega))
    A, _ = _angular_A_C(s, l, m, aL * omega, nl, A)
    return omega, A, ~active


def _newton_coupled_vec_a(omega_L, aL_vec, A_guess, s, l, m, n_inv, nl, N,
                          tol, maxiter=60):
    """Lockstep coupled Newton across the whole spin grid (vector aL).

    Only still-unconverged points are evaluated each iteration (the CF and
    the batched angular eig both shrink with the active set).
    """
    omega = omega_L.astype(complex).copy()
    A = A_guess.astype(complex).copy()
    active = np.ones(omega.shape, bool)
    last_step = np.full(omega.shape, np.inf)
    h = 1e-8
    for _ in range(maxiter):
        idx = np.where(active)[0]
        if idx.size == 0:
            break
        om_a, a_a = omega[idx], aL_vec[idx]
        A_a, _ = _angular_A_C(s, l, m, a_a * om_a, nl, A[idx])
        f0 = _cf(om_a, a_a, A_a, s, m, n_inv, N)
        A_h, _ = _angular_A_C(s, l, m, a_a * (om_a + h), nl, A_a)
        f1 = _cf(om_a + h, a_a, A_h, s, m, n_inv, N)
        df = (f1 - f0) / h
        step = np.where(df != 0, f0 / np.where(df == 0, 1, df), 0)
        mag = np.abs(step)
        cap = 0.05 * np.maximum(np.abs(om_a), 0.2)
        step = np.where(mag > cap, step * cap / np.where(mag == 0, 1, mag), step)
        omega[idx] = om_a - step
        A[idx] = A_a
        done = np.abs(step) < tol * np.maximum(1.0, np.abs(om_a))
        active[idx] = ~done
        last_step[idx] = np.abs(step)
    # Near-extremal spin the CF noise floor exceeds tol; accept soft
    # convergence (~1e-9 step -> omega accurate to ~1e-10).
    soft = active & (last_step < 1e-9 * np.maximum(1.0, np.abs(omega)))
    active &= ~soft
    A, C = _angular_A_C(s, l, m, aL_vec * omega, nl, A)
    return omega, A, C, ~active
