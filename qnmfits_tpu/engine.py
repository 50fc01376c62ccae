"""JAX fit engine: jit-compiled ringdown least squares on TPU.

Everything the reference does with per-fit Python/LAPACK
(/root/reference/qnmfits/qnmfits.py:142-911) is expressed here as a small
set of pure JAX functions over fixed-shape arrays:

* the analysis window is a {0,1} weight vector (ops/windows.py), so a
  sweep over start times is just a batch axis;
* the design matrix is never materialised for the solve: the Gram matrix
  G = A^H A and projected data A^H d are assembled with (K,J)-shaped
  matmuls (MXU work), and the J x J system is solved by Cholesky with
  column equilibration;
* mismatches come from tau-weighted (trapezoid) Gram contractions, so a
  fit returns (C, mismatch) without ever leaving the device.

Dtype policy: TPU supports complex64 natively; complex128 is unusable
there, so the x64 parity path (validated <= 1e-10 against
qnmfits_tpu.ref_impl) runs on the CPU backend.  Use precision='x32' for
TPU-speed sweeps and 'x64' for reference-grade numbers.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .ops.cmath import damped_phase
from .ops.solve import gram_cholesky
from .ops.windows import trapz_weights, window_closest, window_geq
from .spectrum.tables import ModeIndexSet, SpectrumTables, default_tables

__all__ = [
    "SpectrumEvaluator", "fit_core", "dynamic_fit_core",
]


# ---------------------------------------------------------------------------
# Spectrum evaluation inside jit
# ---------------------------------------------------------------------------

def _raise_if_bad_spin(c: float, hi: float) -> None:
    # Negated form so NaN (all comparisons False) also raises.
    if not (0.0 <= c <= hi):
        raise ValueError(
            f"chif must be in [0, {hi}] (got {c}); retrograde modes "
            f"are selected by the mode's m/sign, not a negative spin")


def check_spin(chif) -> None:
    """Validate a concrete SCALAR remnant spin against the table grid.

    Called by every public fitting/sweep wrapper so accept/reject
    behavior is identical across engines; dynamic spin arrays are
    exempt (junk samples outside the window are legitimate)."""
    if chif is None or np.ndim(chif) != 0:
        return
    from .spectrum.tables import default_tables
    _raise_if_bad_spin(float(chif), float(default_tables().chi[-1]))


def cached_evaluator(modes, sph=None):
    """Shared SpectrumEvaluator keyed by canonical (modes, sph) tuples.

    Per-call sweep epilogues (dedup rephase, stability) need an
    evaluator only for one host-side omega evaluation; rebuilding it
    re-packs the spline coefficient tables every call.  Instances are
    stateless after construction (the lru_cached jit factories already
    share them across calls), so reuse is safe."""
    return _cached_evaluator(tuple(tuple(int(x) for x in m) for m in modes),
                             None if sph is None
                             else tuple(tuple(int(x) for x in m)
                                        for m in sph))


@lru_cache(maxsize=256)
def _cached_evaluator(modes, sph):
    return SpectrumEvaluator(list(modes), list(sph) if sph else None)


class SpectrumEvaluator:
    """Packed spline coefficients for one static mode set.

    Compiles (modes, spherical_modes) to device arrays once; ``omega`` and
    ``mu`` are then pure JAX functions of chif, differentiable and
    vmappable (used by sweeps over (Mf, chif) grids and by the dynamic
    fits over chif(t) arrays).
    """

    def __init__(self, modes, spherical_modes=None,
                 tables: SpectrumTables | None = None):
        t = tables if tables is not None else default_tables()
        self.tables = t
        self.mode_set: ModeIndexSet = t.compile_modes(modes)
        rows = self.mode_set.rows_np()            # (J, Kc)
        # NumPy constants: they are baked into jitted programs on the
        # jit's device.  Eager jnp.asarray would land on the default
        # device -- the TPU -- which cannot hold complex128.
        self.signs = self.mode_set.signs_np()                   # (J, Kc)
        self.mask = self.mode_set.mask_np()                     # (J, Kc)
        self.chi_grid = np.asarray(t.chi)
        self.omega_coeffs = np.asarray(t.omega_c[rows])   # (J, Kc, P-1, 4)

        if spherical_modes is not None:
            for mode in self.mode_set.modes:
                if len(mode) != 4:
                    raise ValueError(
                        "multimode fits require linear (l,m,n,sign) modes; "
                        f"got {mode}")
            indices = [lm + mode for lm in spherical_modes
                       for mode in self.mode_set.modes]
            r, comp, sgn, par, nz = t.compile_mu_indices(indices)
            I, J = len(spherical_modes), self.mode_set.J
            self.mu_coeffs = np.asarray(
                t.mu_c[r, comp].reshape(I, J, -1, 4))   # (I, J, P-1, 4)
            self.mu_signs = sgn.reshape(I, J)
            self.mu_parity = par.reshape(I, J)
            self.mu_nonzero = nz.reshape(I, J)
        else:
            self.mu_coeffs = None

    def _spline(self, coeffs, chif):
        """Evaluate packed coefficients (..., P-1, 4) at chif (scalar or
        (Q,)); returns (...,) or (..., Q).

        Called inside jit: the NumPy constants become on-device constants
        here (safe for any backend), never eagerly."""
        coeffs = jnp.asarray(coeffs)
        grid = jnp.asarray(self.chi_grid)
        xq = jnp.atleast_1d(chif)
        i = jnp.clip(jnp.searchsorted(grid, xq, side="right") - 1,
                     0, grid.shape[0] - 2)
        dx = (xq - grid[i]).astype(coeffs.real.dtype)
        c = coeffs[..., i, :]
        val = ((c[..., 0] * dx + c[..., 1]) * dx + c[..., 2]) * dx + c[..., 3]
        return val if jnp.ndim(chif) else val[..., 0]

    def _validate_concrete_chif(self, chif):
        """Reject off-grid spins for CONCRETE SCALAR queries: the
        spline tables cover [0, ~0.9995] and cubic extrapolation beyond
        is silently unphysical.  Traced values (inside jit/vmap, e.g.
        the differentiable epsilon objective) pass through -- those
        callers bound chif themselves.  Concrete ARRAYS also pass:
        dynamic chif(t) tracks legitimately carry junk samples outside
        the fit window (PARITY.md "Known deltas")."""
        from jax.core import Tracer
        if isinstance(chif, Tracer) or np.ndim(chif) != 0:
            return
        _raise_if_bad_spin(float(chif), float(self.chi_grid[-1]))

    def omega(self, chif, Mf=1.0, delta_factor=None):
        """(J,) frequencies at scalar chif, or (J, Q) at chif (Q,).

        Applies mirror symmetry, nonlinear-mode summation and the
        delta-perturbation factor (reference qnmfits.py:253-274)."""
        self._validate_concrete_chif(chif)
        w = self._spline(self.omega_coeffs, chif)       # (J, Kc[, Q])
        signs = self.signs if jnp.ndim(chif) == 0 else self.signs[..., None]
        mask = self.mask if jnp.ndim(chif) == 0 else self.mask[..., None]
        w = jnp.where(signs > 0, w, -jnp.conj(w))
        w = jnp.where(mask, w, 0.0).sum(axis=1)
        if delta_factor is not None:
            df = jnp.asarray(delta_factor)
            w = w * (df if jnp.ndim(chif) == 0 else df[..., None])
        return w / Mf

    def mu(self, chif):
        """(I, J) mixing coefficients at scalar chif, or (I, J, Q)."""
        if self.mu_coeffs is None:
            raise ValueError("no spherical_modes were compiled")
        self._validate_concrete_chif(chif)
        mu = self._spline(self.mu_coeffs, chif)
        if jnp.ndim(chif) == 0:
            sgn, par, nz = self.mu_signs, self.mu_parity, self.mu_nonzero
        else:
            sgn = self.mu_signs[..., None]
            par = self.mu_parity[..., None]
            nz = self.mu_nonzero[..., None]
        mu = jnp.where(sgn > 0, mu, par * jnp.conj(mu))
        return jnp.where(nz, mu, 0.0)


# ---------------------------------------------------------------------------
# Fit cores
# ---------------------------------------------------------------------------

def _window(times, t0, T, t0_method: str):
    if t0_method == "geq":
        return window_geq(times, t0, T)
    if t0_method == "closest":
        return window_closest(times, t0, T)
    raise ValueError("t0_method must be 'geq' or 'closest'")


def fit_core(times, data, omega, mu, t0, w, cdtype=jnp.complex128,
             col_mask=None):
    """Weighted multimode least-squares fit + sky-averaged mismatch.

    times: (K,) real; data: (I, K) complex; omega: (J,) complex;
    mu: (I, J) complex (ones for a plain single-series fit); t0 scalar;
    w: (K,) {0,1} window weights.

    col_mask: optional (J,) bool marking real (True) vs padding (False)
    mode slots; padded slots get identity Gram rows and zero rhs, so
    their amplitudes are exactly zero and different-sized mode sets can
    share one batched solve.

    Returns (C (J,), mm scalar).  Pure function of arrays: vmap over any
    of (t0, w), (omega, mu), or data for batched sweeps.
    """
    rdtype = jnp.zeros((), cdtype).real.dtype
    times = times.astype(rdtype)
    w = w.astype(rdtype)
    data = data.astype(cdtype)
    omega = omega.astype(cdtype)
    mu = mu.astype(cdtype)

    tau = trapz_weights(times, w)

    # Window-clamped phase (w binary): avoids backward-in-time
    # exponential overflow; products with w/tau are unchanged.
    phi = damped_phase(omega[None, :],
                       (times[:, None] - t0) * w[:, None])       # (K, J)
    phiw = phi * w[:, None]

    # Gram pieces shared across spherical modes: the mixing enters as an
    # elementwise (J, J) factor (see multimode design matrix, reference
    # qnmfits.py:628-631: block i is mu_i * phi).
    Gt = phiw.conj().T @ phiw                        # plain-sum Gram
    Mmu = mu.conj().T @ mu                           # (J, J)
    G = Mmu * Gt

    pd = jnp.einsum("kj,ik->ij", phiw.conj(), data * w[None, :])  # (I, J)
    rhs = jnp.einsum("ij,ij->j", mu.conj(), pd)

    if col_mask is not None:
        keep = jnp.asarray(col_mask)
        eye = jnp.eye(G.shape[-1], dtype=G.dtype)
        G = jnp.where(keep[:, None] & keep[None, :], G, eye)
        rhs = jnp.where(keep, rhs, 0.0)

    C = gram_cholesky(G, rhs)

    # Mismatch from tau-weighted contractions (reference trapz mismatch,
    # qnmfits.py:73-139): model = (mu * phi) C per spherical mode.
    phit = phi * tau[:, None]
    Gt_tau = phit.conj().T @ phi
    G_tau = Mmu * Gt_tau
    pd_tau = jnp.einsum("kj,ik->ij", phit.conj(), data)
    r_tau = jnp.einsum("ij,ij->j", mu.conj(), pd_tau)

    num = jnp.real(jnp.sum(C * jnp.conj(r_tau)))
    model_norm = jnp.real(jnp.vdot(C, G_tau @ C))
    data_norm = jnp.real(jnp.sum(tau[None, :] * data * jnp.conj(data)))
    mm = 1.0 - num / jnp.sqrt(model_norm * data_norm)
    return C, mm


def dynamic_fit_core(times, data, omega_t, mu_t, t0, w,
                     cdtype=jnp.complex128, col_mask=None):
    """Fit with a time-dependent Kerr spectrum.

    omega_t: (K, J); mu_t: (I, K, J) (ones for single-series).  Design
    entries a^i_{kj} = mu^i_{kj} exp(-i omega_{kj} (t_k - t0)) (reference
    qnmfits.py:438-444, 863-864).

    col_mask: optional (J,) bool marking real (True) vs padding (False)
    mode slots (identity Gram rows, exactly-zero amplitudes), so
    different-sized mode sets can share one batched dynamic solve.
    """
    rdtype = jnp.zeros((), cdtype).real.dtype
    times = times.astype(rdtype)
    w = w.astype(rdtype)
    data = data.astype(cdtype)
    omega_t = omega_t.astype(cdtype)
    mu_t = mu_t.astype(cdtype)

    tau = trapz_weights(times, w)
    phi = damped_phase(omega_t, (times[:, None] - t0) * w[:, None])
    E = mu_t * phi[None, :, :]                              # (I, K, J)

    Ew = E * w[None, :, None]
    G = jnp.einsum("ikj,ikl->jl", Ew.conj(), Ew)
    rhs = jnp.einsum("ikj,ik->j", Ew.conj(), data * w[None, :])
    if col_mask is not None:
        keep = jnp.asarray(col_mask)
        eye = jnp.eye(G.shape[-1], dtype=G.dtype)
        G = jnp.where(keep[:, None] & keep[None, :], G, eye)
        rhs = jnp.where(keep, rhs, 0.0)
    C = gram_cholesky(G, rhs)

    Et = E * tau[None, :, None]
    G_tau = jnp.einsum("ikj,ikl->jl", Et.conj(), E)
    r_tau = jnp.einsum("ikj,ik->j", Et.conj(), data)
    num = jnp.real(jnp.sum(C * jnp.conj(r_tau)))
    model_norm = jnp.real(jnp.vdot(C, G_tau @ C))
    data_norm = jnp.real(jnp.sum(tau[None, :] * data * jnp.conj(data)))
    mm = 1.0 - num / jnp.sqrt(model_norm * data_norm)
    return C, mm


def cpu_device():
    """The CPU device, recovering from a broken accelerator plugin."""
    return _device_for("x64")


def _drop_failed_platform(err: Exception) -> bool:
    """Remove a platform that failed to initialise from jax_platforms.

    When JAX_PLATFORMS explicitly lists platforms, jax fails loudly for
    the whole list if any listed backend cannot initialise -- poisoning
    even jax.devices("cpu").  A failed initialisation is not cached, so
    updating the platform list and retrying recovers.  Returns True if
    the list was changed.
    """
    import re

    m = re.search(r"[Uu]nable to initialize backend '([^']+)'", str(err))
    raw = jax.config.jax_platforms  # holder object or plain str by version
    listed = getattr(raw, "value", raw) or ""
    if not m or not listed:
        return False
    keep = [p for p in listed.split(",") if p and p != m.group(1)]
    if "cpu" not in keep:
        keep.append("cpu")
    new = ",".join(keep)
    if new == listed:
        return False
    import warnings

    warnings.warn(
        f"JAX backend '{m.group(1)}' failed to initialise; continuing "
        f"with platforms '{new}' ({err})", RuntimeWarning, stacklevel=3)
    jax.config.update("jax_platforms", new)
    return True


def _device_for(precision: str):
    """x64 linear algebra is CPU-only (TPU lacks complex128).

    Backend discovery degrades instead of crashing: a platform that
    fails to initialise is dropped from the explicit JAX_PLATFORMS list
    (falling back to CPU), and transient tunneled-plugin failures are
    retried.
    """
    import time as _time

    last_err = None
    for attempt in range(4):
        try:
            if precision == "x64":
                return jax.devices("cpu")[0]
            # An explicitly configured default device wins: test suites
            # pin jax_default_device=cpu (the axon TPU plugin ignores
            # JAX_PLATFORMS, so env pinning alone cannot keep explicit
            # placements off a stalled tunnel).  Production leaves the
            # default unset and gets the accelerator.
            dflt = getattr(jax.config, "jax_default_device", None)
            if dflt is not None:
                return (jax.devices(dflt)[0] if isinstance(dflt, str)
                        else dflt)
            try:
                return jax.devices()[0]
            except RuntimeError:
                return jax.devices("cpu")[0]
        except RuntimeError as e:
            last_err = e
            if not _drop_failed_platform(e):  # plugin mid-restart
                _time.sleep(2.0 * (attempt + 1))
    raise last_err
