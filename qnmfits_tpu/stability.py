"""Amplitude-stability diagnostics over the fit start time.

A QNM genuinely present in ringdown data has a fit amplitude that,
once rephased to a common reference time, is CONSTANT as the start
time t0 varies across the ringdown: h contains A_j e^{-i w_j (t-t_ref)}
for every window, so the per-window amplitude C_j(t0) (anchored at its
own t0 by the fit convention, reference qnmfits.py:280-283) satisfies
A_j = C_j(t0) e^{i w_j (t0 - t_ref)} exactly.  Flatness of A_j(t0)
over a t0 plateau is the community-standard evidence that a mode is
physical rather than overfit (the stability criterion of the overtone
programme, e.g. Giesler+ arXiv:1903.08284 fig. 6); a spurious or
mis-modelled mode wanders by orders of magnitude under the same
rephasing.  The reference package computes per-fit amplitudes but
ships no stability sweep; this builds one on the package's batched t0
kernels (window dedup included, PERF.md section 25) so the whole
diagnostic is one device program plus O(B J) host algebra.

Caveat stated so it cannot be mis-used silently: rephasing to t_ref
multiplies C_j(t0) by e^{|Im w_j| (t0 - t_ref)} -- for t0 late in the
ringdown the mode has decayed and its fit noise is amplified by the
same factor.  That growth is the diagnostic working as intended (a
decayed mode is unconstrained, hence unstable), but it means the
scatter statistics should be read over the plateau where the mode is
live, not over an arbitrarily long sweep; pass the t0 range
accordingly or read the per-t0 curves.
"""

from __future__ import annotations

import numpy as np

__all__ = ["amplitude_stability"]


def amplitude_stability(times, data, modes, Mf, chif, t0_array,
                        t_ref=None, *, t0_method="geq", T_array=100,
                        spherical_modes=None, delta=0.0,
                        precision="x64", dedup=True):
    """Rephased QNM amplitudes and their stability over a t0 sweep.

    times/data/modes/Mf/chif/t0_method/T_array/spherical_modes/delta:
    exactly as `mismatch_t0_array` (array data single-series, dict data
    multimode).  The spectrum must be static (scalar Mf/chif): a
    time-dependent spectrum has no single w_j to rephase with.

    t_ref is the common reference time the amplitudes are rephased to;
    default min(t0_array) (the least noise amplification).  Use
    t_ref=0.0 to compare against peak-anchored amplitudes.

    Returns a dict:
      omega     (J,) complex QNM frequencies,
      modes     the canonical mode list,
      t0s       (B,) the sweep axis (as given),
      mm        (B,) mismatch at each start time,
      C         (B, J) raw fit amplitudes, each anchored at its own t0
                (identical to the fits'),
      A         (B, J) amplitudes rephased to t_ref:
                A = C * exp(i w (t0 - t_ref)),
      mean_A    (J,) complex mean of A over the sweep,
      rel_std   (J,) std(|A_j|) / mean(|A_j|) -- the standard
                amplitude-stability measure (small = stable),
      scatter   (J,) sqrt(mean |A_j - mean_A_j|^2) / |mean_A_j| --
                total complex wander (captures phase drift too),
      phase_std (J,) circular standard deviation of arg(A_j) in
                radians: sqrt(-2 ln |mean(A_j/|A_j|)|).

    A mode with zero fitted amplitude everywhere returns inf in the
    relative measures (nothing to be stable about).
    """
    if np.ndim(Mf) != 0 or np.ndim(chif) != 0:
        raise ValueError(
            "amplitude_stability needs a static (scalar Mf/chif) "
            "spectrum: a time-dependent w_j(t) admits no exact "
            "amplitude rephasing between start times")
    from .batched import _canon, batch_mismatch_t0, _on_host
    from .engine import check_spin
    from .ref_impl import _delta_factor

    check_spin(chif)
    t0s = np.asarray(t0_array, float)
    if t0s.ndim != 1 or t0s.size == 0:
        raise ValueError("t0_array must be a non-empty 1-D array")
    canon = list(_canon(modes))

    mm, C = batch_mismatch_t0(
        times, data, modes, Mf, chif, t0s, t0_method=t0_method,
        T_array=T_array, spherical_modes=spherical_modes, delta=delta,
        precision=precision, return_amplitudes=True, dedup=dedup)
    C = np.asarray(C)

    sph = (None if spherical_modes is None
           else [tuple(m) for m in spherical_modes])
    from .engine import cached_evaluator
    ev = cached_evaluator(canon, sph)
    df = np.asarray(_delta_factor(delta, len(canon)))
    with _on_host():
        omega = np.asarray(ev.omega(float(chif), float(Mf), df))

    if t_ref is None:
        t_ref = float(t0s.min())
    A = C * np.exp(1j * omega[None, :] * (t0s[:, None] - float(t_ref)))

    mean_A = A.mean(axis=0)
    absA = np.abs(A)
    mean_abs = absA.mean(axis=0)
    wander = np.sqrt(np.mean(np.abs(A - mean_A[None, :]) ** 2, axis=0))
    with np.errstate(divide="ignore", invalid="ignore"):
        rel_std = np.where(mean_abs > 0, absA.std(axis=0) / mean_abs,
                           np.inf)
        scatter = np.where(np.abs(mean_A) > 0, wander / np.abs(mean_A),
                           np.inf)
        # Zero-amplitude rows carry no phase: average the unit phasors
        # over the nonzero rows only (a 0 phasor in the mean would
        # shrink the resultant and inflate phase_std spuriously).
        nz = absA > 0
        unit = np.where(nz, A / np.where(nz, absA, 1.0), 0.0 + 0.0j)
        n_nz = nz.sum(axis=0)
        resultant = np.where(
            n_nz > 0,
            np.abs(unit.sum(axis=0)) / np.maximum(n_nz, 1), 0.0)
        phase_std = np.where(resultant > 0,
                             np.sqrt(-2.0 * np.log(
                                 np.minimum(resultant, 1.0))),
                             np.inf)
    return {
        "omega": omega,
        "modes": canon,
        "t0s": t0s,
        "mm": np.asarray(mm),
        "C": C,
        "A": A,
        "mean_A": mean_A,
        "rel_std": rel_std,
        "scatter": scatter,
        "phase_std": phase_std,
    }
