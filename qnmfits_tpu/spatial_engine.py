"""Compiled spatial-mapping compute: vectorised Qmu, sky einsums, and
the mapping-fit design routed through the jitted sweep engines.

The reference evaluates its quadratic-mixing predictions with a Python
double loop of per-scalar spline calls (one `qnm.mu` per (d, h) pair per
output index -- /root/reference/qnmfits/spatial_mapping_functions.py:
728-885) and its mapping fit with a materialised design matrix +
np.linalg.lstsq per fit (:212-248).  Here the same quantities are
compiled once into index/coefficient tensors and evaluated as batched
spline gathers + einsums:

* ``QmuCompiled`` -- for an index list and spin weights (s1, s2), the
  kappa tensor (N, D, H) and the factor-mu spline gathers (N, D) /
  (N, H) are precomputed; evaluation at any chif (scalar or array) is
  two batched piecewise-cubic evaluations and one einsum.  This is the
  engine behind spatial.Qmu_A/B/D (equality vs the loop oracle is
  tested; >= 100x faster at full l_max, see PERF.md).
* ``sky_matrix``/``sky_sum`` -- sky maps as one stacked sYlm matrix
  contraction instead of per-(l, m) Python sums.
* ``mapping_design`` -- the mapping fit's per-spherical-mode mixing
  rows (mu columns + Qmu_B columns + identity blocks, reference
  :165-219) as an (I, J) matrix: exactly the ``mu`` argument of
  engine.fit_core, so mapping fits run on every sweep kernel (batched
  x64, factored split-complex TPU, sharded mesh) with no new compute
  path.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .harmonics import sYlm
from .spectrum.tables import eval_spline_np

__all__ = [
    "compile_qmu", "eval_qmu", "eval_qmu_c",
    "spheroidal_coeffs_batched", "sky_sum", "mapping_design",
    "mapping_mismatch_t0_array",
]


def _tables_for(s: int):
    from .ref_impl import get_qnm
    return get_qnm()._t(s)


def _kappa_np(i, j, d, h, b, f, s1, s2):
    # Single source of truth: spatial.kappa (covered by the
    # sphere-integral test).  Lazy import -- spatial imports this
    # module at load time, but kappa is only needed at compile time.
    from .spatial import kappa
    return kappa(i, j, d, h, b, f, s1, s2)


class _FactorGather:
    """Batched mixing-coefficient gather for one Qmu factor.

    Holds (rows, comps, signs, parity, nonzero) index arrays of shape
    (N, W) pointing into the spin-weight-s tables; ``eval`` returns the
    (N, W[, Q]) complex mu values at chif with mirror parity applied
    (same semantics as SpectrumTables.mu_np, qnm.py:336-359)."""

    def __init__(self, s: int, flat_indices, shape, valid):
        self.tables = _tables_for(s)
        r, c, sg, par, nz = self.tables.compile_mu_indices(flat_indices)
        self.rows = r.reshape(shape)
        self.comps = c.reshape(shape)
        self.signs = sg.reshape(shape)
        self.parity = par.reshape(shape)
        self.nonzero = nz.reshape(shape) & valid
        # Packed spline coefficients for the whole factor: (N, W, P-1, 4).
        self.coeffs = self.tables.mu_c[self.rows, self.comps]

    def eval(self, chif):
        t = self.tables
        mu = eval_spline_np(t.chi, self.coeffs, chif)      # (N, W[, Q])
        sg, par, nz = self.signs, self.parity, self.nonzero
        if mu.ndim == 3:
            sg = sg[..., None]; par = par[..., None]; nz = nz[..., None]
        mu = np.where(sg > 0, mu, par * np.conj(mu))
        return np.where(nz, mu, 0.0)


class QmuCompiled:
    """One compiled Qmu index list: kappa tensor + two factor gathers."""

    def __init__(self, indices, s1: int, s2: int, l_max: int,
                 with_extra: bool):
        indices = [tuple(int(x) for x in idx) for idx in indices]
        N = len(indices)
        self.N = N
        if N == 0:
            return

        d_los = [max(abs(s1), abs(b)) for (_, _, _, b, *_) in indices]
        h_los = [max(abs(s2), abs(idx[7])) for idx in indices]
        D = max(l_max + 1 - lo for lo in d_los)
        H = max(l_max + 1 - lo for lo in h_los)
        D = max(D, 1)
        H = max(H, 1)

        kap = np.zeros((N, D, H))
        valid1 = np.zeros((N, D), bool)
        valid2 = np.zeros((N, H), bool)
        idx1, idx2 = [], []
        for n, (i, j, a, b, c, sign1, e, f, g, sign2) in enumerate(indices):
            extra = 1.0
            if with_extra:
                extra = np.sqrt((i + 4.0) * (i - 3.0) * (i + 3.0) * (i - 2.0))
            for di in range(D):
                d = d_los[n] + di
                ok = d <= l_max
                valid1[n, di] = ok
                # The loop oracle evaluates mu1 for every d in range
                # unconditionally (spatial.py loop); padded slots reuse a
                # safe index and are masked by `valid`.
                idx1.append((d if ok else d_los[n], b, a, b, c, sign1))
                if not ok:
                    continue
                for hi in range(H):
                    h = h_los[n] + hi
                    if h > l_max:
                        continue
                    kap[n, di, hi] = _kappa_np(i, j, d, h, b, f, s1, s2) \
                        * extra
            for hi in range(H):
                h = h_los[n] + hi
                # The oracle touches mu2 only where kappa != 0; an h slot
                # whose whole kappa column vanishes must not force a
                # (possibly out-of-table) compile.
                ok = h <= l_max and bool(np.any(kap[n, :, hi]))
                valid2[n, hi] = ok
                idx2.append((h if ok else h_los[n], f, e, f, g, sign2)
                            if ok else (max(abs(s2), abs(f)), f, e, f, g,
                                        sign2))

        self.kappa = kap
        self.f1 = _FactorGather(s1, idx1, (N, D), valid1)
        self.f2 = _FactorGather(s2, idx2, (N, H), valid2)

    def eval(self, chif):
        """Qmu values at chif: (N,) for scalar chif, (N, Q) for (Q,)."""
        if self.N == 0:
            return np.zeros((0,), complex) if np.ndim(chif) == 0 \
                else np.zeros((0, len(np.atleast_1d(chif))), complex)
        # Same off-grid-spin rejection as the mu_np path the loop oracle
        # went through: cubic extrapolation past the table edge is
        # silently unphysical.  Check BOTH factors' tables: s1 and s2
        # tables currently ship identical chi grids, but the guard must
        # survive a future rebuild where they differ.
        self.f1.tables._check_chif(chif)
        self.f2.tables._check_chif(chif)
        mu1 = self.f1.eval(chif)
        mu2 = self.f2.eval(chif)
        if mu1.ndim == 3:
            return np.einsum("ndh,ndq,nhq->nq", self.kappa, mu1, mu2)
        return np.einsum("ndh,nd,nh->n", self.kappa, mu1, mu2)


@lru_cache(maxsize=512)
def compile_qmu(indices_key, s1: int, s2: int, l_max: int,
                with_extra: bool) -> QmuCompiled:
    return QmuCompiled(list(indices_key), s1, s2, l_max, with_extra)


def eval_qmu(indices, chif, l_max, s1=-2, s2=-2, with_extra=False):
    """Vectorised Qmu sum for a list of (i, j, a, b, c, p1, e, f, g, p2)
    output indices (the compute behind spatial.Qmu_A/B/D)."""
    key = tuple(tuple(int(x) for x in idx) for idx in indices)
    comp = compile_qmu(key, int(s1), int(s2), int(l_max), bool(with_extra))
    out = comp.eval(chif)
    return list(out)


# ---------------------------------------------------------------------------
# Sky maps as stacked-harmonic contractions
# ---------------------------------------------------------------------------

def sky_matrix(s: int, lm_list, theta, phi):
    """Stack sYlm columns for an explicit (l, m) list: (..., n_modes)."""
    th = np.asarray(theta, float)
    ph = np.asarray(phi, float)
    return np.stack([sYlm(s, l, m, th, ph) for (l, m) in lm_list], axis=-1)


def sky_sum(s: int, lm_list, amps, theta, phi):
    """sum_k amps[k] sYlm(s, l_k, m_k)(theta, phi) as one matrix
    contraction (replaces the per-(l, m) Python sums of reference
    spatial_mapping_functions.py:286-411)."""
    Y = sky_matrix(s, lm_list, theta, phi)
    return Y @ np.asarray(amps, complex)


# ---------------------------------------------------------------------------
# Batched spheroidal expansions: the compiled Qmu_C path
# ---------------------------------------------------------------------------

def spheroidal_coeffs_batched(s, Ls, Ms, gammas, nl=30):
    """sYlm expansion coefficients of S_{s,L,M}(gamma) for a whole batch.

    Ls/Ms (B,) ints, gammas (B,) complex.  The angular matrices are
    stacked and eigen-decomposed in ONE ``np.linalg.eig`` call (the
    matrix build is cheap; eig dominates -- same trade as
    spectrum.solver._batched_angular_eig); selection and normalisation
    reproduce ``spectrum.angular.mode_eigensystem`` exactly at equal
    ``nl`` (sorted-by-real-part eigenvalue pick, diagonal-component
    real-positive phase, unit norm).  Returns (l0s (B,), C (B, nl)).
    """
    from .spectrum.angular import angular_matrix, lmin

    Ls = np.asarray(Ls, int)
    Ms = np.asarray(Ms, int)
    gammas = np.asarray(gammas, complex)
    B = gammas.shape[0]
    l0s = np.array([lmin(s, int(m)) for m in Ms])
    kidx = Ls - l0s
    if np.any(kidx >= nl) or np.any(kidx < 0):
        raise ValueError("nl too small for requested (L, M)")
    mats = np.empty((B, nl, nl), complex)
    for b in range(B):
        mats[b] = angular_matrix(s, int(Ms[b]), gammas[b], nl)
    A_all, C_all = np.linalg.eig(mats)
    rows = np.arange(B)
    order = np.argsort(A_all.real, axis=1)
    k = order[rows, kidx]
    C = C_all[rows, :, k]                                  # (B, nl)
    diag = C[rows, kidx]
    phase = np.where(diag != 0,
                     np.abs(diag) / np.where(diag == 0, 1.0, diag), 1.0)
    C = C * phase[:, None]
    C = C / np.sqrt(np.sum(np.abs(C) ** 2, axis=1))[:, None]
    return l0s, C


def eval_qmu_c(indices, chif, nl=30):
    """Vectorised Qmu_C (reference spatial_mapping_functions.py:802-849):
    the overlap <sYlm(i,j) | S_{L,M}(chif * omega_quad)> read off the
    spheroidal's sYlm expansion, batched over (index, chif).

    chif scalar -> (N,) complex array; chif (Q,) -> (N, Q).  One
    stacked eigensolve replaces the reference's per-index
    ``spheroidal.harmonic`` + scipy dblquad (and the pre-round-4
    per-index ``mode_eigensystem`` loop); array chif matches the
    compiled A/B/D engines' surface.
    """
    from .ref_impl import get_qnm

    scalar = np.ndim(chif) == 0
    chif_arr = np.atleast_1d(np.asarray(chif, float))
    Q = chif_arr.shape[0]
    N = len(indices)
    out = np.zeros((N, Q), complex)
    if N == 0:
        return out[:, 0] if scalar else out

    idx_arr = np.asarray([tuple(int(x) for x in idx) for idx in indices])
    omg = np.asarray(get_qnm().omega_list(
        [tuple(row) for row in idx_arr[:, 2:10]], chif_arr, 1))  # (N, Q)
    gam = chif_arr[None, :] * omg

    i_, j_ = idx_arr[:, 0], idx_arr[:, 1]
    Ls = idx_arr[:, 2] + idx_arr[:, 6]
    Ms = idx_arr[:, 3] + idx_arr[:, 7]
    live = j_ == Ms                                        # else exactly 0
    if not np.any(live):
        return out[:, 0] if scalar else out

    # Indices sharing a quadratic map (columns 2:10) share (L, M,
    # gamma): a ladder of (i, j) reads of one map needs ONE eigensolve
    # per chif, not one per index.
    live_idx = np.where(live)[0]
    uniq, inv = np.unique(idx_arr[live_idx, 2:10], axis=0,
                          return_inverse=True)
    U = uniq.shape[0]
    rep = np.empty(U, int)
    rep[inv] = live_idx
    uu, qq = np.meshgrid(np.arange(U), np.arange(Q), indexing="ij")
    uu, qq = uu.ravel(), qq.ravel()
    l0s, C = spheroidal_coeffs_batched(-2, Ls[rep[uu]], Ms[rep[uu]],
                                       gam[rep[uu], qq], nl=nl)
    l0s = l0s.reshape(U, Q)
    C = C.reshape(U, Q, nl)
    nn = np.repeat(live_idx, Q)
    un = np.repeat(inv, Q)
    qn = np.tile(np.arange(Q), live_idx.size)
    comp = i_[nn] - l0s[un, qn]
    ok = (comp >= 0) & (comp < nl)
    out[nn[ok], qn[ok]] = C[un[ok], qn[ok], comp[ok]]
    return out[:, 0] if scalar else out


# ---------------------------------------------------------------------------
# Mapping fit as an engine mu-matrix
# ---------------------------------------------------------------------------

def split_mapping_modes(modes, mapping_modes):
    """Partition the model as the reference does (spatial mapping fit,
    reference :165-183): non-mapped linear + non-mapped quadratic, with
    ragged tuples rejected."""
    mod_modes = [tuple(m) for m in modes if tuple(m) not in
                 {tuple(mm) for mm in mapping_modes}]
    linear = [m for m in mod_modes if len(m) == 4]
    quadratic = [m for m in mod_modes if len(m) == 8]
    bad = [m for m in mod_modes if len(m) not in (4, 8)]
    if bad:
        raise ValueError(f"wrong number of indices in tuple: {bad[0]}")
    return linear, quadratic


def mapping_design(spherical_modes, modes, mapping_modes, chif, Mf,
                   l_max: int = 8):
    """Compile the mapping fit's model to engine arrays.

    Returns (all_modes, omega (J,) complex, mu (I, J) complex) where
    column j of mu holds, for spherical-mode row i, the coefficient the
    reference writes into design block i (mu mixing for linear modes,
    Qmu_B for quadratic modes -- reference :185-210 -- and the identity
    blocks giving each mapped mode an independent amplitude per
    spherical mode, reference :212-219).  With this (omega, mu) pair the
    mapping fit IS engine.fit_core, so every sweep kernel applies.
    """
    from .ref_impl import get_qnm

    spherical_modes = [tuple(lm) for lm in spherical_modes]
    mapping_modes = [tuple(mm) for mm in mapping_modes]
    linear, quadratic = split_mapping_modes(modes, mapping_modes)
    mod_modes = linear + quadratic
    q = get_qnm()
    I = len(spherical_modes)
    n_lin, n_quad, n_map = len(linear), len(quadratic), len(mapping_modes)
    J = n_lin + n_quad + I * n_map

    mu = np.zeros((I, J), complex)
    if n_lin:
        mus = np.asarray(q.mu_list(
            [lm + m for lm in spherical_modes for m in linear], chif))
        mu[:, :n_lin] = mus.reshape(I, n_lin)
    if n_quad:
        alphas = np.asarray(eval_qmu(
            [lm + m for lm in spherical_modes for m in quadratic],
            chif, l_max=l_max, s1=-2, s2=0))
        mu[:, n_lin:n_lin + n_quad] = alphas.reshape(I, n_quad)
    for k in range(n_map):
        for i in range(I):
            mu[i, n_lin + n_quad + k * I + i] = 1.0

    all_modes = mod_modes + [mm for mm in mapping_modes for _ in range(I)]
    omega = np.asarray(q.omega_list(all_modes, chif, Mf))
    return all_modes, omega, mu


@lru_cache(maxsize=16)
def _jit_sweep_t0(t0_method: str, precision: str):
    import jax
    import jax.numpy as jnp

    from .batched import sweep_t0_core

    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    return jax.jit(lambda times, rows, omega, mu, t0s, Ts: sweep_t0_core(
        times, rows, omega, mu, t0s, Ts, t0_method, cdtype))


def mapping_mismatch_t0_array(times, data_dict, modes, Mf, chif, t0_array,
                              mapping_modes, t0_method="geq", T_array=100,
                              spherical_modes=None, l_max=8,
                              engine="batched", precision="x64",
                              return_amplitudes=False, mesh=None,
                              chunk=128, dedup=True):
    """Mapping-fit mismatch vs start time as ONE jitted program.

    The reference runs its mapping fit once per start time (a Python
    loop around spatial_mapping_functions.py:18-283 rebuilding the
    design matrix and calling lstsq); here the compiled (omega, mu)
    design runs on the same sweep kernels as every other fit:

      engine='batched'  -- vmapped complex x64 sweep (parity path);
      engine='fast'     -- factored split-complex TPU kernel
                           (t0_method='geq', t0_array sorted);
      engine='sharded'  -- the factored kernel over a device mesh;
      engine='loop'     -- serial mapping_multimode_ringdown_fit oracle.

    Returns mm (B,); with return_amplitudes=True also C (B, J) complex
    in mapping_design's column order.  dedup=True (default) solves each
    distinct window once on t0 grids finer than the data sampling --
    exact for this static design (batched._window_dedup, PERF.md
    section 25); the 'loop' oracle always runs per-t0.
    """
    from .engine import check_spin
    check_spin(chif)

    if spherical_modes is None:
        spherical_modes = list(data_dict.keys())
    t0s = np.asarray(t0_array, float)
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))

    if engine == "loop":
        from .spatial import mapping_multimode_ringdown_fit
        mms, Cs = [], []
        for t0, T in zip(t0s, Ts):
            out = mapping_multimode_ringdown_fit(
                times, data_dict, modes, Mf, chif, float(t0),
                mapping_modes, t0_method=t0_method, T=float(T),
                spherical_modes=spherical_modes)
            mms.append(out["mismatch"])
            Cs.append(out["C"])
        mm = np.asarray(mms)
        return (mm, np.asarray(Cs)) if return_amplitudes else mm

    _, omega, mu = mapping_design(spherical_modes, modes, mapping_modes,
                                  chif, Mf, l_max=l_max)
    times = np.asarray(times, float)
    rows = np.stack([np.asarray(data_dict[lm]) for lm in spherical_modes])

    # Validate the USER's inputs before dedup compresses them (the
    # dedup representatives are always ascending, which would let an
    # unsorted t0_array slip past the fast-engine contract whenever the
    # grid happens to dedup).
    if engine in ("fast", "sharded"):
        if t0_method != "geq":
            raise ValueError(
                f"engine='{engine}' supports t0_method='geq' only")
        if np.any(np.diff(t0s) < 0):
            raise ValueError("t0_array must be sorted ascending")

    from .batched import (_dedup_scatter, _window_dedup,
                          _window_dedup_closest)
    dd = None
    # Same gate as batch_mismatch_t0: the batched engine's f32 path
    # windows in f32 ON DEVICE, so host-f64 dedup keys can disagree at
    # a window boundary; the fast/sharded kernels window in (split-)
    # f64 and match the keys exactly.
    f32_windows = engine == "batched" and precision != "x64"
    if dedup and not f32_windows:
        dd = (_window_dedup(times, t0s, Ts) if t0_method == "geq"
              else _window_dedup_closest(times, t0s, Ts))
    if dd is not None:
        t0s_full = t0s
        t0s, Ts = t0s[dd[0]], Ts[dd[0]]

    if engine in ("fast", "sharded"):
        from .batched import _safe_chunk, _t0_sweep_fast_fn, \
            _uniform_spacing
        chunk = _safe_chunk(t0s, float(np.max(np.abs(omega.imag))), chunk)
        analytic = _uniform_spacing(times)
        args = (times, rows.real.copy(), rows.imag.copy(),
                omega.real.copy(), omega.imag.copy(),
                mu.real.copy(), mu.imag.copy(), t0s, Ts)
        if engine == "sharded":
            from .parallel.mesh import sharded_t0_sweep_factored, sweep_mesh
            if mesh is None or mesh == "auto":
                mesh = sweep_mesh(n_time=1)
            Cre, Cim, mm = sharded_t0_sweep_factored(
                *args, mesh=mesh, chunk=chunk, analytic=analytic)
        else:
            Cre, Cim, mm = _t0_sweep_fast_fn(chunk, analytic)(*args)
        if dd is not None:
            mm, Cre, Cim = _dedup_scatter(
                dd, t0s_full, mm,
                Cre if return_amplitudes else None,
                Cim if return_amplitudes else None, omega)
        mm = np.asarray(mm)
        if return_amplitudes:
            return mm, np.asarray(Cre) + 1j * np.asarray(Cim)
        return mm

    import jax

    from .engine import _device_for

    fn = _jit_sweep_t0(t0_method, precision)
    dev = _device_for(precision)
    C, mm = fn(*[jax.device_put(np.asarray(a), dev)
                 for a in (times, rows, omega, mu, t0s, Ts)])
    if dd is not None:
        C = np.asarray(C)
        mm, Cre, Cim = _dedup_scatter(
            dd, t0s_full, mm,
            C.real if return_amplitudes else None,
            C.imag if return_amplitudes else None, omega)
        if return_amplitudes:
            C = Cre + 1j * Cim
    mm = np.asarray(mm)
    return (mm, np.asarray(C)) if return_amplitudes else mm
