"""Runtime Kerr-spectrum tables: differentiable spin interpolation on TPU.

Loads the artifact produced by build_tables.py and exposes the QNM
frequencies omega_{lmn}(chi) and spherical-spheroidal mixing coefficients
mu_{lm,l'm'n'}(chi) as piecewise-cubic splines evaluated in JAX (vmappable
over chi arrays, differentiable for gradient-based fitting) and, for the
reference-parity path, in NumPy.

This is the TPU-native replacement for the reference's L1 spectrum layer
(/root/reference/qnmfits/qnm.py:162-393): the lazy scipy-spline cache
becomes precomputed spline-coefficient tensors; the per-mode Python calls
become static index compilation (ModeIndexSet) + batched gathers.

Semantics preserved exactly (reference file:line):
  * mirror modes, sign=-1: m -> -m lookup then omega -> -conj(omega)
    (qnm.py:220, 232-233) and mu -> (-1)^(l+l') conj(mu) (qnm.py:358-359);
  * nonlinear modes (l1,m1,n1,s1,l2,m2,n2,s2,...): omega is the sum of the
    constituent linear omegas (qnm.py:272-291);
  * mu is zero when the spherical and spheroidal azimuthal numbers differ
    (qnm.py:336-337); mixing-vector component index l - max(|m|,|s|)
    (qnm.py:345-348);
  * omega(chif, Mf) = omega(chif)/Mf (qnm.py:235).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

DATA_DIR = Path(__file__).parent.parent / "data"
DEFAULT_TABLE = DATA_DIR / "qnm_tables_s-2.npz"


# ---------------------------------------------------------------------------
# Spline utilities
# ---------------------------------------------------------------------------

def _fit_cubic_coeffs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Not-a-knot interpolating cubic spline coefficients.

    y: (..., P) complex.  Returns (..., P-1, 4) complex coefficients
    ordered [c3, c2, c1, c0] for c3*dx^3 + c2*dx^2 + c1*dx + c0 with
    dx = chi - x[i] on interval i.
    """
    from scipy.interpolate import CubicSpline
    y2 = y.reshape(-1, y.shape[-1])
    # One batched fit: cs.c has shape (4, P-1, N), highest power first.
    cs = CubicSpline(x, y2, axis=-1)
    out = np.ascontiguousarray(np.moveaxis(cs.c, (0, 1, 2), (2, 1, 0)))
    return out.reshape(y.shape[:-1] + (y.shape[-1] - 1, 4))


def eval_spline_np(x_grid: np.ndarray, coeffs: np.ndarray, x) -> np.ndarray:
    """NumPy piecewise-cubic evaluation (reference-parity path).

    coeffs: (..., P-1, 4); x: scalar or (Q,).  Returns (..., Q) or (...,).
    """
    x = np.asarray(x, dtype=float)
    scalar = x.ndim == 0
    xq = np.atleast_1d(x)
    i = np.clip(np.searchsorted(x_grid, xq, side="right") - 1,
                0, len(x_grid) - 2)
    dx = xq - x_grid[i]
    c = coeffs[..., i, :]                      # (..., Q, 4)
    val = ((c[..., 0] * dx + c[..., 1]) * dx + c[..., 2]) * dx + c[..., 3]
    return val[..., 0] if scalar else val


# ---------------------------------------------------------------------------
# Mode index compilation (host-side, static under jit)
# ---------------------------------------------------------------------------

def split_nonlinear(mode: tuple) -> list[tuple]:
    """Chunk a flat nonlinear mode tuple into (l, m, n, sign) quadruples
    (reference qnm.py:272-280)."""
    if len(mode) % 4 != 0:
        raise ValueError(f"mode tuple length must be a multiple of 4: {mode}")
    return [tuple(mode[i:i + 4]) for i in range(0, len(mode), 4)]


@dataclass(frozen=True)
class ModeIndexSet:
    """Static index arrays describing a list of (possibly nonlinear) QNMs.

    rows/signs/mask have shape (J, Kmax): for mode j, the table rows of its
    Kmax constituent linear modes (padded), their mirror signs, and a
    validity mask.  Hashable/static so it can close over jitted functions.
    """
    modes: tuple
    rows: tuple          # nested tuples, (J, Kmax) ints
    signs: tuple
    mask: tuple

    @property
    def J(self) -> int:
        return len(self.rows)

    def rows_np(self):
        return np.array(self.rows, dtype=np.int32)

    def signs_np(self):
        return np.array(self.signs, dtype=np.float64)

    def mask_np(self):
        return np.array(self.mask, dtype=bool)


class SpectrumTables:
    """Loaded spectrum artifact + spline coefficients (NumPy + JAX views)."""

    def __init__(self, path: str | Path = DEFAULT_TABLE):
        path = Path(path)
        if not path.exists():
            raise FileNotFoundError(
                f"QNM table artifact not found at {path}. Run "
                f"`python -m qnmfits_tpu.spectrum.build_tables` to build it.")
        z = np.load(path)
        self.chi = z["chi"]
        self.keys = [tuple(k) for k in z["keys"]]
        self.omega = z["omega"]          # (M, P)
        self.A = z["A"]                  # (M, P)
        self.mu = z["mu"]                # (M, P, K)
        self.s = int(z["s"])
        self.n_mu = int(z["n_mu"])
        self.row = {k: i for i, k in enumerate(self.keys)}

        # Spline coefficients: deterministic from the artifact, but the
        # batched CubicSpline fit over all modes costs ~14 s per process
        # -- cache them in a sidecar next to the artifact (rebuilt
        # automatically when the artifact's mode count changes; writing
        # is best-effort for read-only installs).
        M = len(self.keys)
        side = path.with_suffix(".spl.npz")
        loaded = False
        if side.exists():
            try:
                zs = np.load(side)
                # Validate against the artifact's chi grid AND mode data
                # (not just the mode count): a rebuilt artifact with a
                # different grid or re-solved modes at the same count
                # must not load stale coefficients.
                omega_sum = complex(np.sum(self.omega))
                if (int(zs["M"]) == M and zs["omega_c"].shape[0] == M
                        and "chi" in zs
                        and np.array_equal(zs["chi"], self.chi)
                        and np.isclose(complex(zs["omega_sum"]), omega_sum,
                                       rtol=0, atol=0)):
                    self.omega_c = zs["omega_c"]
                    self.mu_c = zs["mu_c"]
                    loaded = True
            except Exception:       # corrupt sidecar: refit below
                loaded = False
        if not loaded:
            self.omega_c = _fit_cubic_coeffs(self.chi, self.omega)
            self.mu_c = _fit_cubic_coeffs(
                self.chi, np.moveaxis(self.mu, 2, 1))   # (M, K, P-1, 4)
            try:
                tmp = side.with_suffix(".tmp.npz")
                np.savez(tmp, M=M, omega_c=self.omega_c, mu_c=self.mu_c,
                         chi=self.chi, omega_sum=np.sum(self.omega))
                tmp.replace(side)
            except Exception:       # read-only install: just refit later
                pass

        self._jax = None

    # -- JAX device copies (lazy) ---------------------------------------
    @property
    def jax_arrays(self):
        if self._jax is None:
            import jax.numpy as jnp
            self._jax = {
                "chi": jnp.asarray(self.chi),
                "omega_c": jnp.asarray(self.omega_c),
                "mu_c": jnp.asarray(self.mu_c),
            }
        return self._jax

    # -- on-demand solving ------------------------------------------------
    def _row_for(self, key: tuple) -> int:
        """Table row for (l, m_lookup, n), solving the mode on demand if
        it is outside the baked artifact.

        The reference's `qnm` package solves any requested mode lazily
        from its Leaver solver (qnm.py:124-160); the TPU-native
        equivalent runs the in-house tracker once, persists the track to
        the disk cache, and appends a new spline row in memory.
        """
        if key in self.row:
            return self.row[key]
        self._solve_missing(key)
        return self.row[key]

    def _solve_missing(self, key: tuple) -> None:
        import sys

        l, m, n = key
        if l < abs(self.s) or abs(m) > l or n < 0:
            raise KeyError(f"invalid mode {key} for spin weight s={self.s}")
        cache_dir = DATA_DIR / "track_cache"
        try:
            cache_dir.mkdir(parents=True, exist_ok=True)
        except OSError:         # read-only install: cache is best-effort
            pass
        cache = cache_dir / f"s{self.s}_l{l}_m{m}_n{n}_P{len(self.chi)}.npz"
        if cache.exists():
            z = np.load(cache)
            w, C = z["w"], z["C"]
        else:
            from .solver import schwarzschild_seeds, track_mode

            print(f"qnmfits_tpu: solving QNM ({l},{m},{n}) s={self.s} on "
                  f"demand (not in baked tables; result is cached)...",
                  file=sys.stderr, flush=True)
            try:
                # l_max equals the requested l so ITS ladder is solved to
                # n in full; lower-l ladders (needed only for the n=0
                # extrapolation chain) stay capped at n=0 and never walk
                # into the l=2 algebraically special point.
                seeds = schwarzschild_seeds(l_max=l, n_max=n, s=self.s,
                                            n_max_low_l=0)
                w, A, C = track_mode(l, m, n, seeds[(l, n)], self.chi,
                                     s=self.s)
            except (RuntimeError, KeyError) as e:
                raise KeyError(
                    f"mode {key} is outside the baked tables and the "
                    f"on-demand solve failed ({e}).  Deep overtone "
                    f"ladders past the algebraically special frequency "
                    f"need the multiplet machinery: rebuild with "
                    f"`python -m qnmfits_tpu.spectrum.build_tables`.")
            try:
                np.savez(cache, w=w, A=A, C=C)
            except OSError:     # read-only install: cache is best-effort
                pass
        mu = np.zeros((len(self.chi), self.n_mu), complex)
        Kc = min(self.n_mu, C.shape[1])
        mu[:, :Kc] = C[:, :Kc]

        # Append the new row + its spline coefficients in place.
        self.keys.append(key)
        self.row[key] = len(self.keys) - 1
        self.omega = np.concatenate([self.omega, w[None]], axis=0)
        self.mu = np.concatenate([self.mu, mu[None]], axis=0)
        self.omega_c = np.concatenate(
            [self.omega_c, _fit_cubic_coeffs(self.chi, w[None])], axis=0)
        self.mu_c = np.concatenate(
            [self.mu_c, _fit_cubic_coeffs(self.chi, mu.T[None])], axis=0)
        self._jax = None          # refresh device copies lazily

    # -- host-side index compilation -------------------------------------
    def compile_modes(self, modes) -> ModeIndexSet:
        """Compile a list of (possibly nonlinear) mode tuples to index arrays."""
        modes = [tuple(int(x) for x in mode) for mode in modes]
        parts = [split_nonlinear(m) for m in modes]
        Kmax = max(len(p) for p in parts)
        rows, signs, mask = [], [], []
        for p in parts:
            r, sg, mk = [], [], []
            for (l, m, n, sign) in p:
                key = (l, m * sign, n)
                r.append(self._row_for(key))
                sg.append(sign)
                mk.append(True)
            while len(r) < Kmax:
                r.append(0); sg.append(1); mk.append(False)
            rows.append(tuple(r)); signs.append(tuple(sg)); mask.append(tuple(mk))
        return ModeIndexSet(tuple(modes), tuple(rows), tuple(signs),
                            tuple(mask))

    def compile_mu_indices(self, indices):
        """Compile (l, m, l', m', n', sign) tuples to (rows, comps, signs,
        parity, zero_mask) arrays (see reference qnm.py:293-361)."""
        rows, comps, signs, parity, nonzero = [], [], [], [], []
        for (ell, m, ellp, mp, nprime, sign) in indices:
            if mp != m:
                rows.append(0); comps.append(0); signs.append(1)
                parity.append(1.0); nonzero.append(False)
                continue
            m_l, mp_l = m * sign, mp * sign
            comp = ell - max(abs(m_l), abs(self.s))
            key = (ellp, mp_l, nprime)
            self._row_for(key)     # solves on demand if missing
            if not (0 <= comp < self.n_mu):
                raise KeyError(
                    f"mixing component l={ell} out of stored range for "
                    f"spheroidal {key} (have {self.n_mu} components)")
            rows.append(self.row[key])
            comps.append(comp)
            signs.append(sign)
            parity.append((-1.0) ** (ell + ellp) if sign == -1 else 1.0)
            nonzero.append(True)
        return (np.array(rows, np.int32), np.array(comps, np.int32),
                np.array(signs, np.float64), np.array(parity, np.float64),
                np.array(nonzero, bool))


    def _check_chif(self, chif):
        """Host-path spin validation: the spline tables cover
        0 <= chi <= chi_max (~0.9995); cubic EXTRApolation beyond is
        silently unphysical (omega ~ 90 at chi=1.05), so concrete
        (non-traced) queries outside the grid raise.  In-jit array
        evaluation (dynamic fits) is the caller's responsibility --
        calculate_epsilon bounds chif <= 0.99."""
        c = np.asarray(chif, float)
        hi = float(self.chi[-1])
        # Negated form so NaN (all comparisons False) also raises.
        if c.size and not (float(np.min(c)) >= 0.0
                           and float(np.max(c)) <= hi
                           and not np.any(np.isnan(c))):
            raise ValueError(
                f"chif must be in [0, {hi}] (got range "
                f"[{float(np.min(c))}, {float(np.max(c))}]); retrograde "
                f"modes are selected by the mode's m/sign, not a "
                f"negative spin")

    # -- NumPy evaluation (parity path) ----------------------------------
    def omega_np(self, mode_set: ModeIndexSet, chif, Mf=1.0):
        """Frequencies for a compiled mode set at spin(s) chif (NumPy).

        Returns (J,) for scalar chif or (J, Q) for array chif.
        """
        self._check_chif(chif)
        rows = mode_set.rows_np()            # (J, Kmax)
        signs = mode_set.signs_np()
        mask = mode_set.mask_np()
        w = eval_spline_np(self.chi, self.omega_c[rows], chif)  # (J,Kmax[,Q])
        if w.ndim == 3:
            signs = signs[..., None]
            mask = mask[..., None]
        w = np.where(signs > 0, w, -np.conj(w))
        w = np.where(mask, w, 0.0)
        w = w.sum(axis=1)                    # (J,) or (J, Q)
        Mf = np.asarray(Mf)
        # Reference semantics (qnm.py:189-208): chif and/or Mf may be
        # array_like.  Scalar chif + array Mf must broadcast to (J, Q),
        # not silently collapse (or clash) against the mode axis.
        if Mf.ndim and w.ndim == 1:
            return w[:, None] / Mf[None, :]
        return w / Mf

    def mu_np(self, indices, chif):
        """Mixing coefficients for (l,m,l',m',n',sign) tuples (NumPy)."""
        self._check_chif(chif)
        rows, comps, signs, parity, nonzero = self.compile_mu_indices(indices)
        mu = eval_spline_np(self.chi, self.mu_c[rows, comps], chif)
        if mu.ndim == 2:
            signs = signs[:, None]; parity = parity[:, None]
            nonzero = nonzero[:, None]
        mu = np.where(signs > 0, mu, parity * np.conj(mu))
        return np.where(nonzero, mu, 0.0)


_default_tables: SpectrumTables | None = None


def default_tables() -> SpectrumTables:
    global _default_tables
    if _default_tables is None:
        _default_tables = SpectrumTables()
    return _default_tables
