"""Reference-compatible spectrum API: the `qnm` class.

Drop-in equivalent of the reference's qnmfits.qnm instance
(/root/reference/qnmfits/qnm.py:36-393), backed by the self-contained
spectrum tables instead of the external `qnm` package + Cook HDF5
downloads.  Methods accept scalar or array chif/Mf exactly like the
reference, and support multiple spin weights (s=-2 gravitational,
s=0 scalar -- the latter used by the Qmu_B quadratic mixing prediction,
reference spatial_mapping_functions.py:787-799).
"""

from __future__ import annotations

import numpy as np

from .spectrum.tables import DATA_DIR, SpectrumTables, default_tables


def download_cook_data():
    """Reference-API shim (/root/reference/qnmfits/qnm.py:11-33).

    The n=8,9 multiplet data is computed by the built-in solver rather than
    downloaded from Zenodo; this function exists for API compatibility and
    verifies the local tables are present.
    """
    default_tables()
    print("qnmfits_tpu computes multiplet data locally; nothing to download.")


class qnm:
    """Kerr QNM frequencies and spherical-spheroidal mixing coefficients.

    API-compatible with the reference class (qnm.py:36-393); all lookups
    are spline evaluations of precomputed tables.
    """

    def __init__(self, tables: SpectrumTables | None = None):
        self._tables = {}
        if tables is not None:
            self._tables[tables.s] = tables
        # Known (l, m, n, s) multiplets, kept for API compatibility
        # (reference qnm.py:67).
        self.multiplet_list = [(2, 0, 8, -2), (2, 1, 8, -2), (2, 2, 8, -2)]

    def _t(self, s: int) -> SpectrumTables:
        if s not in self._tables:
            if s == -2:
                self._tables[s] = default_tables()
            else:
                path = DATA_DIR / f"qnm_tables_s{s}.npz"
                if not path.exists():
                    raise FileNotFoundError(
                        f"no spectrum tables for spin weight s={s}; build "
                        f"with `python -m qnmfits_tpu.spectrum.build_tables "
                        f"--s {s}`")
                self._tables[s] = SpectrumTables(path)
        return self._tables[s]

    # -- frequencies -----------------------------------------------------
    def omega(self, ell, m, n, sign, chif, Mf=1, s=-2):
        """omega_{lmn}(Mf, chif); mirror modes via sign=-1
        (reference qnm.py:162-235)."""
        t = self._t(s)
        ms = t.compile_modes([(ell, m, n, sign)])
        w = t.omega_np(ms, chif, Mf)[0]
        return w if np.ndim(chif) or np.ndim(Mf) else complex(w)

    def omega_list(self, modes, chif, Mf=1, s=-2):
        """Frequencies for a list of (possibly nonlinear) mode tuples
        (reference qnm.py:237-291): nonlinear tuples sum their constituent
        linear frequencies."""
        if len(modes) == 0:
            return []
        t = self._t(s)
        ms = t.compile_modes(modes)
        w = t.omega_np(ms, chif, Mf)
        if np.ndim(chif) or np.ndim(Mf):
            return list(w)
        return [complex(x) for x in w]

    # -- mixing coefficients ----------------------------------------------
    def mu(self, ell, m, ellp, mp, nprime, sign, chif, s=-2):
        """Spherical-spheroidal mixing mu_{lm,l'm'n'}(chif)
        (reference qnm.py:293-361)."""
        if mp != m:
            return 0
        t = self._t(s)
        out = t.mu_np([(ell, m, ellp, mp, nprime, sign)], chif)[0]
        return out if np.ndim(chif) else complex(out)

    def mu_list(self, indices, chif, s=-2):
        """Mixing coefficients for (l,m,l',m',n',sign) tuples
        (reference qnm.py:363-393)."""
        t = self._t(s)
        out = t.mu_np(indices, chif)
        if np.ndim(chif):
            return [row for row in out]
        return [complex(x) for x in out]
