"""Spectrum-layer tests: table accuracy, symmetries, reference semantics."""

import numpy as np
import pytest

# Published values (standard Kerr QNM literature; also the `qnm` package's
# documented example for chi=0.68).
SCHW_220 = 0.3736716844 - 0.0889623157j
SCHW_320 = 0.5994432884 - 0.0927030477j
KERR_220_CHI068 = 0.523975104290 - 0.081512623631j


@pytest.fixture(scope="module")
def q():
    from qnmfits_tpu.qnm_api import qnm
    return qnm()


def test_schwarzschild_values(q):
    assert abs(q.omega(2, 2, 0, 1, 0.0) - SCHW_220) < 1e-9
    assert abs(q.omega(3, 2, 0, 1, 0.0) - SCHW_320) < 1e-9


def test_kerr_220_at_chi068(q):
    # chi=0.68 is off-grid; error budget = spline interpolation error.
    assert abs(q.omega(2, 2, 0, 1, 0.68) - KERR_220_CHI068) < 1e-8


def test_direct_solver_vs_table(q):
    """Spline tables agree with a direct CF solve at an off-grid spin."""
    from qnmfits_tpu.spectrum.solver import (
        _newton_coupled, schwarzschild_seeds, track_mode)

    chi = 0.7123
    sub = np.linspace(0.0, chi, 30)
    w, A, C = track_mode(2, 2, 0, SCHW_220, sub, coarse_stride=4)
    w_table = q.omega(2, 2, 0, 1, chi)
    assert abs(w[-1] - w_table) < 1e-8


def test_mirror_symmetry(q):
    """sign=-1 gives -conj of the m -> -m (retrograde, Re>0) track
    (reference qnm.py:220, 232-233)."""
    for chi in (0.0, 0.3, 0.69):
        w_retro = q.omega(2, -2, 0, 1, chi)   # retrograde track, Re > 0
        w_mirror = q.omega(2, 2, 0, -1, chi)  # mirror mode, Re < 0
        assert abs(w_mirror + np.conj(w_retro)) < 1e-12
        assert w_mirror.real < 0


def test_retrograde_branch_distinct(q):
    """m<0 tables are the retrograde branch, NOT -conj of prograde."""
    w_pro = q.omega(2, 2, 0, 1, 0.7)
    w_retro = q.omega(2, -2, 0, 1, 0.7)
    assert w_retro.real > 0
    # Retrograde frequency decreases with spin; prograde increases.
    assert w_retro.real < q.omega(2, -2, 0, 1, 0.0).real
    assert w_pro.real > q.omega(2, 2, 0, 1, 0.0).real
    assert abs(w_retro - (-np.conj(w_pro))) > 1e-3


def test_mass_scaling(q):
    w1 = q.omega(2, 2, 0, 1, 0.5, Mf=1.0)
    w2 = q.omega(2, 2, 0, 1, 0.5, Mf=0.95)
    assert abs(w2 - w1 / 0.95) < 1e-12


def test_omega_list_nonlinear_sum(q):
    """Nonlinear (quadratic) mode frequency = sum of constituents
    (reference qnm.py:272-291)."""
    chi = 0.69
    w220 = q.omega(2, 2, 0, 1, chi)
    w330 = q.omega(3, 3, 0, 1, chi)
    [w_quad] = q.omega_list([(2, 2, 0, 1, 3, 3, 0, 1)], chi)
    assert abs(w_quad - (w220 + w330)) < 1e-12


def test_omega_array_chif(q):
    chis = np.linspace(0.0, 0.9, 7)
    w_arr = q.omega(2, 2, 0, 1, chis)
    for i, c in enumerate(chis):
        assert abs(w_arr[i] - q.omega(2, 2, 0, 1, c)) < 1e-14


def test_mu_identity_at_zero_spin(q):
    assert abs(q.mu(2, 2, 2, 2, 0, 1, 0.0) - 1.0) < 1e-10
    assert abs(q.mu(3, 2, 2, 2, 0, 1, 0.0)) < 1e-10


def test_mu_zero_for_different_m(q):
    assert q.mu(2, 2, 2, 1, 0, 1, 0.5) == 0


def test_mu_mirror_symmetry(q):
    """mu mirror relation: sign=-1 gives (-1)^(l+l') conj of the
    (m -> -m) lookup (reference qnm.py:339-359)."""
    chi = 0.6
    mu_neg = q.mu(3, -2, 2, -2, 0, 1, chi)   # direct m<0 lookup
    mu_mirror = q.mu(3, 2, 2, 2, 0, -1, chi)
    assert abs(mu_mirror - (-1) ** (3 + 2) * np.conj(mu_neg)) < 1e-12


def test_mu_unit_norm(q, tables):
    """Mixing vectors are unit-norm eigenvectors."""
    row = tables.row[(2, 2, 0)]
    norms = np.sum(np.abs(tables.mu[row]) ** 2, axis=1)
    # Stored K components capture nearly all of the norm.
    assert np.all(norms > 0.999999)
    assert np.all(norms <= 1.0 + 1e-12)


def test_spline_interpolation_accuracy(tables):
    """Leave-one-out style: spline evaluated between grid points stays
    smooth (4th-order accurate)."""
    from qnmfits_tpu.spectrum.tables import eval_spline_np
    row = tables.row[(2, 2, 0)]
    chi_q = 0.5 * (tables.chi[100] + tables.chi[101])
    w_mid = eval_spline_np(tables.chi, tables.omega_c[row], chi_q)
    # Compare against a local 4-point polynomial through the raw samples.
    from numpy.polynomial import polynomial as Pn
    ks = slice(99, 103)
    pr = np.polyfit(tables.chi[ks], tables.omega[row][ks].real, 3)
    pi = np.polyfit(tables.chi[ks], tables.omega[row][ks].imag, 3)
    w_poly = np.polyval(pr, chi_q) + 1j * np.polyval(pi, chi_q)
    assert abs(w_mid - w_poly) < 1e-10


class TestMultiplets:
    """l=2, n>=8 multiplet branches (Cook & Zalutskiy data in the
    reference; computed by the in-house solver here)."""

    def test_keys_present(self, q):
        for m in (-2, -1, 0, 1, 2):
            assert abs(q.omega(2, m, 8, 1, 0.5)) > 0
        for m in (-2, -1, 1, 2):
            assert abs(q.omega(2, m, 9, 1, 0.5)) > 0

    def test_branches_split_from_special_point(self, q):
        """Both (2,2) branches approach -2i as chi -> 0 and separate
        like sqrt(chi)."""
        w8_lo = q.omega(2, 2, 8, 1, 0.02)
        w9_lo = q.omega(2, 2, 9, 1, 0.02)
        assert abs(w8_lo + 2j) < 0.1
        assert abs(w9_lo + 2j) < 0.1
        assert abs(w8_lo - w9_lo) > 0.05
        # n=8 is the less-damped branch.
        assert w8_lo.imag > w9_lo.imag

    def test_m0_pair_are_mirrors(self, q):
        """(2,0,9) is the exact mirror image of (2,0,8)."""
        w8 = q.omega(2, 0, 8, 1, 0.4)
        w9 = q.omega(2, 0, 9, 1, 0.4)
        assert abs(w9 + np.conj(w8)) < 1e-12

    def test_ladder_monotone_damping(self, q):
        """At moderate spin the (2,2) ladder is monotone in Im(omega)."""
        chi = 0.6
        ims = [q.omega(2, 2, n, 1, chi).imag for n in range(12)]
        assert all(ims[k] > ims[k + 1] for k in range(11))

    def test_extended_ladder_tracks(self, q):
        """(2,2,10/11) continue smoothly to high spin."""
        for n in (10, 11):
            w_lo = q.omega(2, 2, n, 1, 0.05)
            w_hi = q.omega(2, 2, n, 1, 0.9)
            assert w_hi.real > w_lo.real   # prograde: Re grows with spin


class TestOnDemandSolve:
    """Modes outside the baked artifact are solved at runtime with a disk
    cache (reference semantics: the `qnm` package solves any mode lazily,
    qnm.py:124-160)."""

    def test_fallback_solves_and_caches(self):
        from qnmfits_tpu.spectrum.tables import SpectrumTables
        t = SpectrumTables()            # fresh instance, not the singleton
        # (5,5,8): beyond the baked ladders (l=3/4 now carry n<=14;
        # l>=5 still stops at n=7).
        assert (5, 5, 8) not in t.row
        ms = t.compile_modes([(5, 5, 8, 1)])   # disk-cached by a prior run
        w = t.omega_np(ms, 0.7)[0]
        # Overtone ordering/continuity sanity: deeper than n=7, Re > 0.
        ms7 = t.compile_modes([(5, 5, 7, 1)])
        w7 = t.omega_np(ms7, 0.7)[0]
        assert w.imag < w7.imag < 0
        assert w.real > 0
        # mixing row exists too
        rows, comps, signs, parity, nz = t.compile_mu_indices(
            [(6, 5, 5, 5, 8, 1)])
        assert nz[0]

    def test_invalid_mode_still_raises(self):
        from qnmfits_tpu.spectrum.tables import SpectrumTables
        t = SpectrumTables()
        with pytest.raises(KeyError):
            t.compile_modes([(1, 1, 0, 1)])     # l < |s| for s=-2
        with pytest.raises(KeyError):
            t.compile_modes([(3, 4, 0, 1)])     # |m| > l

    def test_read_only_install_still_solves(self, tmp_path, monkeypatch):
        """On a read-only site-packages the disk cache is best-effort:
        the on-demand solve must succeed without persisting.  (chmod
        can't simulate this under root, which ignores permission bits;
        raise from the write call itself instead.)"""
        import qnmfits_tpu.spectrum.tables as tables_mod

        def _denied(*a, **k):
            raise OSError(30, "Read-only file system")

        monkeypatch.setattr(tables_mod, "DATA_DIR", tmp_path / "ro")
        monkeypatch.setattr(tables_mod.np, "savez", _denied)
        t = tables_mod.SpectrumTables()     # artifact path resolved at init
        ms = t.compile_modes([(5, 5, 8, 1)])
        w = t.omega_np(ms, 0.5)[0]
        assert np.isfinite(w) and w.imag < 0
        assert not list((tmp_path / "ro").rglob("*.npz"))


def test_schwarzschild_seeds_full_ladder_for_requested_l():
    """The requested l's own overtone ladder is solved in full even when
    it is not the largest l in the chain (regression: the on-demand
    solve for s=0, l<2 overtones hit a bare KeyError because
    n_max_low_l=0 capped the requested ladder at n=0)."""
    from qnmfits_tpu.spectrum.solver import schwarzschild_seeds

    seeds = schwarzschild_seeds(l_max=0, n_max=3, s=0, n_max_low_l=0)
    assert (0, 3) in seeds
    # published Schwarzschild scalar fundamental (Berti et al. 2009)
    assert abs(seeds[(0, 0)] - (0.110455 - 0.104896j)) < 1e-4


def test_on_demand_invalid_mode_friendly_error():
    from qnmfits_tpu.spectrum.tables import default_tables
    t = default_tables()
    with pytest.raises(KeyError, match="invalid mode"):
        t._row_for((1, 0, 0))       # l < |s| for s=-2


class TestL8Extension:
    """The l=8 table rows (round-2 coverage extension)."""

    def test_l8_schwarzschild_limit_matches_seed(self, tables):
        from qnmfits_tpu.spectrum.solver import schwarzschild_seeds
        seeds = schwarzschild_seeds(l_max=8, n_max=2, s=-2,
                                    n_max_low_l=0)
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        for n in (0, 1, 2):
            w = q.omega(8, 3, n, 1, 0.0)
            assert abs(w - seeds[(8, n)]) < 1e-8, n

    def test_l8_eikonal_sanity(self):
        """Re omega(l=8, n=0) at chi=0 within a few percent of the
        eikonal estimate (l+1/2)/sqrt(27)."""
        from qnmfits_tpu.qnm_api import qnm
        w = qnm().omega(8, 8, 0, 1, 0.0)
        assert abs(w.real - 8.5 / np.sqrt(27.0)) / w.real < 0.03
        assert -0.1 < w.imag < -0.09

    def test_l8_table_matches_direct_solve(self, tables):
        """Spline row vs a fresh track_mode solve at one spin."""
        from qnmfits_tpu.spectrum.solver import (schwarzschild_seeds,
                                                 track_mode)
        from qnmfits_tpu.qnm_api import qnm
        seeds = schwarzschild_seeds(l_max=8, n_max=1, s=-2,
                                    n_max_low_l=0)
        # dense spin steps: coarse continuation (e.g. 0.35 steps) hops
        # to a neighbouring overtone branch
        chi_probe = np.linspace(0.0, 0.7, 71)
        w, A, C = track_mode(8, 5, 1, seeds[(8, 1)], chi_probe, s=-2)
        q = qnm()
        for ci in (0, 35, 70):
            chi = float(chi_probe[ci])
            assert abs(q.omega(8, 5, 1, 1, chi) - w[ci]) < 2e-7, chi

    def test_l8_mirror_and_m_coverage(self):
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        for m in (-8, -3, 0, 4, 8):
            w = q.omega(8, m, 0, 1, 0.6)
            wm = q.omega(8, -m, 0, -1, 0.6)
            np.testing.assert_allclose(np.asarray(wm),
                                       np.asarray(-np.conj(w)),
                                       rtol=0, atol=1e-12)


class TestDeepOvertoneLadders:
    """Regular l=3/l=4 ladders extended to n<=14 (round 4;
    scripts/extend_overtones.py).  The reference's Cook data stops at
    n<=7 for every (l, m); the l>=3 extension needs no multiplet
    machinery -- the s=-2 algebraically special frequency (-10i at
    l=3) sits far below n=14."""

    def test_keys_present(self, tables):
        have = {tuple(k) for k in tables.keys}
        for l in (3, 4):
            for m in range(-l, l + 1):
                for n in range(8, 15):
                    assert (l, m, n) in have, (l, m, n)

    def test_schwarzschild_m_degeneracy(self):
        """At chi=0 the Kerr ladder collapses to the Schwarzschild
        l-multiplet: every m of (3, m, 10) must give the same omega.
        Each m is an INDEPENDENT Leaver track, so this is a real
        cross-check of the 7 new solves against each other."""
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        w0 = q.omega(3, 3, 10, 1, 0.0)
        for m in range(-3, 3):
            assert abs(q.omega(3, m, 10, 1, 0.0) - w0) < 1e-8, m

    def test_ladder_monotone_damping(self):
        """Im(omega) strictly decreasing in n through the extension
        boundary (n=7 -> 8) and down the new ladder."""
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        for (l, m, chi) in ((3, 3, 0.0), (3, 3, 0.6), (4, 4, 0.6)):
            ims = [q.omega(l, m, n, 1, chi).imag for n in range(15)]
            assert all(ims[k] > ims[k + 1] for k in range(14)), (l, m)

    def test_table_matches_direct_solve(self):
        """(3,3,9) spline row vs a fresh dense track at off-grid spin.

        Deep overtones pack tightly in Im(omega): 0.01 spin steps hop
        to the neighbouring overtone branch around chi~0.3 (verified),
        so the probe track uses the production table's ~0.0025 step.
        """
        from qnmfits_tpu.qnm_api import qnm
        from qnmfits_tpu.spectrum.solver import (schwarzschild_seeds,
                                                 track_mode)
        seeds = schwarzschild_seeds(l_max=3, n_max=9, s=-2,
                                    n_max_low_l=0)
        chi_probe = np.linspace(0.0, 0.7, 281)
        w, A, C = track_mode(3, 3, 9, seeds[(3, 9)], chi_probe, s=-2)
        q = qnm()
        for ci in (0, 140, 280):
            chi = float(chi_probe[ci])
            assert abs(q.omega(3, 3, 9, 1, chi) - w[ci]) < 2e-7, chi

    def test_mirror_symmetry_deep(self):
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        for (l, m, n) in ((3, 3, 12), (4, -2, 10)):
            w = q.omega(l, m, n, 1, 0.5)
            wm = q.omega(l, -m, n, -1, 0.5)
            assert abs(wm + np.conj(w)) < 1e-12


class TestArtifactIntegrity:
    """Whole-artifact health scan over all baked s=-2 tracks (1091
    modes x 400 spins): catches branch hops (second-difference spikes),
    sign corruption, and non-finite rows that per-mode tests would
    miss.  Bounds measured on the healthy round-4 artifact (max rel
    second-diff 0.097 for chi<0.95, 0.44 globally -- near-extremal
    deep overtones genuinely steepen) with ~2x headroom."""

    def test_all_tracks_finite_and_damped(self):
        from qnmfits_tpu.spectrum.tables import DATA_DIR
        z = np.load(DATA_DIR / "qnm_tables_s-2.npz")
        w = z["omega"]
        assert np.isfinite(w).all()
        assert np.all(w.imag < 0)
        assert np.isfinite(z["A"]).all() and np.isfinite(z["mu"]).all()

    def test_no_branch_hops(self):
        from qnmfits_tpu.spectrum.tables import DATA_DIR
        z = np.load(DATA_DIR / "qnm_tables_s-2.npz")
        chi, w = z["chi"], z["omega"]
        d2 = np.abs(np.diff(w, 2, axis=1))
        rel = d2 / np.maximum(np.abs(w[:, 1:-1]), 1e-3)
        assert rel[:, chi[1:-1] < 0.95].max() < 0.2
        assert rel.max() < 1.0


class TestS1Tables:
    """s=-1 electromagnetic QNM tables (beyond the reference's scope:
    it ships s=-2 plus s=0 for Qmu_B only)."""

    def test_schwarzschild_published_anchors(self):
        """Berti, Cardoso & Starinets 2009 s=-1 values.  These also seed
        the solver, but Newton must converge to the true CF root from a
        ~1e-4 guess, so 1e-6 agreement is a real check."""
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        refs = {(1, 0): 0.248263 - 0.092488j,
                (2, 0): 0.457596 - 0.095004j,
                (3, 0): 0.656899 - 0.095616j}
        for (l, n), ref in refs.items():
            w = q.omega(l, 0, n, 1, 0.0, s=-1)
            assert abs(w - ref) < 2e-6, (l, n)

    def test_kerr_table_matches_direct_solve(self):
        from qnmfits_tpu.qnm_api import qnm
        from qnmfits_tpu.spectrum.solver import (schwarzschild_seeds,
                                                 track_mode)
        seeds = schwarzschild_seeds(l_max=2, n_max=0, s=-1,
                                    n_max_low_l=0)
        chi_probe = np.linspace(0.0, 0.8, 81)
        w, A, C = track_mode(2, 2, 0, seeds[(2, 0)], chi_probe, s=-1)
        q = qnm()
        for ci in (0, 40, 80):
            chi = float(chi_probe[ci])
            assert abs(q.omega(2, 2, 0, 1, chi, s=-1) - w[ci]) < 2e-7

    def test_distinct_from_gravitational(self):
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        w1 = q.omega(2, 2, 0, 1, 0.68, s=-1)
        w2 = q.omega(2, 2, 0, 1, 0.68, s=-2)
        assert abs(w1 - w2) > 1e-2
        assert w1.imag < 0 and w2.imag < 0

    def test_mirror_symmetry(self):
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        w = q.omega(1, 1, 0, 1, 0.5, s=-1)
        wm = q.omega(1, -1, 0, -1, 0.5, s=-1)
        np.testing.assert_allclose(np.asarray(wm),
                                   np.asarray(-np.conj(w)),
                                   rtol=0, atol=1e-12)


def test_omega_array_Mf_scalar_chif(q):
    """Reference: 'One or both of chif and Mf can be array_like'
    (qnm.py:189-208).  Scalar chif + array Mf must broadcast, not
    collapse (regression)."""
    Mfs = np.array([0.9, 1.0, 1.1])
    w = q.omega(2, 2, 0, 1, 0.7, Mf=Mfs)
    assert np.shape(w) == (3,)
    w1 = q.omega(2, 2, 0, 1, 0.7)
    np.testing.assert_allclose(np.asarray(w), w1 / Mfs, rtol=0,
                               atol=1e-15)
    ws = q.omega_list([(2, 2, 0, 1), (3, 3, 0, 1)], 0.7, Mf=Mfs)
    assert len(ws) == 2 and np.shape(ws[0]) == (3,)


def test_l9_extension(q):
    """l=9 rows (round-2 coverage extension, second step)."""
    from qnmfits_tpu.spectrum.solver import schwarzschild_seeds
    seeds = schwarzschild_seeds(l_max=9, n_max=1, s=-2, n_max_low_l=0)
    for n in (0, 1):
        assert abs(q.omega(9, 4, n, 1, 0.0) - seeds[(9, n)]) < 1e-8
    # eikonal sanity + mirror symmetry at spin
    w = q.omega(9, 9, 0, 1, 0.0)
    assert abs(w.real - 9.5 / np.sqrt(27.0)) / w.real < 0.03
    wm = q.omega(9, -9, 0, -1, 0.6)
    np.testing.assert_allclose(
        np.asarray(wm), np.asarray(-np.conj(q.omega(9, 9, 0, 1, 0.6))),
        rtol=0, atol=1e-12)


def test_l10_extension(q):
    """l=10 rows (round-2 coverage extension, third step)."""
    from qnmfits_tpu.spectrum.solver import schwarzschild_seeds
    seeds = schwarzschild_seeds(l_max=10, n_max=1, s=-2, n_max_low_l=0)
    for n in (0, 1):
        assert abs(q.omega(10, 5, n, 1, 0.0) - seeds[(10, n)]) < 1e-8
    w = q.omega(10, 10, 0, 1, 0.0)
    assert abs(w.real - 10.5 / np.sqrt(27.0)) / w.real < 0.03


def test_on_demand_solve_success_path():
    """A mode outside the baked artifact is solved on demand, appended
    as a live spline row, disk-cached (track_cache), and its frequency
    continues the l-ladder's eikonal trend.  (~7 s on a fresh machine,
    instant once the track cache exists.)"""
    from qnmfits_tpu.spectrum.tables import default_tables

    t = default_tables()
    ms = t.compile_modes([(11, 2, 0, 1)])       # baked coverage is l<=10
    w11 = complex(t.omega_np(ms, 0.68)[0])
    w10 = complex(t.omega_np(t.compile_modes([(10, 2, 0, 1)]), 0.68)[0])
    w9 = complex(t.omega_np(t.compile_modes([(9, 2, 0, 1)]), 0.68)[0])
    # Eikonal spacing: Re omega grows by a near-constant step per l.
    step1 = w10.real - w9.real
    step2 = w11.real - w10.real
    assert abs(step2 - step1) < 0.05 * step1
    # Fundamental decay rates vary slowly along the ladder.
    assert abs(w11.imag - w10.imag) < 0.01
    # Regression pin (deterministic solver).
    assert abs(w11 - (2.3864244708 - 0.0906875519j)) < 1e-8
