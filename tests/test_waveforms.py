"""Waveform-layer tests: Custom pipeline, fluxes, rotations, projection."""

import numpy as np
import pytest

from qnmfits_tpu import harmonics as H
from qnmfits_tpu.waveforms import Custom


@pytest.fixture(scope="module")
def ringdown_waveform():
    """A synthetic multimode ringdown wrapped in Custom."""
    from qnmfits_tpu.ref_impl import get_qnm

    Mf, chif_mag = 0.952, 0.692
    chif = np.array([0.0, 0.0, chif_mag])
    # Smooth (pure damped-sinusoid) data from t=0: discontinuous data
    # would make the spline-based fluxes ring, as in the reference.
    times = np.arange(0.0, 100.0, 0.1)
    q = get_qnm()

    rng = np.random.default_rng(1)
    data_dict = {}
    for l in (2, 3):
        for m in range(-l, l + 1):
            data_dict[(l, m)] = np.zeros(len(times), complex)
    for (l, m) in [(2, 2), (2, -2), (3, 2)]:
        w = q.omega(l, abs(m), 0, 1 if m > 0 else -1, chif_mag, Mf)
        amp = rng.standard_normal() + 1j * rng.standard_normal()
        data_dict[(l, m)] = amp * np.exp(-1j * w * times)

    metadata = {"remnant_mass": Mf, "remnant_dimensionless_spin": chif}
    return Custom(times.copy(), data_dict, metadata)


class TestCustom:
    def test_attributes(self, ringdown_waveform):
        wf = ringdown_waveform
        assert wf.Mf == 0.952
        assert abs(wf.chif_mag - 0.692) < 1e-12
        assert wf.ellMax == 3
        assert set(wf.h.keys()) == {(l, m) for l in (2, 3)
                                    for m in range(-l, l + 1)}

    def test_edot_positive(self, ringdown_waveform):
        assert np.all(ringdown_waveform.Edot >= 0)

    def test_moft_monotone_to_Mf(self, ringdown_waveform):
        wf = ringdown_waveform
        # M(t) decreases toward Mf as energy is radiated.
        assert wf.Moft[-1] == pytest.approx(wf.Mf, abs=1e-10)
        # Decreasing up to small spline-antiderivative wiggle.
        assert np.all(np.diff(wf.Moft) <= 1e-6 * wf.Moft[0])
        assert wf.Moft[0] >= wf.Mf
        # And the total radiated energy matches the trapezoid Edot
        # integral (spline vs trapezoid quadrature differ at ~1e-5 for
        # oscillatory Edot at dt=0.1).
        E_trapz = np.trapezoid(wf.Edot, wf.times)
        assert wf.Moft[0] - wf.Mf == pytest.approx(E_trapz, rel=1e-3)

    def test_chioft_ends_at_chif(self, ringdown_waveform):
        wf = ringdown_waveform
        np.testing.assert_allclose(wf.chioft[-1], wf.chif, atol=1e-10)

    def test_foft_matches_mode_frequency(self, ringdown_waveform):
        wf = ringdown_waveform
        from qnmfits_tpu.ref_impl import get_qnm
        w220 = get_qnm().omega(2, 2, 0, 1, wf.chif_mag, wf.Mf)
        # For a pure damped sinusoid the phase-derivative frequency is
        # Re(w)/2pi; check mid-waveform samples.
        f = wf.foft[2, 2][len(wf.times) // 2]
        assert abs(f - abs(w220.real) / (2 * np.pi)) < 1e-3

    def test_zero_time_mode_peak(self):
        times = np.arange(-20.0, 80.0, 0.1)
        data = {(2, 2): np.exp(-((times - 3.7) ** 2))
                * np.exp(-2j * times),
                (2, -2): np.zeros_like(times, dtype=complex),
                (2, 1): np.zeros_like(times, dtype=complex),
                (2, -1): np.zeros_like(times, dtype=complex),
                (2, 0): np.zeros_like(times, dtype=complex)}
        md = {"remnant_mass": 0.95,
              "remnant_dimensionless_spin": [0, 0, 0.7]}
        wf = Custom(times, data, md, zero_time=(2, 2))
        # After the shift, the mode peaks at t=0.
        assert abs(wf.times[np.argmax(np.abs(wf.h[2, 2]))]) < 0.1


class TestRotation:
    def test_rotation_preserves_per_l_power(self):
        """Wigner-D rotation is unitary within each l."""
        times = np.arange(-5.0, 5.0, 0.5)
        rng = np.random.default_rng(2)
        data = {(l, m): rng.standard_normal(len(times))
                + 1j * rng.standard_normal(len(times))
                for l in (2, 3) for m in range(-l, l + 1)}
        md = {"remnant_mass": 0.95,
              "remnant_dimensionless_spin": [0.3, 0.1, 0.6]}
        wf = Custom(times, dict(data), md)
        power_before = {l: sum(np.abs(wf.h[l, m]) ** 2
                               for m in range(-l, l + 1))
                        for l in (2, 3)}
        wf.rotate_modes()
        for l in (2, 3):
            power_after = sum(np.abs(wf.h[l, m]) ** 2
                              for m in range(-l, l + 1))
            np.testing.assert_allclose(power_after, power_before[l],
                                       rtol=1e-10)
        # Spin now along z.
        np.testing.assert_allclose(wf.chif[:2], 0.0, atol=1e-14)

    def test_project_signal_shape(self, ringdown_waveform):
        sig = ringdown_waveform.project_signal(0.5, 1.0)
        assert sig.shape == ringdown_waveform.times.shape
        assert np.iscomplexobj(sig)


def test_foft_zero_crossings(ringdown_waveform):
    """Zero-crossings frequency estimator (reference Base.py:312-349)."""
    wf = ringdown_waveform
    wf.calculate_foft(method="zero_crossings")
    from qnmfits_tpu.ref_impl import get_qnm
    w220 = get_qnm().omega(2, 2, 0, 1, wf.chif_mag, wf.Mf)
    plus = wf.foft[2, 2]["plus"]       # columns (mid-times, frequency)
    mid = plus[len(plus) // 2, 1]
    assert abs(mid - abs(w220.real) / (2 * np.pi)) < 2e-3
    # restore default method for other tests
    wf.calculate_foft()


# ---------------------------------------------------------------------------
# Surrogate classes under a mocked gwsurrogate/surfinBH (the real
# packages are optional installs in the reference too; the mock lets the
# full pipeline -- evaluation, m<0 symmetry fill, remnant fits, fluxes,
# rotations -- execute)
# ---------------------------------------------------------------------------

def _mock_surrogate_modules(monkeypatch, aligned, chif_vec):
    import sys
    import types

    from qnmfits_tpu.ref_impl import get_qnm

    Mf = 0.952
    chif_mag = float(np.linalg.norm(chif_vec))
    times = np.arange(0.0, 120.0, 0.1)
    q = get_qnm()
    rng = np.random.default_rng(3)

    def make_h(ms_nonneg_only):
        h = {}
        for l in (2, 3, 4):
            mrange = range(0, l + 1) if ms_nonneg_only else \
                range(-l, l + 1)
            for m in mrange:
                if l == 4 and m == 0 and ms_nonneg_only:
                    continue            # the class must zero-fill (4,0)
                if abs(m) == l and l <= 3:
                    w = q.omega(l, abs(m), 0, 1 if m >= 0 else -1,
                                chif_mag, Mf)
                    amp = rng.standard_normal() + 1j * rng.standard_normal()
                    h[l, m] = amp * np.exp(-1j * w * times)
                else:
                    h[l, m] = np.zeros(len(times), complex)
        return h

    class _Sur:
        def __init__(self, nonneg):
            self.nonneg = nonneg

        def __call__(self, q, chiA0, chiB0, f_low, f_ref, ellMax,
                     precessing_opts=None):
            return times.copy(), make_h(self.nonneg), {"mock": True}

    gws = types.ModuleType("gwsurrogate")
    gws.NRSur7dq4 = object()            # skip catalog.pull
    gws.NRHybSur3dq8 = object()
    gws.LoadSurrogate = lambda name: _Sur(nonneg=aligned)

    class _Rem:
        def mf(self, q, chi1, chi2, omega0=None):
            return Mf, 1e-4

        def chif(self, q, chi1, chi2, omega0=None):
            return np.asarray(chif_vec, float), np.full(3, 1e-4)

    sfb = types.ModuleType("surfinBH")
    sfb.LoadFits = lambda name: _Rem()

    monkeypatch.setitem(sys.modules, "gwsurrogate", gws)
    monkeypatch.setitem(sys.modules, "surfinBH", sfb)
    return Mf, chif_mag, times


class TestSurrogatesMocked:
    def test_import_gating_without_deps(self):
        from qnmfits_tpu.waveforms import NRSur7dq4
        with pytest.raises(ImportError, match="gwsurrogate"):
            NRSur7dq4(q=1.2)

    def test_nrsur7dq4_pipeline(self, monkeypatch):
        from qnmfits_tpu.waveforms import NRSur7dq4

        chif_vec = [0.1, 0.05, 0.68]    # precessing: chif off-axis
        Mf, chif_mag, times = _mock_surrogate_modules(
            monkeypatch, aligned=False, chif_vec=chif_vec)
        wf = NRSur7dq4(q=1.5, chi1=[0.1, 0.0, 0.3], chi2=[0, 0, 0],
                       transform="rotation")
        assert wf.Mf == Mf
        assert abs(wf.chif_mag - chif_mag) < 1e-14
        assert wf.ellMax == 4
        # rotation aligned the frame with chif
        assert abs(wf.thetaf) > 1e-3    # original chif was off-axis
        assert wf.Moft[0] > wf.Mf       # mass radiated away
        np.testing.assert_allclose(wf.Moft[-1], wf.Mf, rtol=1e-10)
        assert (2, 2) not in (() if wf.foft is None else ())  # foft ran
        assert wf.foft[2, 2] is not None

    def test_nrhybsur3dq8_symmetry_fill(self, monkeypatch):
        from qnmfits_tpu.waveforms import NRHybSur3dq8

        Mf, chif_mag, times = _mock_surrogate_modules(
            monkeypatch, aligned=True, chif_vec=[0.0, 0.0, 0.69])
        wf = NRHybSur3dq8(q=2.0, chi1=[0, 0, 0.2], chi2=[0, 0, -0.1])
        # m<0 filled by the aligned-spin symmetry (-1)^l conj
        np.testing.assert_allclose(
            wf.h[2, -2], (-1) ** 2 * np.conj(wf.h[2, 2]))
        np.testing.assert_allclose(
            wf.h[3, -3], (-1) ** 3 * np.conj(wf.h[3, 3]))
        # absent (4,0) zero-filled
        np.testing.assert_allclose(wf.h[4, 0], 0.0)
        assert wf.Mf == Mf
        # remnant ringdown fit through the standard machinery works
        from qnmfits_tpu import fitting
        r = fitting.ringdown_fit(
            wf.times, wf.h[2, 2], [(2, 2, 0, 1)], wf.Mf, wf.chif_mag,
            t0=10.0)
        assert r["mismatch"] < 1e-10    # data IS a (2,2,0) ringdown


def test_rotate_modes_over_time_zero_spin_samples():
    """A chioft track with zero-magnitude samples (junk early inspiral)
    must produce identity rotations there, not 0/0 NaNs (same guard
    family as the aligned-spin rotate_modes fix)."""
    from qnmfits_tpu.waveforms.custom import Custom

    times = np.linspace(-10.0, 50.0, 301)
    h = {(l, m): np.exp(-1j * 0.5 * times) * np.exp(-0.05 * times)
         for l in (2,) for m in range(-2, 3)}
    md = {"remnant_mass": 0.95,
          "remnant_dimensionless_spin": [0.0, 0.0, 0.7]}
    wf = Custom(times, h, md, zero_time=0.0)
    K = len(wf.times)
    wf.chioft = np.zeros((K, 3))
    wf.chioft[K // 2:] = [0.05, 0.0, 0.69]       # spin "turns on"
    wf.chioft_mag = np.linalg.norm(wf.chioft, axis=1)
    wf.rotate_modes_over_time()
    for m in range(-2, 3):
        assert np.all(np.isfinite(wf.h[2, m]))
    # Zero-spin samples: identity rotation, h unchanged there.
    np.testing.assert_allclose(wf.h[2, 2][: K // 2],
                               h[2, 2][: K // 2], atol=1e-12)
