"""Spatial-mapping tests: Qmu predictions, spheroidal harmonics, mapping
fit round trip."""

import numpy as np
import pytest

from qnmfits_tpu import spatial
from qnmfits_tpu.harmonics import sYlm


class TestSpheroidal:
    def test_reduces_to_spherical_at_zero(self):
        S = spatial.spheroidal_harmonic(-2, 2, 2, 0.0)
        th, ph = 0.8, 1.1
        assert abs(S(th, ph) - sYlm(-2, 2, 2, th, ph)) < 1e-12

    def test_unit_norm(self):
        gamma = 0.45 - 0.06j
        l0, C = spatial.spheroidal_coefficients(-2, 2, 2, gamma)
        assert abs(np.sum(np.abs(C) ** 2) - 1.0) < 1e-12

    def test_qmu_C_coefficient_vs_quadrature(self):
        """Orthonormality shortcut == sky-grid quadrature."""
        idx = [(2, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        a = spatial.Qmu_C(idx, 0.68, method="coefficients")[0]
        b = spatial.Qmu_C(idx, 0.68, method="quadrature", n_quad=48)[0]
        assert abs(a - b) < 1e-6
        idx2 = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        a2 = spatial.Qmu_C(idx2, 0.68, method="coefficients")[0]
        b2 = spatial.Qmu_C(idx2, 0.68, method="quadrature", n_quad=48)[0]
        assert abs(a2 - b2) < 1e-6
        # The dominant component is the diagonal one.
        assert abs(a2) > abs(a)


class TestQmu:
    def test_qmu_A_at_zero_spin(self):
        """At chi=0 the mixing is diagonal, so Qmu_A reduces to a single
        kappa product."""
        idx = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        got = spatial.Qmu_A(idx, 0.0, l_max=8)[0]
        expect = spatial.kappa(4, 4, 2, 2, 2, 2, -2, -2)
        assert abs(got - expect) < 1e-10

    def test_qmu_D_extra_factor(self):
        idx = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        a = spatial.Qmu_A(idx, 0.0, l_max=8)[0]
        d = spatial.Qmu_D(idx, 0.0, l_max=8)[0]
        i = 4
        assert abs(d - a * np.sqrt((i + 4) * (i - 3) * (i + 3) * (i - 2))) \
            < 1e-10


@pytest.fixture(scope="module")
def mapping_setup():
    """Synthetic data containing a linear ladder + a quadratic mode."""
    from qnmfits_tpu.ref_impl import get_qnm, ringdown

    Mf, chif = 0.952, 0.692
    times = np.arange(-10.0, 120.0, 0.1)
    q = get_qnm()
    spherical_modes = [(4, 4), (5, 4)]
    lin_modes = [(4, 4, 0, 1)]
    quad_mode = (2, 2, 0, 1, 2, 2, 0, 1)

    rng = np.random.default_rng(3)
    amps_lin = rng.standard_normal(1) + 1j * rng.standard_normal(1)
    amp_quad_per_sph = (rng.standard_normal(2)
                        + 1j * rng.standard_normal(2))

    w_lin = np.array(q.omega_list(lin_modes, chif, Mf))
    [w_quad] = q.omega_list([quad_mode], chif, Mf)

    data = {}
    for i, lm in enumerate(spherical_modes):
        mu = np.array(q.mu_list([lm + m for m in lin_modes], chif))
        h = ringdown(times, 0.0, mu * amps_lin, w_lin)
        h = h + ringdown(times, 0.0, [amp_quad_per_sph[i]], [w_quad])
        data[lm] = h
    return dict(times=times, data=data, Mf=Mf, chif=chif,
                spherical_modes=spherical_modes, lin_modes=lin_modes,
                quad_mode=quad_mode, amps_lin=amps_lin,
                amp_quad=amp_quad_per_sph)


class TestMappingFit:
    def test_recovers_per_sphere_amplitudes(self, mapping_setup):
        s = mapping_setup
        out = spatial.mapping_multimode_ringdown_fit(
            s["times"], s["data"], list(s["lin_modes"]) + [s["quad_mode"]],
            s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
            T=100, spherical_modes=s["spherical_modes"])
        assert out["mismatch"] < 1e-12
        # The mapped quadratic mode gets one amplitude per spherical mode.
        mask = np.array([m == s["quad_mode"] for m in out["modes"]])
        np.testing.assert_allclose(out["C"][mask], s["amp_quad"],
                                   atol=1e-8)
        # Linear amplitudes recovered too.
        mask_lin = np.array([m == s["lin_modes"][0] for m in out["modes"]])
        np.testing.assert_allclose(out["C"][mask_lin], s["amps_lin"],
                                   atol=1e-8)

    def test_spatial_reconstruction_normalised(self, mapping_setup):
        s = mapping_setup
        out = spatial.mapping_multimode_ringdown_fit(
            s["times"], s["data"], list(s["lin_modes"]) + [s["quad_mode"]],
            s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
            T=100, spherical_modes=s["spherical_modes"])
        th = np.linspace(0.1, np.pi - 0.1, 12)
        ph = np.linspace(0, 2 * np.pi, 13)
        TH, PH = np.meshgrid(th, ph, indexing="ij")
        rec = spatial.spatial_reconstruction(TH, PH, out, s["quad_mode"],
                                             l_max=8)
        assert np.max(np.abs(rec)) == pytest.approx(1.0)

    def test_spatial_data_mismatch_self_is_zero(self, mapping_setup):
        s = mapping_setup
        out = spatial.mapping_multimode_ringdown_fit(
            s["times"], s["data"], list(s["lin_modes"]) + [s["quad_mode"]],
            s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
            T=100, spherical_modes=s["spherical_modes"])
        assert spatial.spatial_data_mismatch(out, out, s["quad_mode"]) \
            < 1e-14


def test_spatial_prediction_linear_peak_normalised():
    th = np.linspace(0.1, np.pi - 0.1, 16)
    ph = np.linspace(0, 2 * np.pi, 17)
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    pat = spatial.spatial_prediction_linear(TH, PH, (2, 2, 0, 1), 8, 0.68)
    assert np.max(np.abs(pat)) == pytest.approx(1.0)


def test_spatial_prediction_C_close_to_linear_limit():
    """For a quadratic mode, prediction C evaluated on the sky is the
    combined-frequency spheroidal; its dominant sYlm content is (L, M)."""
    quad = (2, 2, 0, 1, 2, 2, 0, 1)
    th = np.linspace(0.1, np.pi - 0.1, 24)
    ph = np.zeros_like(th)
    pat = spatial.spatial_prediction_C(th, ph, quad, 0.68)
    # Dominated by sY_{-2,4,4}: peak location should be close.
    y44 = sYlm(-2, 4, 4, th, 0.0)
    assert abs(np.argmax(np.abs(pat)) - np.argmax(np.abs(y44))) <= 2


def test_qmu_B_with_scalar_tables():
    """Qmu_B uses s=0 (scalar) mixing for its second factor
    (reference spatial_mapping_functions.py:787-799)."""
    idx = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
    val = spatial.Qmu_B(idx, 0.68, l_max=8)[0]
    assert np.isfinite(val) and abs(val) > 1e-3
    # At chi=0 both mixings are diagonal: B reduces to a single kappa.
    val0 = spatial.Qmu_B(idx, 0.0, l_max=8)[0]
    expect0 = spatial.kappa(4, 4, 2, 2, 2, 2, -2, 0)
    assert abs(val0 - expect0) < 1e-10


def test_mapping_fit_with_unmapped_quadratic(mapping_setup):
    """A quadratic mode NOT being mapped is fit through the Qmu_B
    mixing prediction (reference :202-210)."""
    s = mapping_setup
    extra_quad = (3, 3, 0, 1, 2, 2, 0, 1)
    out = spatial.mapping_multimode_ringdown_fit(
        s["times"], s["data"],
        list(s["lin_modes"]) + [s["quad_mode"], extra_quad],
        s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
        T=100, spherical_modes=s["spherical_modes"])
    # The data contains no (3,3,0)x(2,2,0) content: its amplitude should
    # be tiny and the fit still near-perfect.
    assert out["mismatch"] < 1e-10
