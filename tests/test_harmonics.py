"""Harmonics tests: closed forms, orthonormality, rotation consistency,
3j vs sympy exact values."""

import numpy as np
import pytest

from qnmfits_tpu import harmonics as H


def _sphere_grid(n_theta=120, n_phi=121):
    th = np.linspace(0, np.pi, n_theta + 1)[:-1] + np.pi / (2 * n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    dA = (np.pi / n_theta) * (2 * np.pi / n_phi) * np.sin(TH)
    return TH, PH, dA


class TestSYlm:
    def test_closed_form_m2Y22(self):
        th, ph = 0.73, 1.21
        expect = 0.5 * np.sqrt(5 / np.pi) * np.cos(th / 2) ** 4 \
            * np.exp(2j * ph)
        assert abs(H.sYlm(-2, 2, 2, th, ph) - expect) < 1e-12

    def test_closed_form_m2Y2m2(self):
        th, ph = 1.1, 0.4
        expect = 0.5 * np.sqrt(5 / np.pi) * np.sin(th / 2) ** 4 \
            * np.exp(-2j * ph)
        assert abs(H.sYlm(-2, 2, -2, th, ph) - expect) < 1e-12

    def test_closed_form_Y00(self):
        assert abs(H.sYlm(0, 0, 0, 0.5, 0.3) - 1 / np.sqrt(4 * np.pi)) < 1e-12

    def test_closed_form_Y10(self):
        th = 0.9
        assert abs(H.sYlm(0, 1, 0, th, 0.0)
                   - np.sqrt(3 / (4 * np.pi)) * np.cos(th)) < 1e-12

    def test_orthonormality(self):
        TH, PH, dA = _sphere_grid()
        for (l1, m1), (l2, m2) in [((2, 2), (2, 2)), ((2, 2), (3, 2)),
                                   ((2, 1), (2, 2)), ((3, -2), (3, -2))]:
            Y1 = H.sYlm(-2, l1, m1, TH, PH)
            Y2 = H.sYlm(-2, l2, m2, TH, PH)
            ip = np.sum(Y1 * np.conj(Y2) * dA)
            expect = 1.0 if (l1, m1) == (l2, m2) else 0.0
            assert abs(ip - expect) < 1e-3


class TestWignerD:
    def test_identity_rotation(self):
        q = np.array([1.0, 0, 0, 0])
        for (mp, m) in [(2, 2), (1, -1), (0, 0)]:
            expect = 1.0 if mp == m else 0.0
            assert abs(H.wigner_D(2, mp, m, q) - expect) < 1e-13

    def test_unitarity(self):
        q = H.quat_from_spherical(0.8, 2.1)
        l = 3
        D = np.array([[H.wigner_D(l, mp, m, q) for m in range(-l, l + 1)]
                      for mp in range(-l, l + 1)])
        np.testing.assert_allclose(D @ D.conj().T, np.eye(2 * l + 1),
                                   atol=1e-12)

    def test_rotation_consistency_with_sYlm(self):
        """Projecting rotated modes at (theta, phi) equals projecting the
        original modes at the back-rotated direction: the defining property
        tying rotate_mode_dict to sYlm/project_signal."""
        rng = np.random.default_rng(0)
        ellMax = 4
        h = {(l, m): np.array([rng.standard_normal()
                               + 1j * rng.standard_normal()])
             for l in range(2, ellMax + 1) for m in range(-l, l + 1)}

        beta, alpha = 0.62, 1.37  # rotation via axis-angle about z-tilted
        rot_vec = beta * np.array([np.sin(alpha), -np.cos(alpha), 0.0])
        q = H.quat_from_axis_angle(rot_vec)
        hp = H.rotate_mode_dict(h, q, ellMax)

        def project(hd, theta, phi):
            return sum(hd[l, m][0] * H.sYlm(-2, l, m, theta, phi)
                       for l in range(2, ellMax + 1)
                       for m in range(-l, l + 1))

        # direction n' = R^{-1} n for a few test directions
        from numpy import cos, sin

        def rotmat(q):
            w, x, y, z = q
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w),
                 1 - 2 * (x * x + y * y)]])

        Rm = rotmat(q)
        for theta, phi in [(0.5, 0.2), (1.3, 2.8), (2.2, 4.4)]:
            n = np.array([sin(theta) * cos(phi), sin(theta) * sin(phi),
                          cos(theta)])
            npr = Rm @ n   # h'(n) = h(R n)
            theta_p = np.arccos(np.clip(npr[2], -1, 1))
            phi_p = np.arctan2(npr[1], npr[0])
            a = project(hp, theta, phi)
            b = project(h, theta_p, phi_p)
            # Spin-weighted fields pick up a spin phase under rotation;
            # the magnitude is frame-invariant.
            assert abs(abs(a) - abs(b)) < 1e-12


class TestWigner3j:
    def test_vs_sympy(self):
        from sympy.physics.wigner import wigner_3j as sym3j
        cases = [(2, 2, 2, 2, -2, 0), (2, 2, 4, 2, 2, -4),
                 (3, 2, 3, 1, -2, 1), (2, 2, 3, -2, 0, 2),
                 (4, 3, 5, 2, 2, -4), (2, 2, 2, 0, 0, 0)]
        for args in cases:
            expect = float(sym3j(*args))
            assert abs(H.wigner_3j(*args) - expect) < 1e-12, args

    def test_selection_rules(self):
        assert H.wigner_3j(2, 2, 2, 1, 1, 1) == 0.0   # m sum != 0
        assert H.wigner_3j(2, 2, 5, 0, 0, 0) == 0.0   # triangle violated


def test_kappa_matches_sphere_integral():
    """kappa = integral of sY_{s1,d,b} sY_{s2,h,f} conj(sY_{s1+s2,i,j})
    over the sphere (Gaunt-type), the contraction used by Qmu_A/B/D
    (reference spatial_mapping_functions.py:690-725)."""
    from qnmfits_tpu.spatial import kappa
    TH, PH, dA = _sphere_grid(200, 201)
    s1, s2 = -2, 0
    d, b, h, f = 2, 2, 2, 0
    i, j = 2, 2
    Y1 = H.sYlm(s1, d, b, TH, PH)
    Y2 = H.sYlm(s2, h, f, TH, PH)
    Y3 = H.sYlm(s1 + s2, i, j, TH, PH)
    integral = np.sum(Y1 * Y2 * np.conj(Y3) * dA)
    assert abs(integral - kappa(i, j, d, h, b, f, s1, s2)) < 1e-4
