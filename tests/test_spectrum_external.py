"""External-truth anchors for the from-scratch Kerr spectrum solver.

Every number or formula here comes from OUTSIDE this repository's solver
path, so a systematic error in the Leaver-CF/spectral-angular machinery
(sign conventions, branch labelling, mixing-index order) cannot cancel:

* Schwarzschild frequencies: published values (Leaver 1985; Berti,
  Cardoso & Starinets 2009, Class. Quantum Grav. 26 163001, Table 1 /
  appendix tables -- the standard s=-2 QNM tables).
* Kerr (2,2,0) at chi=0.68: the `qnm` package's documented worked
  example value (the same package the reference builds on,
  /root/reference/qnmfits/qnm.py:124-160).
* Kerr frequency fits: Berti, Cardoso & Will 2006 (PRD 73, 064030)
  Table VIII fitting formulae omega_R = f1 + f2 (1-chi)^f3,
  Q = q1 + q2 (1-chi)^q3, quoted accurate to a few percent over
  chi in [0, 0.99] -- a branch swap, wrong mirror transform, or wrong
  m-sign convention produces O(50%) deviations.
* Mixing coefficients: the angular operator
  M = diag(l(l+1)-s(s+1)) + 2 c s X - c^2 X^2 rebuilt with the
  cos(theta) matrix X computed by Gauss-Legendre QUADRATURE of
  spin-weighted spherical harmonics (harmonics.sYlm, itself tested
  against closed forms and orthonormality) -- fully independent of
  angular.py's ladder-coefficient (Clebsch) construction -- plus the
  first-order Press-Teukolsky perturbation formula
  mu_{l'} ~ 2 c s X_{l'l} / (A0_l - A0_{l'}).

Reference semantics being pinned: qnm.omega / qnm.mu of
/root/reference/qnmfits/qnm.py:162-361.
"""

import numpy as np
import pytest
from numpy.polynomial.legendre import leggauss


@pytest.fixture(scope="module")
def q():
    from qnmfits_tpu.qnm_api import qnm
    return qnm()


# ---------------------------------------------------------------------------
# Schwarzschild anchors (published to 6 decimals; l=5,6 to fewer)
# ---------------------------------------------------------------------------

SCHW_S2 = {
    # (l, n): M*omega, s=-2 (Berti-Cardoso-Starinets 2009)
    (2, 0): 0.373672 - 0.088962j,
    (2, 1): 0.346711 - 0.273915j,
    (2, 2): 0.301053 - 0.478277j,
    (2, 3): 0.251505 - 0.705148j,
    (3, 0): 0.599443 - 0.092703j,
    (3, 1): 0.582644 - 0.281298j,
    (3, 2): 0.551685 - 0.479093j,
    (4, 0): 0.809178 - 0.094164j,
    (4, 1): 0.796632 - 0.284334j,
    (4, 2): 0.772710 - 0.479908j,
}

# Leaver's high-precision fundamental (l=2, n=0).
SCHW_220_HI = 0.3736716844180418 - 0.0889623156889357j

SCHW_S0 = {
    # (l, n): M*omega, s=0 scalar field (Berti-Cardoso-Starinets 2009)
    (0, 0): 0.110455 - 0.104896j,
    (1, 0): 0.292936 - 0.097660j,
    (2, 0): 0.483644 - 0.096759j,
}


@pytest.mark.parametrize("ln,ref", sorted(SCHW_S2.items()))
def test_schwarzschild_s2_anchors(q, ln, ref):
    l, n = ln
    w = q.omega(l, min(l, 2), n, 1, 0.0)     # m is irrelevant at chi=0
    assert abs(w - ref) < 2e-6


def test_schwarzschild_fundamental_high_precision(q):
    assert abs(q.omega(2, 2, 0, 1, 0.0) - SCHW_220_HI) < 1e-9


def test_schwarzschild_higher_l(q):
    # Published to ~5 decimals; catches ladder/branch errors at high l.
    assert abs(q.omega(5, 2, 0, 1, 0.0) - (1.012295 - 0.094871j)) < 2e-5
    assert abs(q.omega(6, 2, 0, 1, 0.0) - (1.212010 - 0.095270j)) < 1e-4


@pytest.mark.parametrize("ln,ref", sorted(SCHW_S0.items()))
def test_schwarzschild_s0_anchors(q, ln, ref):
    l, n = ln
    try:
        w = q.omega(l, min(l, 1), n, 1, 0.0, s=0)
    except KeyError:
        pytest.skip("s=0 artifact predates l<|2| coverage; rebuild with "
                    "`python -m qnmfits_tpu.spectrum.build_tables --s 0`")
    assert abs(w - ref) < 2e-6


def test_schwarzschild_mirror_exact(q):
    """At chi=0 the sign=-1 mode is exactly -conj (reference
    qnm.py:232-233)."""
    w_p = q.omega(2, 2, 0, 1, 0.0)
    w_m = q.omega(2, 2, 0, -1, 0.0)
    assert abs(w_m + np.conj(w_p)) < 1e-12


# ---------------------------------------------------------------------------
# Kerr anchors
# ---------------------------------------------------------------------------

def test_kerr_220_qnm_package_example(q):
    """chi=0.68 worked example from the `qnm` package documentation."""
    ref = 0.5239751042900845 - 0.08151262363119974j
    assert abs(q.omega(2, 2, 0, 1, 0.68) - ref) < 1e-8


def test_kerr_220_extremal_limit(q):
    """Prograde (2,2,0) frequency approaches m/2 = 1 as chi -> 1."""
    w95 = q.omega(2, 2, 0, 1, 0.95)
    w999 = q.omega(2, 2, 0, 1, 0.999)
    assert w999.real > w95.real > q.omega(2, 2, 0, 1, 0.68).real
    assert 0.85 < w999.real < 1.0
    assert -0.04 < w999.imag < 0.0      # damping -> 0 at extremality


# Berti-Cardoso-Will 2006 Table VIII fit coefficients
# (f1, f2, f3, q1, q2, q3); fits quoted good to a few percent.
BCW_FITS = {
    (2, 2, 0): (1.5251, -1.1568, 0.1292, 0.7000, 1.4187, -0.4990),
    (2, 2, 1): (1.3673, -1.0260, 0.1628, 0.1000, 0.5436, -0.4731),
    (2, 1, 0): (0.6000, -0.2339, 0.4175, -0.3000, 2.3561, -0.2277),
    (3, 3, 0): (1.8956, -1.3043, 0.1818, 0.9000, 2.3430, -0.4810),
    (4, 4, 0): (2.3000, -1.5056, 0.2244, 1.1929, 3.1191, -0.4825),
}

BCW_SPINS = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.98]


@pytest.mark.parametrize("lmn,coef", sorted(BCW_FITS.items()))
def test_bcw_fit_formula_agreement(q, lmn, coef):
    """omega_R and Q track the published fits within the fits' own
    accuracy (measured deviations are <= 2.1%; tolerance 3.5%).  A branch
    swap, mirror-transform error, or wrong m sign breaks this by O(50%)."""
    l, m, n = lmn
    f1, f2, f3, q1, q2, q3 = coef
    for chi in BCW_SPINS:
        w = q.omega(l, m, n, 1, chi)
        wr_fit = f1 + f2 * (1.0 - chi) ** f3
        Q_fit = q1 + q2 * (1.0 - chi) ** q3
        Q = w.real / (-2.0 * w.imag)
        assert abs(w.real - wr_fit) / w.real < 0.035, (lmn, chi)
        assert abs(Q - Q_fit) / Q < 0.035, (lmn, chi)


def test_retrograde_221_distinct_branch(q):
    """m=-2 (retrograde, Re>0) is a different branch from the m=2
    mirror; at chi=0 they coincide, at spin they must not."""
    w_retro = q.omega(2, -2, 0, 1, 0.7)
    w_pro = q.omega(2, 2, 0, 1, 0.7)
    assert w_retro.real > 0
    assert abs(w_retro - w_pro) > 0.1
    # Retrograde frequencies DEcrease with spin (counter-rotating).
    assert w_retro.real < q.omega(2, -2, 0, 1, 0.0).real


# ---------------------------------------------------------------------------
# Mixing coefficients vs an independently-constructed angular operator
# ---------------------------------------------------------------------------

def _X_quadrature(s, m, nl, order=96):
    """<s,l',m| cos(theta) |s,l,m> by Gauss-Legendre quadrature.

    Built from explicit sYlm evaluations -- no ladder/Clebsch
    coefficients shared with qnmfits_tpu.spectrum.angular.
    """
    from qnmfits_tpu.harmonics import sYlm
    l0 = max(abs(s), abs(m))
    x, w = leggauss(order)
    theta = np.arccos(x)
    Y = np.array([sYlm(s, l, m, theta, 0.0) for l in range(l0, l0 + nl)])
    X = 2.0 * np.pi * np.einsum("aq,q,q,bq->ab", np.conj(Y), w, x, Y)
    return X.real


def _mu_quadrature(q, l, m, n, chi, s=-2, nl=14):
    """Mixing vector from the quadrature-built operator (same phase and
    normalisation conventions as the tables)."""
    omega = q.omega(l, m, n, 1, chi)
    c = chi * omega
    l0 = max(abs(s), abs(m))
    X = _X_quadrature(s, m, nl)
    lam0 = np.array([L * (L + 1) - s * (s + 1)
                     for L in range(l0, l0 + nl)], float)
    M = np.diag(lam0).astype(complex) + 2.0 * c * s * X - c * c * (X @ X)
    A_all, C_all = np.linalg.eig(M)
    k = int(np.argmax(np.abs(C_all[l - l0, :])))
    C = C_all[:, k]
    d = C[l - l0]
    C = C * (abs(d) / d)
    return C / np.linalg.norm(C)


@pytest.mark.parametrize("lmnchi", [
    (2, 2, 0, 0.7), (3, 2, 0, 0.7), (2, 1, 2, 0.5),
    (2, 2, 0, 0.95), (3, 3, 1, 0.6), (4, 2, 0, 0.8), (2, -2, 0, 0.7),
])
def test_mu_vs_quadrature_operator(q, lmnchi):
    l, m, n, chi = lmnchi
    Cq = _mu_quadrature(q, l, m, n, chi)
    l0 = max(2, abs(m))
    idx = [(lp, m, l, m, n, 1) for lp in range(l0, l0 + 8)]
    mu_t = np.array(q.mu_list(idx, chi))
    assert np.max(np.abs(Cq[:8] - mu_t)) < 1e-8, lmnchi


def test_mu_first_order_perturbation(q):
    """Press-Teukolsky first-order mixing: for small c = chi*omega,
    mu_{l'm,lmn} ~ 2 c s X_{l'l} / (A0_l - A0_{l'}) + O(c^2).

    Pins the SIGN and magnitude of the leading off-diagonal mixing --
    the convention a pure-symmetry test cannot see.
    """
    s = -2
    chi = 0.05
    for (l, m) in [(2, 2), (3, 2), (3, 3)]:
        omega = q.omega(l, m, 0, 1, chi)
        c = chi * omega
        X = _X_quadrature(s, m, nl=10)
        l0 = max(abs(s), abs(m))
        for lp in (l - 1, l + 1):
            if lp < l0:
                continue
            A0 = l * (l + 1) - s * (s + 1)
            A0p = lp * (lp + 1) - s * (s + 1)
            mu_pt = 2.0 * c * s * X[lp - l0, l - l0] / (A0 - A0p)
            mu_t = q.mu(lp, m, l, m, 0, 1, chi)
            # First-order error is O(c^2) ~ 4e-4; mixing itself is O(c).
            assert abs(mu_t - mu_pt) < 8.0 * abs(c) ** 2, (l, m, lp)
            assert abs(mu_t) > 1e-3          # actually nonzero at O(c)


def test_mu_identity_at_zero_spin(q):
    """Spheroidal -> spherical at chi=0: mu = delta_{ll'} exactly."""
    for (l, m) in [(2, 2), (3, 2), (4, 4), (2, -1)]:
        for lp in range(max(2, abs(m)), max(2, abs(m)) + 4):
            mu = q.mu(lp, m, l, m, 0, 1, 0.0)
            expect = 1.0 if lp == l else 0.0
            assert abs(mu - expect) < 1e-10, (l, lp, m)
