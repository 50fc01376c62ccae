"""Rational-filter tests: QNM removal round trip, parity, realignment.

Pins the Ma et al. (arXiv:2207.10870) filter semantics of reference
qnmfits.py:2046-2152 -- the accumulated phase/time-shift bookkeeping is
exactly the kind of code that drifts silently without a behavioural
test.
"""

import numpy as np
import pytest

from qnmfits_tpu import rational_filter, ref_impl
from qnmfits_tpu.ref_impl import ringdown, ringdown_fit


@pytest.fixture(scope="module")
def two_mode_signal():
    """(2,2,0) + (2,2,1) ringdown starting at t=0, zero before."""
    from qnmfits_tpu.qnm_api import qnm
    q = qnm()
    Mf, chif = 0.952, 0.692
    w0 = q.omega(2, 2, 0, 1, chif, Mf)
    w1 = q.omega(2, 2, 1, 1, chif, Mf)
    times = np.arange(-300.0, 150.0, 0.1)
    C = [0.8 * np.exp(0.3j), 2.1 * np.exp(-1.1j)]
    data = ringdown(times, 0.0, C, [w0, w1])
    return dict(times=times, data=data, Mf=Mf, chif=chif, w=[w0, w1], C=C)


def test_filter_removes_target_mode(two_mode_signal):
    """Filtering (2,2,0) must collapse the refit (2,2,0) amplitude by
    orders of magnitude while the data keeps O(1) power from (2,2,1)."""
    s = two_mode_signal
    t_u, d_f = rational_filter(
        s["times"], s["data"], [(2, 2, 0, 1)], s["Mf"], s["chif"],
        t_start=-300.0, align_inspiral=False)

    # Joint fit separates the two modes; after filtering (2,2,0) its
    # amplitude must collapse while the (surviving, all-pass-rescaled)
    # (2,2,1) stays O(1).
    modes2 = [(2, 2, 0, 1), (2, 2, 1, 1)]
    before = ringdown_fit(s["times"], s["data"], modes2,
                          s["Mf"], s["chif"], t0=10.0, T=80.0)
    after = ringdown_fit(t_u, d_f, modes2,
                         s["Mf"], s["chif"], t0=10.0, T=80.0)
    drop = abs(after["C"][0]) / abs(before["C"][0])
    assert drop < 1e-4, f"(2,2,0) amplitude only dropped by {1/drop:.1f}x"
    assert abs(after["C"][1]) > 0.3 * abs(before["C"][1])


def test_filter_all_modes_kills_ringdown(two_mode_signal):
    """Filtering every injected mode leaves ~zero late-time power."""
    s = two_mode_signal
    t_u, d_f = rational_filter(
        s["times"], s["data"], [(2, 2, 0, 1), (2, 2, 1, 1)],
        s["Mf"], s["chif"], t_start=-300.0, align_inspiral=False)
    late = t_u >= 20.0
    power_before = np.max(np.abs(s["data"][s["times"] >= 20.0]))
    power_after = np.max(np.abs(d_f[late]))
    assert power_after < 1e-3 * power_before


def test_jax_matches_numpy(two_mode_signal):
    s = two_mode_signal
    args = (s["times"], s["data"], [(2, 2, 0, 1), (2, 2, 1, 1)],
            s["Mf"], s["chif"])
    for align in (True, False):
        t_j, d_j = rational_filter(*args, align_inspiral=align,
                                   engine="jax")
        t_n, d_n = ref_impl.rational_filter(*args, align_inspiral=align)
        np.testing.assert_allclose(t_j, t_n, atol=0)
        np.testing.assert_allclose(d_j, d_n, rtol=0, atol=1e-12)


def test_inspiral_realignment_shifts_early_signal(two_mode_signal):
    """align_inspiral applies exp(-i(2 pi f t_shift + phase)): the output
    must equal the unaligned output advanced by the accumulated time
    shift and rotated by the accumulated phase."""
    s = two_mode_signal
    modes = [(2, 2, 0, 1)]
    t_u, d_al = rational_filter(s["times"], s["data"], modes, s["Mf"],
                                s["chif"], align_inspiral=True)
    _, d_un = rational_filter(s["times"], s["data"], modes, s["Mf"],
                              s["chif"], align_inspiral=False)
    w = s["w"][0]
    t_shift = abs(2 * w.imag / np.conj(w) ** 2)
    phase = np.angle(w / np.conj(w))
    # d_al(t) = e^{-i phase} d_un(t - t_shift) up to the difference
    # between the exact band-limited circular shift and cubic
    # interpolation (broadband content from the t=0 ringdown onset sets
    # a ~1e-3 Gibbs floor).  The WRONG shift direction is 17x worse --
    # that is the sign/bookkeeping regression this test pins.
    from scipy.interpolate import interp1d

    sel = (t_u > t_u[0] + 120) & (t_u < -50)

    def shifted(delta):
        re = interp1d(t_u, d_un.real, kind="cubic",
                      fill_value="extrapolate")(t_u[sel] + delta)
        im = interp1d(t_u, d_un.imag, kind="cubic",
                      fill_value="extrapolate")(t_u[sel] + delta)
        return (re + 1j * im) * np.exp(-1j * phase)

    err_correct = np.max(np.abs(d_al[sel] - shifted(-t_shift)))
    err_flipped = np.max(np.abs(d_al[sel] - shifted(+t_shift)))
    scale = np.max(np.abs(d_al[sel]))
    assert err_correct < 0.05 * scale
    assert err_correct < 0.15 * err_flipped
