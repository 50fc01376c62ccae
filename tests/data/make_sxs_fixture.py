"""Generate the checked-in realistic BBH waveform fixture.

The fixture deliberately contains NO numbers from this package's QNM
tables -- it is built from independent sources so that fitting it with
the package exercises real model/data disagreement:

* inspiral: leading-order PN-flavoured chirp, amplitude (t_c - t)^{-1/4},
  orbital phase ~ (t_c - t)^{5/8};
* ringdown: damped sinusoids at frequencies from the Berti-Cardoso-Will
  2006 (PRD 73, 064030) FIT FORMULAE at (Mf, chif) = (0.952, 0.692) --
  about 1-2% detuned from the true Kerr spectrum, like real NR data
  fitted with a slightly-wrong remnant;
* Gaussian noise at 1e-6 of peak.

Run once to (re)create fixture_bbh_waveform.npz; the file is committed.
"""

import numpy as np

MF, CHIF = 0.952, 0.692

# BCW 2006 Table VIII (f1, f2, f3, q1, q2, q3).
BCW = {
    (2, 2, 0): (1.5251, -1.1568, 0.1292, 0.7000, 1.4187, -0.4990),
    (2, 2, 1): (1.3673, -1.0260, 0.1628, 0.1000, 0.5436, -0.4731),
    (2, 1, 0): (0.6000, -0.2339, 0.4175, -0.3000, 2.3561, -0.2277),
    (3, 3, 0): (1.8956, -1.3043, 0.1818, 0.9000, 2.3430, -0.4810),
}


def bcw_omega(l, m, n, Mf=MF, chif=CHIF):
    f1, f2, f3, q1, q2, q3 = BCW[(l, m, n)]
    wr = f1 + f2 * (1.0 - chif) ** f3
    Q = q1 + q2 * (1.0 - chif) ** q3
    return (wr - 1j * wr / (2.0 * Q)) / Mf


def main():
    rng = np.random.default_rng(20260816)
    dt = 0.1
    times = np.arange(0.0, 500.0 + dt, dt)
    t_peak = 400.0
    t_c = t_peak + 3.0                     # formal PN coalescence time

    def chirp(m_azim, amp0):
        """PN-flavoured inspiral for azimuthal number m (phase m*phi)."""
        tau = np.clip(t_c - times, 1e-3, None)
        phi = -1.2 * tau ** (5.0 / 8.0)
        amp = amp0 * tau ** (-0.25)
        return amp * np.exp(-1j * m_azim * phi)

    def ringdown(omegas, amps):
        h = np.zeros_like(times, complex)
        late = times >= t_peak
        for w, a in zip(omegas, amps):
            h[late] += a * np.exp(-1j * w * (times[late] - t_peak))
        return h

    # Smooth blend inspiral -> ringdown over ~10M around the peak.
    s = 0.5 * (1.0 + np.tanh((times - t_peak) / 4.0))

    h = {}
    h[(2, 2)] = (1 - s) * chirp(2, 0.9) + s * ringdown(
        [bcw_omega(2, 2, 0), bcw_omega(2, 2, 1)],
        [0.95 * np.exp(0.4j), 2.3 * np.exp(-2.0j)])
    h[(2, 1)] = (1 - s) * chirp(1, 0.12) + s * ringdown(
        [bcw_omega(2, 1, 0)], [0.11 * np.exp(1.1j)])
    h[(3, 3)] = (1 - s) * chirp(3, 0.22) + s * ringdown(
        [bcw_omega(3, 3, 0)], [0.21 * np.exp(-0.7j)])
    # (3,2): dominated by the (2,2,0) line leaking through spherical-
    # spheroidal mixing (amplitude ~7% of h22), plus a weak intrinsic
    # mode at a plausible (NOT table) frequency.
    h[(3, 2)] = (1 - s) * chirp(2, 0.05) + s * ringdown(
        [bcw_omega(2, 2, 0), (1.08 - 0.097j) / MF],
        [0.068 * np.exp(0.35j), 0.035 * np.exp(2.2j)])

    # m < 0 modes by the aligned-spin symmetry h_{l,-m} = (-1)^l conj.
    for (l, m) in list(h):
        h[(l, -m)] = (-1.0) ** l * np.conj(h[(l, m)])

    peak = np.abs(h[(2, 2)]).max()
    out = {"times": times, "Mf": MF, "chif": CHIF, "t_peak": t_peak}
    for (l, m), series in h.items():
        series = series + 1e-6 * peak * (
            rng.standard_normal(len(times))
            + 1j * rng.standard_normal(len(times)))
        out[f"h_{l}_{m}"] = series

    from pathlib import Path
    path = Path(__file__).parent / "fixture_bbh_waveform.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({path.stat().st_size/1e3:.0f} kB)")


if __name__ == "__main__":
    main()
