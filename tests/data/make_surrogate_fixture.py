"""Generate the checked-in surrogate-format waveform fixture.

VERDICT r4 item 7: the surrogate classes were exercised only under
ad-hoc mocks whose arrays were shaped by the test's own beliefs.  This
fixture records realistic gwsurrogate-FORMAT data (times + per-(l,m)
mode arrays + surfinBH-style remnant values) built from independent
sources, so the surrogate pipeline tests replay stored arrays instead
of inventing them:

* NRHybSur3dq8 section (aligned-spin, q=2): the surrogate returns only
  m >= 0 modes and omits (4,0) and (4,1) (reference
  Surrogate.py:330-340 fills m<0 by symmetry and zeroes (4,0)); the
  recorded dict mirrors that key layout exactly.
* NRSur7dq4 section (mildly precessing, q=1.5): all m modes present
  (no symmetry fill in the reference, Surrogate.py:111-126), remnant
  spin off-axis.
* Waveforms: PN-flavoured chirp + ringdown at Berti-Cardoso-Will 2006
  fit-formula frequencies (1-2% detuned from the true Kerr spectrum)
  -- NO numbers from this package's tables (same independence rule as
  make_sxs_fixture.py).
* Remnants: q=2 aligned -> (Mf, chif_z) ~ (0.9612, 0.6234) (standard
  nonspinning-NR-calibrated values); q=1.5 precessing -> off-axis chif.

Surrogate time convention: t=0 at the waveform peak, times from -2000
to +130 (gwsurrogate returns peak-anchored time arrays).

Run once to (re)create fixture_surrogate.npz; the file is committed.
"""

import numpy as np

# BCW 2006 Table VIII (f1, f2, f3, q1, q2, q3).
BCW = {
    (2, 2, 0): (1.5251, -1.1568, 0.1292, 0.7000, 1.4187, -0.4990),
    (2, 2, 1): (1.3673, -1.0260, 0.1628, 0.1000, 0.5436, -0.4731),
    (2, 1, 0): (0.6000, -0.2339, 0.4175, -0.3000, 2.3561, -0.2277),
    (3, 3, 0): (1.8956, -1.3043, 0.1818, 0.9000, 2.3430, -0.4810),
    (3, 2, 0): (1.1481, -0.5552, 0.3002, 0.8000, 2.2415, -0.3383),
    (4, 4, 0): (2.3000, -1.5056, 0.2244, 1.1929, 3.1191, -0.4825),
}


def bcw_omega(l, m, n, Mf, chif):
    f1, f2, f3, q1, q2, q3 = BCW[(l, m, n)]
    wr = f1 + f2 * (1.0 - chif) ** f3
    Q = q1 + q2 * (1.0 - chif) ** q3
    return (wr - 1j * wr / (2.0 * Q)) / Mf


def build_modes(times, keys, Mf, chif, amps, rng):
    """Chirp + BCW ringdown per mode, peak at t=0 (surrogate frames)."""
    t_c = 3.0                               # formal coalescence, t_peak=0
    s = 0.5 * (1.0 + np.tanh(times / 4.0))  # blend at the peak
    late = times >= 0.0
    h = {}
    for (l, m) in keys:
        a0, ring = amps[(l, m)]
        tau = np.clip(t_c - times, 1e-3, None)
        phi = -1.2 * tau ** (5.0 / 8.0)
        insp = a0 * tau ** (-0.25) * np.exp(-1j * m * phi)
        rd = np.zeros_like(times, complex)
        for (ll, mm, n), a in ring:
            w = bcw_omega(ll, mm, n, Mf, chif)
            rd[late] += a * np.exp(-1j * w * times[late])
        h[(l, m)] = (1 - s) * insp + s * rd
    peak = max(np.abs(v).max() for v in h.values())
    for k in h:
        h[k] = h[k] + 1e-6 * peak * (rng.standard_normal(len(times))
                                     + 1j * rng.standard_normal(len(times)))
    return h


def main():
    rng = np.random.default_rng(20260819)
    dt = 0.5
    times = np.arange(-2000.0, 130.0 + dt, dt)

    out = {"times": times}

    # ---- NRHybSur3dq8 section: q=2, aligned spins ----------------------
    q, chi1z, chi2z = 2.0, 0.2, -0.1
    Mf, chifz = 0.9612, 0.6234
    keys = [(2, 0), (2, 1), (2, 2), (3, 0), (3, 1), (3, 2), (3, 3),
            (4, 2), (4, 3), (4, 4), (5, 5)]
    amps = {
        (2, 2): (0.9, [((2, 2, 0), 0.95 * np.exp(0.4j)),
                       ((2, 2, 1), 2.3 * np.exp(-2.0j))]),
        (2, 1): (0.12, [((2, 1, 0), 0.11 * np.exp(1.1j))]),
        (2, 0): (0.02, []),
        (3, 0): (0.004, []),
        (3, 1): (0.01, []),
        (3, 2): (0.05, [((2, 2, 0), 0.068 * np.exp(0.35j)),
                        ((3, 2, 0), 0.035 * np.exp(2.2j))]),
        (3, 3): (0.22, [((3, 3, 0), 0.21 * np.exp(-0.7j))]),
        (4, 2): (0.008, []),
        (4, 3): (0.015, []),
        (4, 4): (0.06, [((4, 4, 0), 0.055 * np.exp(0.9j))]),
        (5, 5): (0.02, []),
    }
    h = build_modes(times, keys, Mf, chifz, amps, rng)
    out["hyb_q"] = q
    out["hyb_chi1"] = [0.0, 0.0, chi1z]
    out["hyb_chi2"] = [0.0, 0.0, chi2z]
    out["hyb_Mf"] = Mf
    out["hyb_Mf_err"] = 5e-5
    out["hyb_chif"] = [0.0, 0.0, chifz]
    out["hyb_chif_err"] = [1e-5, 1e-5, 8e-5]
    out["hyb_keys"] = np.array(keys)
    for (l, m) in keys:
        out[f"hyb_h_{l}_{m}"] = h[(l, m)]

    # ---- NRSur7dq4 section: q=1.5, mildly precessing -------------------
    q7, chi1, chi2 = 1.5, [0.1, 0.0, 0.3], [0.0, 0.0, 0.0]
    Mf7 = 0.9654
    chif7 = np.array([0.055, 0.018, 0.655])
    chif7_mag = float(np.linalg.norm(chif7))
    keys7 = [(l, m) for l in (2, 3, 4) for m in range(-l, l + 1)]
    amps7 = {}
    for (l, m) in keys7:
        if (l, abs(m)) == (2, 2):
            a = (0.85, [((2, 2, 0), 0.9 * np.exp(0.3j))])
        elif (l, abs(m)) == (2, 1):
            a = (0.13, [((2, 1, 0), 0.1 * np.exp(1.0j))])
        elif (l, abs(m)) == (3, 3):
            a = (0.2, [((3, 3, 0), 0.18 * np.exp(-0.6j))])
        elif (l, abs(m)) == (4, 4):
            a = (0.05, [((4, 4, 0), 0.05 * np.exp(0.8j))])
        else:
            a = (0.01 + 0.002 * abs(m), [])
        amps7[(l, m)] = a
    h7 = {}
    hpos = build_modes(times, [(l, m) for (l, m) in keys7 if m >= 0],
                       Mf7, chif7_mag, {k: amps7[k] for k in amps7
                                        if k[1] >= 0}, rng)
    for (l, m) in keys7:
        if m >= 0:
            h7[(l, m)] = hpos[(l, m)]
        else:
            # near-symmetric with a small precession-flavoured asymmetry
            base = (-1.0) ** l * np.conj(hpos[(l, -m)])
            h7[(l, m)] = base * (1.0 + 0.02 * np.exp(0.5j))
    out["sur_q"] = q7
    out["sur_chi1"] = chi1
    out["sur_chi2"] = chi2
    out["sur_f_ref"] = 0.01
    out["sur_Mf"] = Mf7
    out["sur_Mf_err"] = 8e-5
    out["sur_chif"] = chif7
    out["sur_chif_err"] = [2e-5, 2e-5, 9e-5]
    out["sur_keys"] = np.array(keys7)
    for (l, m) in keys7:
        out[f"sur_h_{l}_{m}"] = h7[(l, m)]

    from pathlib import Path
    path = Path(__file__).parent / "fixture_surrogate.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({path.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
