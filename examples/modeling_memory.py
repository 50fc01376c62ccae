"""Modeling memory: the reference's modeling_memory.ipynb equivalent.

The memory-bearing h20 mode of a superrest-frame CCE waveform relaxes to
its final offset through ringdown content that is symmetric under
m -> -m: the (2,0,0,+1)/(2,0,0,-1) mirror pair plus the MIRROR quadratic
(2,2,0,+1) x (2,-2,0,-1), whose frequency

    omega = omega_220 + (-conj(omega_220)) = 2i Im(omega_220)

has zero real part -- a non-oscillating, exponentially decaying term
(reference cells 4-5).  The SXS:BBH_ExtCCE_superrest:0305 pickle the
notebook loads is unavailable in this air-gapped environment, so the
waveform here is synthesised from those exact ingredients (plus mirror
overtones and noise); every fit/recovery step of the notebook follows
(cells 5-12): mirror-pair fit, mirror-quadratic improvement, overtone
ladder comparison, and the free-frequency recovery of the mirror
quadratic -- run as ONE vmapped optimiser dispatch over all start times.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/modeling_memory.py
"""

import numpy as np

import qnmfits_tpu as qf

Mf, chif = 0.952, 0.692
times = np.arange(-30.0, 150.0, 0.1)

# --- Synthetic memory-flavoured h20 (replaces notebook cells 1-3) ------
pair = [(2, 0, 0, 1), (2, 0, 0, -1)]
mirror_quad = (2, 2, 0, 1, 2, -2, 0, -1)
overtones = [(2, 0, n, 1) for n in range(1, 4)] \
    + [(2, 0, n, -1) for n in range(1, 4)]

content = pair + [mirror_quad] + overtones
freqs = np.array(qf.qnm.omega_list(content, chif, Mf))
print(f"mirror quadratic frequency: {freqs[2]:.6f} (Re = "
      f"{freqs[2].real:.1e} -- zero real part by mirror symmetry)")

rng = np.random.default_rng(20)
amps = np.array([0.8 + 0.1j, 0.75 - 0.12j, 0.35 + 0.0j]
                + list(0.1 * (rng.standard_normal(6)
                              + 1j * rng.standard_normal(6))))
h20 = qf.ringdown(times, 0.0, amps, freqs)
h20 = h20 + 2e-7 * (rng.standard_normal(len(times))
                    + 1j * rng.standard_normal(len(times)))

# --- Fits (notebook cells 5, 7, 12) ------------------------------------
mode_dict = {
    "(2,0,0,+-) only": pair,
    "(2,0,0,+-) + (2,2,0,1)x(2,-2,0,-1)": pair + [mirror_quad],
    "(2,0,n<=7,+-)": [(2, 0, n, 1) for n in range(8)]
                     + [(2, 0, n, -1) for n in range(8)],
}
t0_array = np.linspace(-5.0, 60.0, 100)
print("\nmin mismatch over start times (cell-12 comparison):")
for label, modes in mode_dict.items():
    mm = qf.mismatch_t0_array(times, h20, modes, Mf, chif, t0_array)
    print(f"  {label:38s} min M = {np.min(mm):.3e}")

best = qf.ringdown_fit(times, h20, pair + [mirror_quad], Mf, chif, t0=10)
print(f"\nmirror-pair + quadratic fit at t0=10: M = "
      f"{best['mismatch']:.3e}")
# At t0=10 the unmodelled overtones still bias the amplitudes (as with
# the notebook's real data); by t0=30 they have decayed away.  Fit
# amplitudes are referenced to t0 -- translate back to t=0 (divide by
# exp(-i omega t0)) to compare with the injection.
late = qf.ringdown_fit(times, h20, pair + [mirror_quad], Mf, chif, t0=30)
A_rec = late["C"][2] * np.exp(1j * freqs[2] * 30.0)
print(f"recovered quadratic amplitude (t0=30, translated to t=0): "
      f"{A_rec:.4f} (injected {amps[2]:.4f})")

# --- Free-frequency recovery of the mirror quadratic (cells 9-11) ------
omega_target = (qf.qnm.omega(2, 2, 0, 1, chif, Mf)
                + qf.qnm.omega(2, -2, 0, -1, chif, Mf))
t0_list = np.linspace(0.0, 20.0, 50)
# The notebook loops free_frequency_fit over 50 start times; here the
# whole axis is one vmapped optimiser program.
omega_fit = qf.free_frequency_fit_array(
    times, h20, t0_list, modes=pair, Mf=Mf, chif=chif)

i_delta = (omega_fit.imag - omega_target.imag) / omega_target.imag
k = np.argmin(np.abs(omega_fit - omega_target))
print(f"\nfree-frequency recovery of the mirror quadratic "
      f"(target {omega_target:.6f}):")
print(f"  best over t0: omega = {omega_fit[k]:.6f} at t0 = "
      f"{t0_list[k]:.1f} (|err| {abs(omega_fit[k]-omega_target):.2e})")
print(f"  imaginary-part deviation across t0: min {np.min(np.abs(i_delta)):.1e}"
      f", median {np.median(np.abs(i_delta)):.1e}")

# --- Remnant grid with/without the quadratic (cells 13-14) -------------
mm_grid = qf.mismatch_M_chi_grid(
    times, h20, pair + [mirror_quad], (Mf - 0.1, Mf + 0.1), (0.0, 0.99),
    t0=10, res=25)
i, j = np.unravel_index(np.argmin(mm_grid), mm_grid.shape)
Mf_g = np.linspace(Mf - 0.1, Mf + 0.1, 25)[i]
chif_g = np.linspace(0.0, 0.99, 25)[j]
print(f"\n(Mf, chif) grid minimum at ({Mf_g:.3f}, {chif_g:.3f}) "
      f"[true ({Mf}, {chif})]")
