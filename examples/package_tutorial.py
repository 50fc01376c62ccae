"""Package tutorial: the reference's package_tutorial.ipynb workflow.

The reference notebook loads SXS:BBH:0305 and fits (2,2,n<=7) overtone
ladders; with no network access this script builds the equivalent
synthetic ringdown from the in-house spectrum tables (remnant matching
SXS:0305: Mf=0.952, chif=0.692).  Every API call mirrors the notebook's.

Run:  python examples/package_tutorial.py
"""

import numpy as np

import qnmfits_tpu as qf
from qnmfits_tpu.testing import synthetic_multimode

# ---------------------------------------------------------------------------
# "Load" a waveform (synthetic stand-in for SXS:BBH:0305)
# ---------------------------------------------------------------------------
Mf, chif = 0.952, 0.692
modes = [(2, 2, n, 1) for n in range(8)]
syn = synthetic_multimode(modes=modes, spherical_modes=[(2, 2), (3, 2)],
                          Mf=Mf, chif=chif,
                          times=np.arange(-50.0, 150.0, 0.1), seed=305)
times = syn["times"]
h22 = syn["data_dict"][(2, 2)]

# Wrap in the Custom waveform container (fluxes, remnant evolution, ...).
# Custom expects every (l, m) up to ellMax, like catalog data.
full_dict = {(l, m): np.zeros(len(times), complex)
             for l in (2, 3) for m in range(-l, l + 1)}
full_dict.update(syn["data_dict"])
wf = qf.Custom(times.copy(), full_dict,
               {"remnant_mass": Mf,
                "remnant_dimensionless_spin": [0, 0, chif]})
print(f"waveform: ellMax={wf.ellMax}, Mf={wf.Mf}, chif={wf.chif_mag}")

# ---------------------------------------------------------------------------
# Single-mode fit at t0 = 0 (notebook cell 9 equivalent)
# ---------------------------------------------------------------------------
best_fit = qf.ringdown_fit(times, h22, modes, Mf, chif, t0=0.0, T=100)
print(f"(2,2,n<=7) fit mismatch: {best_fit['mismatch']:.3e}")
print("|C_n|:", np.abs(best_fit["C"]).round(4))

# ---------------------------------------------------------------------------
# Mismatch vs start time -- one batched TPU program, not a Python loop
# ---------------------------------------------------------------------------
t0_array = np.linspace(-10.0, 60.0, 200)
mm = qf.mismatch_t0_array(times, h22, modes, Mf, chif, t0_array)
print(f"mismatch(t0) sweep: min={np.min(mm):.3e} at "
      f"t0={t0_array[np.argmin(mm)]:.1f}")

# ---------------------------------------------------------------------------
# Remnant recovery (notebook cell 14 equivalent): gradient L-BFGS on the
# differentiable mismatch (Nelder-Mead also available for parity)
# ---------------------------------------------------------------------------
eps, Mf_bf, chif_bf = qf.calculate_epsilon(
    times, h22, modes, Mf, chif, t0=0.0, x0=[0.97, 0.65])
print(f"epsilon={eps:.3e}, Mf*={Mf_bf:.6f}, chif*={chif_bf:.6f}")

# ---------------------------------------------------------------------------
# Multimode fit across spherical modes (notebook cell 16 equivalent)
# ---------------------------------------------------------------------------
mm_modes = [(l, 2, n, 1) for l in (2, 3) for n in range(8)]
best_mm = qf.multimode_ringdown_fit(
    times, syn["data_dict"], mm_modes, Mf, chif, t0=0.0,
    spherical_modes=[(2, 2), (3, 2)])
print(f"multimode fit mismatch: {best_mm['mismatch']:.3e}")

# ---------------------------------------------------------------------------
# (Mf, chif) grid -- batched
# ---------------------------------------------------------------------------
grid = qf.mismatch_M_chi_grid(times, h22, modes, (0.92, 0.98),
                              (0.64, 0.74), t0=0.0, res=20)
i, j = np.unravel_index(np.argmin(grid), grid.shape)
print(f"grid minimum at Mf~{np.linspace(0.92, 0.98, 20)[i]:.4f}, "
      f"chif~{np.linspace(0.64, 0.74, 20)[j]:.4f}")
