"""Quadratic QNMs: the reference's quadratic_qnms.ipynb workflow.

Fits the (2,2,0)x(2,2,0) quadratic mode in h(4,4), applies the rational
filter, and recovers 2*omega_220 with a free-frequency fit -- on a
synthetic waveform built from the in-house spectrum tables.

Run:  python examples/quadratic_qnms.py
"""

import numpy as np

import qnmfits_tpu as qf

Mf, chif = 0.952, 0.692
times = np.arange(-20.0, 120.0, 0.1)
q = qf.qnm

# Build h(4,4): linear (4,4,n) ladder + the quadratic (2,2,0)^2 mode.
quad = (2, 2, 0, 1, 2, 2, 0, 1)
lin = [(4, 4, n, 1) for n in range(3)]
rng = np.random.default_rng(44)
amps = rng.standard_normal(4) + 1j * rng.standard_normal(4)
freqs = np.array(q.omega_list(lin + [quad], chif, Mf))
h44 = qf.ringdown(times, 0.0, amps, freqs)

# ---------------------------------------------------------------------------
# Fit with and without the quadratic mode
# ---------------------------------------------------------------------------
fit_lin = qf.ringdown_fit(times, h44, lin, Mf, chif, t0=0.0)
fit_full = qf.ringdown_fit(times, h44, lin + [quad], Mf, chif, t0=0.0)
print(f"linear-only mismatch:   {fit_lin['mismatch']:.3e}")
print(f"with (2,2,0)^2 mismatch: {fit_full['mismatch']:.3e}")
print(f"recovered quadratic amplitude: {fit_full['C'][-1]:.4f} "
      f"(true {amps[-1]:.4f})")

# ---------------------------------------------------------------------------
# Free-frequency recovery of 2*omega_220 (notebook cell 10 equivalent)
# ---------------------------------------------------------------------------
w_free = qf.free_frequency_fit(times, h44, t0=0.0, modes=lin,
                               Mf=Mf, chif=chif)
w_quad_true = freqs[-1]
print(f"free frequency: {w_free:.6f} vs 2*w220 = {w_quad_true:.6f} "
      f"(|err| {abs(w_free - w_quad_true):.2e})")

# ---------------------------------------------------------------------------
# Rational filter (Ma et al. 2022): remove the linear (4,4,0) content
# ---------------------------------------------------------------------------
t_u, h_filt = qf.rational_filter(times, h44, [(4, 4, 0, 1)], Mf, chif,
                                 t_start=-20.0)
print(f"rational filter: {len(t_u)} uniform samples, "
      f"|h| reduced {np.abs(h44).max() / np.abs(h_filt).max():.1f}x at peak")

# ---------------------------------------------------------------------------
# Spatial mapping of the quadratic mode (spatial_mapping_functions flow)
# ---------------------------------------------------------------------------
from qnmfits_tpu import spatial

data_dict = {}
for lm in [(4, 4), (5, 4)]:
    mu = np.array(q.mu_list([lm + m for m in lin], chif))
    h = qf.ringdown(times, 0.0, mu * amps[:3], freqs[:3])
    # quadratic content with a per-sphere pattern
    h = h + qf.ringdown(times, 0.0, [amps[3] * (1.0 if lm == (4, 4)
                                                else 0.3)], [freqs[3]])
    data_dict[lm] = h

out = spatial.mapping_multimode_ringdown_fit(
    times, data_dict, lin + [quad], Mf, chif, t0=0.0,
    mapping_modes=[quad], spherical_modes=[(4, 4), (5, 4)])
sm, arg, z = spatial.spatial_mismatch_quadratic(
    out, quad, l_max=8, chif=chif, Qmu=spatial.Qmu_A, s1=-2, s2=-2)
print(f"mapping fit mismatch: {out['mismatch']:.3e}; "
      f"spatial mismatch vs Qmu_A: {sm:.3f}")
