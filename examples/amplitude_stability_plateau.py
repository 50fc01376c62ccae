"""Amplitude stability: the Giesler+ (arXiv:1903.08284, fig. 6) plateau.

Physically present QNM amplitudes, rephased to a common reference time
A = C * exp(i*omega*(t0 - t_ref)), are CONSTANT over a start-time sweep;
spurious modes wander by orders of magnitude.  `amplitude_stability`
(beyond-reference, see README) runs the sweep on the dedup'd batched t0
kernels and reports per-mode plateau statistics; this example injects a
three-overtone ringdown plus noise, fits a five-overtone model, and
shows the injected modes plateau while the absent ones drift.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/amplitude_stability_plateau.py
"""

import numpy as np

import qnmfits_tpu as qf
from qnmfits_tpu.testing import synthetic_single

NOISE = 1e-5

inj_modes = [(2, 2, n, 1) for n in range(3)]
inj_amps = [1.0, 2.0, 4.0]
syn = synthetic_single(modes=inj_modes, amplitudes=inj_amps,
                       noise=NOISE, seed=7)
model_modes = [(2, 2, n, 1) for n in range(5)]     # two absent overtones

# Sweep while every injected overtone is still above the noise floor:
# rephasing amplifies noise by e^{|Im w| t0}, so a plateau is only
# measurable out to t0 ~ tau_j * ln(|A_j|/noise).
t0s = np.linspace(0.0, 10.0, 81)
out = qf.amplitude_stability(
    syn["times"], syn["data"], model_modes, syn["Mf"], syn["chif"],
    t0s, t_ref=0.0, T_array=100.0)
assert all(out["rel_std"][:3] < 0.1) and all(out["rel_std"][3:] > 0.5)

print(f"{'mode':>12s} {'|mean A|':>10s} {'rel_std':>9s} "
      f"{'phase_std':>10s}  verdict")
for j, m in enumerate(model_modes):
    inj = "injected" if m in inj_modes else "absent"
    stable = "PLATEAU" if out["rel_std"][j] < 0.1 else "unstable"
    print(f"{str(m):>12s} {abs(out['mean_A'][j]):10.4f} "
          f"{out['rel_std'][j]:9.3f} {out['phase_std'][j]:10.3f}  "
          f"{inj}: {stable}")

# The rephased injected amplitudes should sit on their true values.
for j, (m, a) in enumerate(zip(inj_modes, inj_amps)):
    err = abs(abs(out["mean_A"][j]) - a) / a
    print(f"  {m}: |mean A| vs injected -> rel err {err:.2e}")

# The standard plateau plot (written next to this script).
import pathlib

outfile = pathlib.Path(__file__).with_suffix(".png")
qf.plot_amplitude_stability(out, truth=np.pad(inj_amps, (0, 2)),
                            xlim=(0, 10), outfile=str(outfile))
print(f"\nplateau plot -> {outfile}")
