"""Amplitude error bars: which overtones are actually resolved?

A noisy synthetic ringdown containing three overtones is fit with a
five-overtone model; `amplitude_uncertainty` (beyond-reference, see
README) reports per-mode 1-sigma error bars, SNRs, and the mode-mode
correlation matrix -- the injected modes come out with SNR >> 1, the
absent ones consistent with zero, and the correlation matrix shows the
early-time overtone degeneracy that makes raw amplitudes unstable.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/amplitude_uncertainty.py
"""

import numpy as np

import qnmfits_tpu as qf
from qnmfits_tpu.testing import synthetic_single

NOISE = 1e-3                      # per quadrature component

inj_modes = [(2, 2, n, 1) for n in range(3)]
syn = synthetic_single(modes=inj_modes, amplitudes=[1.0, 2.0, 4.0],
                       noise=NOISE, seed=21)
model_modes = [(2, 2, n, 1) for n in range(5)]    # two absent overtones

out = qf.amplitude_uncertainty(
    syn["times"], syn["data"], model_modes, syn["Mf"], syn["chif"],
    t0=0.0, T=100.0)

print(f"estimated noise sigma^2 = {out['sigma2']:.3e} "
      f"(true {2*NOISE**2:.3e}); n_obs={out['n_obs']} dof={out['dof']}")
print(f"{'mode':>12s} {'|C|':>9s} {'sigma_C':>9s} {'SNR':>8s}  verdict")
for j, m in enumerate(model_modes):
    inj = "injected" if m in inj_modes else "absent"
    sig = "RESOLVED" if out["snr"][j] > 5 else "consistent with 0"
    print(f"{str(m):>12s} {abs(out['C'][j]):9.4f} "
          f"{out['sigma_C'][j]:9.4f} {out['snr'][j]:8.1f}  {inj}: {sig}")

print("\n|corr| (overtone trade-offs on this window):")
with np.printoptions(precision=2, suppress=True):
    print(np.abs(out["corr"]))

# Cross-check with the orthonormal diagnostics: the cumulative
# explained power should saturate at the injected mode count.
orth = qf.orthonormal_decomposition(
    syn["times"], syn["data"], model_modes, syn["Mf"], syn["chif"],
    t0=0.0, T=100.0)
with np.printoptions(precision=6, suppress=True):
    print("\ncumulative explained power:", orth["cumulative_explained"])

# Formal model-order selection over the ladder: BIC should pick the
# injected 3-overtone model, and the F-test p-values should collapse
# exactly when the added overtone is real.
sel = qf.mode_selection(
    syn["times"], syn["data"],
    [[(2, 2, n, 1) for n in range(j + 1)] for j in range(6)],
    syn["Mf"], syn["chif"], t0=0.0, T=100.0)
print(f"\nmodel order by BIC: n<={sel['best_bic']} "
      f"(injected n<=2)")
print(f"{'model':>8s} {'RSS':>10s} {'dBIC':>8s} {'F-test p':>10s}")
for j in range(6):
    p = "" if j == 0 else f"{sel['pvalue'][j-1]:10.2e}"
    print(f"  n<={j:2d} {sel['rss'][j]:10.3e} "
          f"{sel['delta_bic'][j]:8.1f} {p:>10s}")
