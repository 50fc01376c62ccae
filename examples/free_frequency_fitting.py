"""Free-frequency fitting: the reference's free_frequency_fitting.ipynb.

Recovers omega_220 as a free complex frequency as a function of ringdown
start time, with the gradient (L-BFGS on the differentiable mismatch)
optimiser.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/free_frequency_fitting.py
"""

import numpy as np

import qnmfits_tpu as qf

Mf, chif = 0.952, 0.692
times = np.arange(-20.0, 120.0, 0.1)
modes = [(2, 2, n, 1) for n in range(4)]
freqs = np.array(qf.qnm.omega_list(modes, chif, Mf))
rng = np.random.default_rng(5)
amps = rng.standard_normal(4) + 1j * rng.standard_normal(4)
h22 = qf.ringdown(times, 0.0, amps, freqs)
w220 = freqs[0]

print("t0    omega_free                |err vs omega_220|")
for t0 in (0.0, 5.0, 10.0, 20.0, 30.0):
    w = qf.free_frequency_fit(times, h22, t0=t0)
    print(f"{t0:4.0f}  {w:.6f}   {abs(w - w220):.2e}")
# At late start times the overtones have decayed and the free frequency
# converges to omega_220.
