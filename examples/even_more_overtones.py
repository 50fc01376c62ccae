"""Deep overtone ladders: the reference's even_more_overtones.ipynb.

Fits (2,2,n<=N) ladders for N up to 14 -- through the n=8,9 multiplet
branches (Cook & Zalutskiy data in the reference, computed by the
in-house solver here) -- over 200 ringdown start times, as batched TPU
programs.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/even_more_overtones.py
"""

import numpy as np

import qnmfits_tpu as qf
from qnmfits_tpu.batched import batch_mismatch_t0_fast

Mf, chif = 0.952, 0.692
times = np.arange(-50.0, 150.0, 0.1)

# Synthetic ringdown containing the full n<=11 ladder (incl. multiplets).
modes_all = [(2, 2, n, 1) for n in range(15)]
freqs = np.array(qf.qnm.omega_list(modes_all, chif, Mf))
rng = np.random.default_rng(8)
amps = (rng.standard_normal(15) + 1j * rng.standard_normal(15)) \
    * 10.0 ** np.linspace(0, 1.5, 15)   # overtones dominate early times
h22 = qf.ringdown(times, 0.0, amps, freqs)

t0_array = np.linspace(-20.0, 40.0, 200)
print("N_max  min-mismatch  best-t0")
for nmax in (0, 2, 4, 7, 9, 11, 14):
    modes = [(2, 2, n, 1) for n in range(nmax + 1)]
    mm = batch_mismatch_t0_fast(times, h22, modes, Mf, chif, t0_array)
    k = int(np.argmin(mm))
    print(f"{nmax:5d}  {mm[k]:.3e}     {t0_array[k]:+.1f}")

# Multiplet frequencies for reference
for n in (8, 9):
    print(f"omega(2,2,{n}) at chif={chif}: "
          f"{qf.qnm.omega(2, 2, n, 1, chif, Mf):.6f}")
