"""Catalog-population fitting: many events, one program.

A population study fits the same ringdown model to EVERY event in a
catalog, each event with its own remnant (Mf_e, chif_e) and analysis
start t0_e.  The reference runs one Python `ringdown_fit` call per event
(qnmfits.py:142-315); here the whole catalog is one chunked jitted
program (`qf.fit_events`) with per-event spectrum evaluation -- add
mesh='auto' to shard the event axis over every available chip.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/catalog_events.py
"""

import time

import numpy as np

import qnmfits_tpu as qf

rng = np.random.default_rng(42)
times = np.arange(-5.0, 95.0, 0.1)
modes = [(2, 2, n, 1) for n in range(4)]

# --- Synthesize a catalog: E events with scattered remnants ------------
E = 512
Mfs = rng.uniform(0.90, 0.99, E)
chifs = rng.uniform(0.45, 0.85, E)
t0s = rng.uniform(0.0, 6.0, E)
rows = np.empty((E, len(times)), complex)
true_amp = np.empty(E, complex)
for e in range(E):
    freqs = np.array(qf.qnm.omega_list(modes, chifs[e], Mfs[e]))
    amps = (rng.standard_normal(4) + 1j * rng.standard_normal(4)) \
        * np.array([1.0, 0.5, 0.2, 0.1])
    true_amp[e] = amps[0]
    rows[e] = qf.ringdown(times, 0.0, amps, freqs)
rows += 2e-5 * (rng.standard_normal(rows.shape)
                + 1j * rng.standard_normal(rows.shape))

# --- The whole catalog in one program ----------------------------------
t = time.perf_counter()
mm, C = qf.fit_events(times, rows, modes, Mfs, chifs, t0s, T=80.0)
dt = time.perf_counter() - t

# Translate fit amplitudes (referenced to t0_e) back to t=0 per event.
w220 = np.array([qf.qnm.omega(2, 2, 0, 1, chifs[e], Mfs[e])
                 for e in range(E)])
A0 = C[:, 0] * np.exp(1j * w220 * t0s)
amp_err = np.abs(A0 - true_amp) / np.abs(true_amp)

print(f"{E} events fit in {dt:.2f}s ({E/dt:,.0f} events/s, "
      f"one chunked program)")
print(f"mismatch: median {np.median(mm):.2e}, worst {np.max(mm):.2e}")
print(f"fundamental amplitude recovery: median rel err "
      f"{np.median(amp_err):.2e}, worst {np.max(amp_err):.2e}")
