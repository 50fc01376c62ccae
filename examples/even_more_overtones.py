"""Deep overtone ladders: the reference's even_more_overtones.ipynb.

Fits (2,2,n<N) ladders for N = 1..21 -- the reference's full envelope
(`mode_list = [[(2,2,n,1) for n in range(N)] for N in range(1,22)]`,
/root/reference/examples/even_more_overtones.ipynb cells 3-4) -- through
the n=8,9 multiplet branches (Cook & Zalutskiy data in the reference,
computed by the in-house solver here) over 200 ringdown start times,
as batched TPU programs.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/even_more_overtones.py
"""

import numpy as np

import qnmfits_tpu as qf

Mf, chif = 0.952, 0.692
times = np.arange(-50.0, 150.0, 0.1)

# Synthetic ringdown containing the full n<=20 ladder (incl. multiplets).
N_TOP = 21
modes_all = [(2, 2, n, 1) for n in range(N_TOP)]
freqs = np.array(qf.qnm.omega_list(modes_all, chif, Mf))
rng = np.random.default_rng(8)
amps = (rng.standard_normal(N_TOP) + 1j * rng.standard_normal(N_TOP)) \
    * 10.0 ** np.linspace(0, 1.5, N_TOP)   # overtones dominate early times
h22 = qf.ringdown(times, 0.0, amps, freqs)

t0_array = np.linspace(-20.0, 40.0, 200)

# All 21 ladders x 200 start times = 4200 multimode fits in ONE jitted
# mode-set sweep (the reference runs this as a doubly nested Python
# loop; a single ladder can also be swept with batch_mismatch_t0_fast).
mode_sets = [[(2, 2, n, 1) for n in range(N)] for N in range(1, N_TOP + 1)]
mm_all = qf.mismatch_t0_mode_sets(times, h22, mode_sets, Mf, chif,
                                  t0_array)
print("N_max  min-mismatch  best-t0")
for N, mm in zip(range(1, N_TOP + 1), mm_all):
    k = int(np.argmin(mm))
    print(f"{N - 1:5d}  {mm[k]:.3e}     {t0_array[k]:+.1f}")

# Multiplet frequencies for reference
for n in (8, 9):
    print(f"omega(2,2,{n}) at chif={chif}: "
          f"{qf.qnm.omega(2, 2, n, 1, chif, Mf):.6f}")

# Remnant recovery over the ladder envelope (reference: calculate_epsilon
# for each N<=20 ladder, even_more_overtones.ipynb).  t0=10 for shallow
# ladders (the injected deep overtones, up to 30x the fundamental, have
# decayed there so the truncated model is faithful); the full ladder
# fits from t0=0.
print("epsilon(N):")
for N, t0 in ((4, 10.0), (8, 10.0), (14, 0.0), (21, 0.0)):
    eps, Mf_b, chif_b = qf.calculate_epsilon(
        times, h22, [(2, 2, n, 1) for n in range(N)], Mf, chif, t0=t0)
    print(f"  N={N:2d} t0={t0:4.1f}: eps={eps:.3e} "
          f"(Mf*={Mf_b:.6f}, chif*={chif_b:.6f})")

# How many overtones MATTER?  The orthonormal-mode significance curve
# (qf.orthonormal_decomposition, arXiv:2507.12376-style): additive
# per-mode explained power in the window inner product.
out = qf.orthonormal_decomposition(times, h22, modes_all[:10], Mf, chif,
                                   t0=0.0)
print("orthonormal overtone significance (t0=0):")
for n, (p, c) in enumerate(zip(out["power"] / out["data_norm"],
                               out["cumulative_explained"])):
    print(f"  n={n}: marginal {p:.2e}  cumulative {c:.10f}")

# Formal model order on noisy data (qf.mode_selection): at noise 1e-4
# the deep end of the ladder (injected ~30x the fundamental but decayed
# by t0=10) stops being statistically resolvable -- BIC reports the
# supported order rather than the injected one.
noisy = h22 + 1e-4 * (rng.standard_normal(times.size)
                      + 1j * rng.standard_normal(times.size))
sel = qf.mode_selection(times, noisy, mode_sets[:12], Mf, chif, t0=10.0)
nonsig = np.flatnonzero(sel["pvalue"] > 0.01)
verdict = (f"first non-significant added overtone n={nonsig[0] + 1}"
           if nonsig.size else "every addition significant")
print(f"BIC-supported ladder depth at t0=10, noise 1e-4: "
      f"n<={sel['best_bic']} of n<=11 tried ({verdict})")

# Are the fitted overtones PHYSICAL or overfit?  The amplitude-stability
# criterion (qf.amplitude_stability, Giesler+ arXiv:1903.08284 fig. 6):
# rephased to t_ref=0, a mode truly in the data fits to a constant
# amplitude across start times; a spurious one wanders.  Here the
# injected n<=4 ladder is rock-stable under noise while an appended
# n=8 overtone (absent from this data) scatters by orders.
h5 = qf.ringdown(times, 0.0, amps[:5], freqs[:5]) + 1e-6 * (
    rng.standard_normal(times.size) + 1j * rng.standard_normal(times.size))
stab = qf.amplitude_stability(
    times, h5, [(2, 2, n, 1) for n in range(5)] + [(2, 2, 8, 1)],
    Mf, chif, np.linspace(0.0, 12.0, 49), t_ref=0.0)
print("amplitude stability at t_ref=0 (rel_std; injected n<=4 + n=8):")
for m, rs, sc in zip(stab["modes"], stab["rel_std"], stab["scatter"]):
    tag = "injected" if m[2] < 5 else "ABSENT"
    print(f"  n={m[2]}: rel_std {rs:.2e}  scatter {sc:.2e}  [{tag}]")

# Beyond the reference's reach: the SAME study on the (3,3) harmonic.
# Cook data (and therefore the reference) stops at n<=7; the baked
# tables carry the l=3/4 ladders to n<=14 (scripts/extend_overtones.py),
# so higher-harmonic overtone envelopes run through the identical sweep.
N33 = 15
modes33 = [(3, 3, n, 1) for n in range(N33)]
freqs33 = np.array(qf.qnm.omega_list(modes33, chif, Mf))
amps33 = (rng.standard_normal(N33) + 1j * rng.standard_normal(N33)) \
    * 10.0 ** np.linspace(0, 1.2, N33)
h33 = qf.ringdown(times, 0.0, amps33, freqs33)
sets33 = [[(3, 3, n, 1) for n in range(N)] for N in range(1, N33 + 1)]
mm33 = qf.mismatch_t0_mode_sets(times, h33, sets33, Mf, chif, t0_array)
print("(3,3) ladder envelope -- N_max  min-mismatch  best-t0")
for N, mm in zip((1, 8, 12, 15), (mm33[0], mm33[7], mm33[11], mm33[14])):
    k = int(np.argmin(mm))
    print(f"{N - 1:5d}  {mm[k]:.3e}     {t0_array[k]:+.1f}")
