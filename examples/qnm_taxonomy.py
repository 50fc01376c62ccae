"""QNM taxonomy plots: the reference's qnm_taxonomy.ipynb.

Visualises the labelling conventions of the Kerr spectrum:

1. prograde (m>0) / retrograde (m<0) / m=0 branches of l=2,3 in the
   complex-frequency plane over spin;
2. the deep l=2, m=2 overtone ladder to n=20 with the n=8/9 multiplet
   pair (the reference overlays Berti's s2l2.dat Schwarzschild data,
   which needs a download; here the chi->0 limits of the in-house
   tracks mark the Schwarzschild points);
3. mirror-mode symmetry omega_{l,-m,n}(sign=-1) = -conj(omega_{l,m,n}).

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/qnm_taxonomy.py
"""

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import qnmfits_tpu as qf

OUT = Path(__file__).parent / "output"
OUT.mkdir(exist_ok=True)

chi_array = np.arange(0, 0.99, 0.01)

# --- 1. branch taxonomy (notebook cell 1) -------------------------------
fig, ax = plt.subplots(figsize=(9, 4.5))
for n in range(2):
    for l in range(2, 4):
        if (l, n) == (3, 1):
            continue
        for m in range(-l, l + 1):
            c = "C3" if m < 0 else ("C7" if m == 0 else "C0")
            w = qf.qnm.omega(l, m, n, 1, chi_array)
            ax.plot(np.real(w) / (2 * np.pi), -np.imag(w), c=c, lw=0.8)
            if m == l:
                ax.text(np.real(w[0]) / (2 * np.pi) - 0.012,
                        -np.imag(w[0]) + 0.01, f"$\\ell={l}$", fontsize=9)
ax.set_xlabel("Re$[\\omega]/2\\pi$")
ax.set_ylabel("$-$Im$[\\omega]$")
ax.set_title("prograde (blue) / retrograde (red) / $m=0$ (grey)")
fig.savefig(OUT / "qnm_taxonomy_branches.png", dpi=120)
print(f"wrote {OUT / 'qnm_taxonomy_branches.png'}")

# --- 2. deep l=2 overtone ladder with the multiplet pair (cells 5-10) ---
fig, ax = plt.subplots(figsize=(7, 6))
cmap = plt.get_cmap("viridis")
for n in range(21):
    c = "black" if n in (8, 9) else cmap(n / 21)
    w = qf.qnm.omega(2, 2, n, 1, chi_array)
    ax.plot(np.real(w) / (2 * np.pi), -np.imag(w), c=c, lw=0.9)
    ax.plot(np.real(w[0]) / (2 * np.pi), -np.imag(w[0]), "o", c=c, ms=3)
    ax.text(np.real(w[0]) / (2 * np.pi) - 0.002, -np.imag(w[0]),
            f"${n}$", fontsize=8, ha="right", va="center")
ax.set_xlabel("Re$[\\omega]/2\\pi$")
ax.set_ylabel("$-$Im$[\\omega]$")
ax.set_title("l=2, m=2 overtones to n=20; n=8/9 multiplet pair in black")
fig.savefig(OUT / "qnm_taxonomy_overtones.png", dpi=120)
print(f"wrote {OUT / 'qnm_taxonomy_overtones.png'}")

# The multiplet pair emerges from the algebraically special frequency
# -2i at chi=0 (Cook & Zalutskiy {8,0}/{8,1}).
for n in (8, 9):
    w0 = qf.qnm.omega(2, 2, n, 1, 0.003)
    print(f"omega(2,2,{n}) at chi->0: {w0:.4f}  (special point -2i)")

# --- 3. mirror symmetry (README labelling conventions) ------------------
w_reg = qf.qnm.omega(2, 2, 0, 1, 0.7)
w_mir = qf.qnm.omega(2, -2, 0, -1, 0.7)
print(f"omega(2, 2,0,+1) = {w_reg:.6f}")
print(f"omega(2,-2,0,-1) = {w_mir:.6f}  "
      f"(= -conj of the above: {abs(w_mir + np.conj(w_reg)):.1e})")
w_retro = qf.qnm.omega(2, -2, 0, 1, 0.7)
print(f"omega(2,-2,0,+1) = {w_retro:.6f}  (retrograde branch, distinct)")
