"""Batched small-Cholesky variants shoot-out (the sweep's dominant
stage): column-unrolled (lists of stacked columns) vs fully scalarized
(every L entry its own (B,) array -- a pure elementwise DAG, no stacked
temporaries).

Usage: python scripts/perf_chol.py [J] [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def scalarized_complex_chol_solve(Gre, Gim, bre, bim):
    import jax.numpy as jnp

    B, n, _ = Gre.shape
    Lre = [[None] * n for _ in range(n)]
    Lim = [[None] * n for _ in range(n)]
    inv = [None] * n
    for j in range(n):
        s = Gre[:, j, j]
        for k in range(j):
            s = s - (Lre[j][k] * Lre[j][k] + Lim[j][k] * Lim[j][k])
        d = jnp.sqrt(s)
        inv[j] = 1.0 / d
        Lre[j][j] = d
        Lim[j][j] = None
        for i in range(j + 1, n):
            sre = Gre[:, i, j]
            sim = Gim[:, i, j]
            for k in range(j):
                sre = sre - (Lre[i][k] * Lre[j][k]
                             + Lim[i][k] * Lim[j][k])
                sim = sim - (Lim[i][k] * Lre[j][k]
                             - Lre[i][k] * Lim[j][k])
            Lre[i][j] = sre * inv[j]
            Lim[i][j] = sim * inv[j]

    yre = [None] * n
    yim = [None] * n
    for j in range(n):
        are = bre[:, j]
        aim = bim[:, j]
        for k in range(j):
            are = are - (Lre[j][k] * yre[k] - Lim[j][k] * yim[k])
            aim = aim - (Lre[j][k] * yim[k] + Lim[j][k] * yre[k])
        yre[j] = are * inv[j]
        yim[j] = aim * inv[j]

    xre = [None] * n
    xim = [None] * n
    for j in range(n - 1, -1, -1):
        are = yre[j]
        aim = yim[j]
        for i in range(j + 1, n):
            # conj(L[i,j]) * x_i
            are = are - (Lre[i][j] * xre[i] + Lim[i][j] * xim[i])
            aim = aim - (Lre[i][j] * xim[i] - Lim[i][j] * xre[i])
        xre[j] = are * inv[j]
        xim[j] = aim * inv[j]
    import jax.numpy as jnp
    return jnp.stack(xre, axis=-1), jnp.stack(xim, axis=-1)



def rightlooking_complex_chol_solve(Gre, Gim, bre, bim):
    """Right-looking: one fused outer-product trailing update per column
    (no stacked gathers during factorization)."""
    import jax.numpy as jnp

    B, n, _ = Gre.shape
    Sre, Sim = Gre, Gim
    cols_re, cols_im, invs = [], [], []
    for j in range(n):
        d = jnp.sqrt(Sre[:, 0, 0])
        inv = 1.0 / d
        cre_ = Sre[:, :, 0] * inv[:, None]          # (B, n-j)
        cim_ = Sim[:, :, 0] * inv[:, None]
        cols_re.append(cre_)
        cols_im.append(cim_)
        invs.append(inv)
        if j < n - 1:
            a_re, a_im = cre_[:, 1:], cim_[:, 1:]
            Sre = Sre[:, 1:, 1:] - (a_re[:, :, None] * a_re[:, None, :]
                                    + a_im[:, :, None] * a_im[:, None, :])
            Sim = Sim[:, 1:, 1:] - (a_im[:, :, None] * a_re[:, None, :]
                                    - a_re[:, :, None] * a_im[:, None, :])

    yre, yim = bre, bim
    ys_re, ys_im = [], []
    for j in range(n):
        h_re = yre[:, 0] * invs[j]
        h_im = yim[:, 0] * invs[j]
        ys_re.append(h_re)
        ys_im.append(h_im)
        if j < n - 1:
            a_re, a_im = cols_re[j][:, 1:], cols_im[j][:, 1:]
            yre = yre[:, 1:] - (a_re * h_re[:, None] - a_im * h_im[:, None])
            yim = yim[:, 1:] - (a_re * h_im[:, None] + a_im * h_re[:, None])

    xre = [None] * n
    xim = [None] * n
    for j in range(n - 1, -1, -1):
        s_re, s_im = ys_re[j], ys_im[j]
        if j < n - 1:
            a_re, a_im = cols_re[j][:, 1:], cols_im[j][:, 1:]
            Xre = jnp.stack(xre[j + 1:], axis=-1)
            Xim = jnp.stack(xim[j + 1:], axis=-1)
            s_re = s_re - jnp.sum(a_re * Xre + a_im * Xim, axis=-1)
            s_im = s_im - jnp.sum(a_re * Xim - a_im * Xre, axis=-1)
        xre[j] = s_re * invs[j]
        xim[j] = s_im * invs[j]
    return jnp.stack(xre, axis=-1), jnp.stack(xim, axis=-1)


def main():
    import jax
    import jax.numpy as jnp
    from qnmfits_tpu.ops.chol import complex_cholesky_solve_unrolled

    J = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    M = rng.standard_normal((n, J, 2 * J))
    G = M @ np.swapaxes(M, -1, -2) + 3 * np.eye(J)[None]
    A = rng.standard_normal((n, J, J)) * 0.1
    Gim = A - np.swapaxes(A, -1, -2)
    rhs = rng.standard_normal((n, J))
    Gd, Gimd, rd = (jax.device_put(x, dev) for x in (G, Gim, rhs))

    def bench(fn, args, reps=5):
        t0c = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
        compile_s = time.perf_counter() - t0c
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[-1])
            ts.append(time.perf_counter() - t)
        return min(ts), compile_s, out

    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    import numpy.linalg as la
    Gc = G[:8] + 1j * Gim[:8]
    xref = np.stack([la.solve(Gc[i], rhs[i] + 1j * rhs[i])
                     for i in range(8)])

    def acc(out):
        x = np.asarray(out[0][:8]) + 1j * np.asarray(out[1][:8])
        return float(np.max(np.abs(x - xref)))

    if which in ("both", "unrolled"):
        el, cs, out = bench(jax.jit(complex_cholesky_solve_unrolled),
                            (Gd, Gimd, rd, rd))
        print(f"column-unrolled J={J}: {el*1e3:7.1f} ms "
              f"(compile {cs:.0f} s)  vs-numpy={acc(out):.2e}", flush=True)
    if which in ("both", "rightlooking"):
        el, cs, out = bench(jax.jit(rightlooking_complex_chol_solve),
                            (Gd, Gimd, rd, rd))
        print(f"right-looking   J={J}: {el*1e3:7.1f} ms "
              f"(compile {cs:.0f} s)  vs-numpy={acc(out):.2e}", flush=True)
    if which in ("both", "scalarized"):
        el, cs, out = bench(jax.jit(scalarized_complex_chol_solve),
                            (Gd, Gimd, rd, rd))
        print(f"scalarized      J={J}: {el*1e3:7.1f} ms "
              f"(compile {cs:.0f} s)  vs-numpy={acc(out):.2e}", flush=True)


if __name__ == "__main__":
    main()
