"""Kernel shoot-out for the t0 x mode-set sweep on the live TPU.

Compares, on the exact bench.py problem (S=16 mode sets x B=512 start
times = 8192 multimode fits):

  * factored kernel (bench round-1 default) vs suffix-sum kernel;
  * lax.map(batch_size=1) over the mode-set axis vs a single vmap;
  * chunk sizes;
  * f32 assembly + f64 solve/refinement variants (accuracy printed).

Usage: python scripts/perf_kernels.py [--reps 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(tag, make_fn, args, n_fits, reps, ref_mm):
    import jax
    try:
        fn = make_fn()
        out = fn(*args)
        mm = out[-1]
        jax.block_until_ready(mm)
        mm_np = np.asarray(mm)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:50s} FAILED: {type(e).__name__}: {e}")
        return None
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t)
    el = min(ts)
    dev = float(np.nanmax(np.abs(mm_np - ref_mm)))
    print(f"{tag:50s} {n_fits/el:10.0f} fits/s  {el*1e3:8.1f} ms  "
          f"max|mm-ref|={dev:.2e}")
    return n_fits / el


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args_cli = ap.parse_args()

    import jax
    import bench
    from qnmfits_tpu import engine_real as er

    times, data, omegas, mus, masks, t0s, Ts, syn = bench.build_problem()
    S, B = omegas.shape[0], t0s.shape[0]
    n_fits = S * B
    dev = jax.devices()[0]
    print(f"device={dev}  S={S} B={B} n_fits={n_fits}", file=sys.stderr)

    f64 = np.float64
    host = dict(
        times=times.astype(f64),
        dre=data.real.astype(f64), dim=data.imag.astype(f64),
        wrs=omegas.real.astype(f64), wis=omegas.imag.astype(f64),
        mres=mus.real.astype(f64), mims=mus.imag.astype(f64),
        t0s=t0s.astype(f64), Ts=Ts.astype(f64), masks=masks)
    a64 = [jax.device_put(host[k], dev) for k in
           ("times", "dre", "dim", "wrs", "wis", "mres", "mims",
            "t0s", "Ts", "masks")]

    # Reference mismatches from the shipped factored kernel (equality vs
    # the NumPy oracle is asserted in tests; here it anchors the variants).
    base = jax.jit(lambda *a: er.sweep_t0_modesets_factored_real(
        *a, chunk=128))
    ref_mm = np.asarray(base(*a64)[-1])

    reps = args_cli.reps

    run("factored c128 + lax.map(S) [bench r1]",
        lambda: jax.jit(lambda *a: er.sweep_t0_modesets_factored_real(
            *a, chunk=128)), a64, n_fits, reps, ref_mm)

    run("suffix   c128 + lax.map(S)",
        lambda: jax.jit(lambda *a: er.sweep_t0_modesets_suffix_real(
            *a, chunk=128)), a64, n_fits, reps, ref_mm)

    def vmapped(kernel, chunk):
        def f(times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks):
            return jax.vmap(
                lambda wr, wi, mre, mim, mask: kernel(
                    times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                    col_mask=mask, chunk=chunk)
            )(wrs, wis, mres, mims, masks)
        return jax.jit(f)

    for chunk in (64, 128, 256, 512):
        run(f"factored c{chunk:<4d} + vmap(S)",
            lambda c=chunk: vmapped(er.sweep_t0_factored_real, c),
            a64, n_fits, reps, ref_mm)

    for chunk in (64, 128, 256, 512):
        run(f"suffix   c{chunk:<4d} + vmap(S)",
            lambda c=chunk: vmapped(er.sweep_t0_suffix_real, c),
            a64, n_fits, reps, ref_mm)


if __name__ == "__main__":
    main()
