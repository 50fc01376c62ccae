"""TPU-tunnel watcher: run the pending measurement batch when the
tunnel answers (PERF.md section 21).

The axon tunnel stalls for hours at a time, and a stalled tunnel HANGS
jax backend initialisation rather than failing it.  This supervisor
imports no jax itself: it probes tunnel health in a bounded child
process, and on the first healthy probe runs the measurement batch
(grid analytic Grams, bordered free-omega kernel, bench.py) with a hard
per-item timeout, appending everything to a log under
``/root/repo/.tpu_watch/``.  One-shot: exits after a successful batch
(or at the deadline).

Launch detached:
    nohup python scripts/tpu_watcher.py > /tmp/tpu_watcher.out 2>&1 &
    echo $! > /tmp/tpu_watcher.pid

Env knobs:
    TPU_WATCH_DEADLINE_S   total watch budget (default 21600 = 6 h)
    TPU_WATCH_PROBE_S      per-probe timeout   (default 120 s)
    TPU_WATCH_INTERVAL_S   sleep between probes (default 300 s)
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON = "/root/.axon_site"
OUT_DIR = os.path.join(REPO, ".tpu_watch")

PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "assert d and d[0].platform != 'cpu', d;"
    "x = jnp.ones((128, 128));"
    "v = float((x @ x).sum());"
    "print('PROBE_OK', d[0], v)"
)

# (label, argv, timeout_s).  Each item tolerates the one-time device
# program load (~minutes for big kernels) on top of remote compiles.
BATCH = [
    ("grid_analytic",
     [sys.executable, os.path.join(REPO, "scripts/perf_grid_analytic.py")],
     1800),
    ("omega_bordered",
     [sys.executable, os.path.join(REPO, "scripts/perf_omega_bordered.py")],
     1800),
    # bench.py supervises itself (BENCH_TPU_TIMEOUT) and prints the
    # JSON line with the device that actually ran.  The outer timeout
    # must cover bench's own worst case: a 900 s stalled-TPU attempt
    # PLUS the ~7 min CPU fallback -- killing bench mid-fallback would
    # lose the measurement the supervisor chain exists to protect.
    ("bench",
     [sys.executable, os.path.join(REPO, "bench.py")],
     2100),
]


def tpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in [REPO, AXON, env.get("PYTHONPATH", "")] if p)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def probe(timeout_s):
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                           env=tpu_env(), timeout=timeout_s,
                           stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT)
    except subprocess.TimeoutExpired:
        return False, "probe timed out (tunnel stalled)"
    out = r.stdout.decode(errors="replace").strip()
    return (r.returncode == 0 and "PROBE_OK" in out), out[-500:]


def run_batch(log_path):
    ok = True
    with open(log_path, "a") as log:
        for label, argv, timeout_s in BATCH:
            log.write(f"\n===== {label} (timeout {timeout_s}s) =====\n")
            log.flush()
            t0 = time.time()
            try:
                r = subprocess.run(argv, env=tpu_env(), timeout=timeout_s,
                                   stdout=log, stderr=subprocess.STDOUT)
                status = f"rc={r.returncode}"
                ok = ok and r.returncode == 0
            except subprocess.TimeoutExpired:
                status = "TIMEOUT"
                ok = False
            log.write(f"===== {label} done: {status} "
                      f"({time.time() - t0:.0f}s) =====\n")
            log.flush()
    return ok


def main():
    deadline_s = float(os.environ.get("TPU_WATCH_DEADLINE_S", "21600"))
    probe_s = float(os.environ.get("TPU_WATCH_PROBE_S", "120"))
    interval_s = float(os.environ.get("TPU_WATCH_INTERVAL_S", "300"))

    os.makedirs(OUT_DIR, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    log_path = os.path.join(OUT_DIR, f"batch-{stamp}.log")

    start = time.time()
    n = 0
    while time.time() - start < deadline_s:
        n += 1
        alive, detail = probe(probe_s)
        msg = (f"[tpu_watcher] probe {n} at +{time.time() - start:.0f}s: "
               f"{'ALIVE' if alive else 'down'} ({detail})")
        print(msg, flush=True)
        if alive:
            with open(log_path, "a") as log:
                log.write(msg + "\n")
            print(f"[tpu_watcher] tunnel up -> running batch, "
                  f"log: {log_path}", flush=True)
            ok = run_batch(log_path)
            verdict = "complete" if ok else "had failures"
            print(f"[tpu_watcher] batch {verdict}; log: {log_path}",
                  flush=True)
            return 0 if ok else 2
        time.sleep(interval_s)
    print("[tpu_watcher] deadline reached with tunnel down", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
