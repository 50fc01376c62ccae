"""Drift tests for the driver-entry hermeticity shims.

`__graft_entry__._cpu_only_hardening` keeps an explicit
JAX_PLATFORMS=cpu honest against a stalled accelerator plugin by
mutating two PRIVATE jax attributes (`jax._src.xla_bridge._backends`
and `._backend_factories`) inside a bare except.  A JAX upgrade that
renames either would silently degrade the shim back to the round-3
hang-on-stalled-tunnel failure mode (PARITY.md post-mortem).  These
tests make that drift loud:

* the private attributes the shim relies on must exist with the
  expected types in the installed jax;
* in a fresh subprocess with a fake non-CPU backend factory
  registered, the shim must actually drop the factory and leave a
  working CPU-only jax.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPrivateApiExists:
    """Loud failure on a jax upgrade that renames the internals."""

    def test_xla_bridge_attributes(self):
        from jax._src import xla_bridge as xb
        assert isinstance(xb._backend_factories, dict)
        assert isinstance(xb._backends, dict)
        # The shim pops non-cpu entries; cpu must be registered under
        # exactly this key for the surviving factory to work.
        assert "cpu" in xb._backend_factories

    def test_jax_platforms_config_key(self):
        import jax
        # The shim re-pins this config key; it must exist and accept
        # an update (written back with its current value: no-op).
        current = jax.config.jax_platforms
        jax.config.update("jax_platforms", current)


_SUBPROCESS_SCRIPT = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax                       # imported, backends NOT initialised
from jax._src import xla_bridge as xb
assert not xb._backends, "backends initialised before the shim ran"

def stalled_factory(*a, **k):
    raise SystemExit("dryrun dialed the dead tunnel")

# Simulate a stalled accelerator plugin: a registered non-CPU factory
# (registration also rewrites the jax_platforms config, which is how
# the real plugin "ignores" the env var).
xb.register_backend_factory("faketpu", stalled_factory)
jax.config.update("jax_platforms", "faketpu,cpu")

import __graft_entry__
__graft_entry__._cpu_only_hardening()

assert "faketpu" not in xb._backend_factories, "factory not dropped"
assert jax.config.jax_platforms == "cpu", "jax_platforms not re-pinned"
devs = jax.devices()             # would raise/exit via the factory
assert all(d.platform == "cpu" for d in devs), devs
print("HERMETIC-OK")
"""


class TestShimDropsStalledFactory:
    def test_fake_backend_dropped(self):
        """End-to-end: a registered non-CPU factory under
        JAX_PLATFORMS=cpu is dropped before device discovery."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)      # plain 1-device CPU is fine
        r = subprocess.run(
            [sys.executable, "-c",
             _SUBPROCESS_SCRIPT.format(repo=REPO)],
            capture_output=True, text=True, timeout=240, env=env,
            cwd=REPO)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "HERMETIC-OK" in r.stdout

    def test_noop_when_platforms_not_cpu(self):
        """The shim must not touch anything unless the caller pinned
        JAX_PLATFORMS=cpu explicitly."""
        script = (
            "import os, sys\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "os.environ['JAX_PLATFORMS'] = ''\n"
            "import jax\n"
            "from jax._src import xla_bridge as xb\n"
            "xb.register_backend_factory('faketpu', lambda *a, **k: None)\n"
            "import __graft_entry__\n"
            "__graft_entry__._cpu_only_hardening()\n"
            "assert 'faketpu' in xb._backend_factories\n"
            "print('NOOP-OK')\n")
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        r = subprocess.run([sys.executable, "-c", script],
                           capture_output=True, text=True, timeout=240,
                           env=env, cwd=REPO)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "NOOP-OK" in r.stdout


class TestDeviceForHonorsDefaultPin:
    def test_f32_follows_configured_default_device(self):
        """`_device_for(non-x64)` must return the CONFIGURED default
        device when one is pinned (the conftest pins cpu).  The axon
        TPU plugin ignores JAX_PLATFORMS, so `jax.devices()[0]` can be
        a tunneled accelerator even in a cpu-pinned suite -- an
        explicit placement there hangs forever when the tunnel stalls
        (observed: device_put blocked 20+ min in the mapping f32 test).
        """
        import jax

        from qnmfits_tpu.engine import _device_for

        dev = _device_for("f32")
        assert dev.platform == "cpu", dev
        assert dev == jax.devices("cpu")[0]

    def test_unpinned_prefers_accelerator_order(self):
        """Without a default-device pin the accelerator (devices()[0])
        is chosen -- the production path.  Simulated by clearing the
        pin inside a subprocess so the suite's own pin is untouched."""
        script = (
            "import os, sys\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "import jax\n"
            "from qnmfits_tpu.engine import _device_for\n"
            "assert jax.config.jax_default_device is None\n"
            "d = _device_for('f32')\n"
            "assert d == jax.devices()[0], (d, jax.devices())\n"
            "print('UNPINNED-OK')\n")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        r = subprocess.run([sys.executable, "-c", script],
                           capture_output=True, text=True, timeout=240,
                           env=env, cwd=REPO)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "UNPINNED-OK" in r.stdout
