"""The `qnmfits` drop-in alias: reference import patterns run unchanged.

Patterns under test are the ones the reference's own notebooks use
(`import qnmfits`, `import qnmfits.qnm as qnm`,
/root/reference/examples/*.ipynb) plus the submodule layout of
/root/reference/qnmfits/__init__.py.
"""

import subprocess
import sys

import numpy as np

SCHW_220 = 0.3736716844 - 0.0889623157j


def test_package_instance_then_submodule_shadowing():
    """`qnmfits.qnm` is the spectrum INSTANCE at package level (the
    reference's `from .qnmfits import *` binding), and importing the
    submodule afterwards shadows it with the module carrying the class
    -- the reference's own order-dependent semantics.  Run in a fresh
    interpreter so this file's other tests can't pre-import things."""
    code = """
import numpy as np
import qnmfits
w = qnmfits.qnm.omega(2, 2, 0, 1, 0.0)
assert abs(w - (%r)) < 1e-9, w
import qnmfits.qnm as qnm_mod
q = qnm_mod.qnm()                       # class, like the reference
w2 = q.omega(2, 2, 0, 1, 0.0)
assert abs(w2 - w) < 1e-15
qnm_mod.download_cook_data
print("ok")
""" % SCHW_220
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout


def test_toplevel_objects_are_qnmfits_tpu():
    import qnmfits
    import qnmfits_tpu
    assert qnmfits.ringdown_fit is qnmfits_tpu.ringdown_fit
    assert qnmfits.mismatch_t0_array is qnmfits_tpu.mismatch_t0_array
    assert qnmfits.calculate_epsilon is qnmfits_tpu.calculate_epsilon
    assert qnmfits.rational_filter is qnmfits_tpu.rational_filter
    assert qnmfits.Custom is qnmfits_tpu.Custom
    assert qnmfits.SXS is qnmfits_tpu.SXS
    assert qnmfits.download_cook_data is qnmfits_tpu.download_cook_data
    # plotting surface
    assert qnmfits.plot_ringdown is qnmfits_tpu.plot_ringdown


def test_qnmfits_submodule_reference_style():
    from qnmfits.qnmfits import mismatch_t0_array, qnm, ringdown_fit
    assert callable(ringdown_fit) and callable(mismatch_t0_array)
    assert abs(qnm.omega(2, 2, 0, 1, 0.0) - SCHW_220) < 1e-9


def test_spatial_mapping_functions_alias():
    from qnmfits.spatial_mapping_functions import (
        Qmu_A, kappa, mapping_multimode_ringdown_fit, sYlm)
    import qnmfits_tpu.spatial as sp
    assert Qmu_A is sp.Qmu_A
    assert kappa is sp.kappa
    assert sYlm is sp.sYlm
    assert mapping_multimode_ringdown_fit \
        is sp.mapping_multimode_ringdown_fit


def test_waveforms_submodules():
    from qnmfits.Waveforms.Base import BaseClass
    from qnmfits.Waveforms.Custom import Custom
    from qnmfits.Waveforms.Simulation import SXS
    from qnmfits.Waveforms.Surrogate import NRHybSur3dq8, NRSur7dq4
    from qnmfits_tpu.waveforms import BaseWaveform
    assert BaseClass is BaseWaveform
    assert Custom.__name__ == "Custom"
    assert SXS.__name__ == "SXS"
    assert NRSur7dq4 and NRHybSur3dq8


def test_end_to_end_fit_through_shim():
    """A reference-style script body against the alias."""
    import qnmfits
    times = np.arange(-10.0, 120.05, 0.1)
    modes = [(2, 2, n, 1) for n in range(3)]
    freqs = np.array(qnmfits.qnm.omega_list(modes, 0.7, 0.95))
    amps = np.array([1.0 + 0.5j, -0.3 + 0.2j, 0.1 - 0.4j])
    h = qnmfits.ringdown(times, 0.0, amps, freqs)
    best = qnmfits.ringdown_fit(times, h, modes, 0.95, 0.7, t0=0.0)
    assert best["mismatch"] < 1e-12
    np.testing.assert_allclose(np.asarray(best["C"]), amps,
                               rtol=0, atol=1e-9)
