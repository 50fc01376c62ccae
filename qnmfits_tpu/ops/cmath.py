"""Complex math built from real primitives.

The axon TPU backend lacks lowering for complex transcendentals
(jnp.exp on complex64 fails UNIMPLEMENTED), so the hot path builds the
damped phase factors from real exp/cos/sin explicitly.  This is also what
a hand-written kernel would do on the VPU -- no performance cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cexp", "damped_phase"]


def cexp(z):
    """exp(z) for complex z via real exp/cos/sin."""
    re = jnp.real(z)
    im = jnp.imag(z)
    mag = jnp.exp(re)
    return jax.lax.complex(mag * jnp.cos(im), mag * jnp.sin(im))


def damped_phase(omega, dt):
    """exp(-i * omega * dt) for complex omega and real dt (broadcasting).

    With omega = wr + i wi:  exp(-i omega dt)
        = e^{wi dt} (cos(wr dt) - i sin(wr dt)).
    The dtype follows (omega, dt) promotion (complex64 in the TPU path).
    """
    wr = jnp.real(omega)
    wi = jnp.imag(omega)
    mag = jnp.exp(wi * dt)
    ph = wr * dt
    return jax.lax.complex(mag * jnp.cos(ph), -mag * jnp.sin(ph))
