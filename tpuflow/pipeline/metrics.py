"""Flow-quality metrics: endpoint error (EPE) and angular error (AE).

The reference verifies flow quality only by eye (quiver plots + motion-
compensated frames, SURVEY.md §4); the new framework formalizes that with
the standard optical-flow metrics used for its golden tests and benchmarks.
"""

from __future__ import annotations

import jax.numpy as jnp


def epe(u, v, u_ref, v_ref, mean: bool = True):
    """Endpoint error |(u,v) - (u_ref,v_ref)| (mean over pixels by default)."""
    e = jnp.sqrt((jnp.asarray(u) - jnp.asarray(u_ref)) ** 2
                 + (jnp.asarray(v) - jnp.asarray(v_ref)) ** 2)
    return jnp.mean(e) if mean else e


def angular_error(u, v, u_ref, v_ref, mean: bool = True):
    """Barron angular error between space-time direction vectors (u, v, 1)."""
    u, v = jnp.asarray(u), jnp.asarray(v)
    u_ref, v_ref = jnp.asarray(u_ref), jnp.asarray(v_ref)
    num = u * u_ref + v * v_ref + 1.0
    den = jnp.sqrt((u**2 + v**2 + 1.0) * (u_ref**2 + v_ref**2 + 1.0))
    ae = jnp.arccos(jnp.clip(num / den, -1.0, 1.0))
    return jnp.mean(ae) if mean else ae
