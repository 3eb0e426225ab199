"""SPH smoothing kernels (poly6 / spiky gradient / viscosity Laplacian).

Closed forms match the reference GLSL (``shaders/SPHFluid.comp:42-64``):

    poly6(r^2)   = 315/(64 pi h^9) (h^2 - r^2)^3        for 0 <= r <= h
    spikyGrad(r) = -45/(pi h^6) (h - r)^2 * rhat        for 0 <  r <= h
    viscLap(r)   =  45/(pi h^6) (h - r)                 for 0 <= r <= h

All functions are branchless/masked so they vectorize on the VPU and are
safe at r = 0 (the gradient is defined to vanish there, as in the GLSL).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_PI = 3.141592653589


def poly6(r2: jax.Array, h: jax.Array) -> jax.Array:
    """W_poly6(r^2; h). Input is squared distance."""
    h2 = h * h
    coeff = 315.0 / (64.0 * _PI * h**9)
    d = jnp.maximum(h2 - r2, 0.0)
    return jnp.where(r2 <= h2, coeff * d * d * d, 0.0)


def spiky_grad(rij: jax.Array, h: jax.Array,
               r: jax.Array | None = None) -> jax.Array:
    """grad W_spiky(rij; h), vanishing at r=0 and r>h. rij: [..., 3]."""
    if r is None:
        r = jnp.sqrt(jnp.sum(rij * rij, axis=-1))
    coeff = -45.0 / (_PI * h**6)
    d = jnp.maximum(h - r, 0.0)
    mag = coeff * d * d
    safe_r = jnp.maximum(r, 1e-12)
    scale = jnp.where((r > 0.0) & (r <= h), mag / safe_r, 0.0)
    return rij * scale[..., None]


def spiky_grad_mag_over_r(r: jax.Array, h: jax.Array) -> jax.Array:
    """|grad W_spiky| / r, masked — multiply by rij to get the gradient.

    Separated out so neighbor sweeps can work on scalar distance matrices
    (pair tiles) and form the vector later.
    """
    coeff = -45.0 / (_PI * h**6)
    d = jnp.maximum(h - r, 0.0)
    safe_r = jnp.maximum(r, 1e-12)
    return jnp.where((r > 0.0) & (r <= h), coeff * d * d / safe_r, 0.0)


def visc_laplacian(r: jax.Array, h: jax.Array) -> jax.Array:
    """Laplacian of the viscosity kernel."""
    coeff = 45.0 / (_PI * h**6)
    return jnp.where((r >= 0.0) & (r <= h), coeff * jnp.maximum(h - r, 0.0), 0.0)
