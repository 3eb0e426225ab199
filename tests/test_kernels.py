"""Unit tests for SPH smoothing kernels against closed forms."""
import numpy as np
import jax.numpy as jnp

from sph_tpu.physics import kernels as K

PI = 3.141592653589
H = 0.28


def test_poly6_closed_form():
    r = 0.1
    expected = 315.0 / (64.0 * PI * H**9) * (H * H - r * r) ** 3
    got = float(K.poly6(jnp.float32(r * r), jnp.float32(H)))
    assert abs(got - expected) / expected < 1e-5


def test_poly6_support():
    assert float(K.poly6(jnp.float32((H * 1.01) ** 2), jnp.float32(H))) == 0.0
    assert float(K.poly6(jnp.float32(0.0), jnp.float32(H))) > 0.0


def test_poly6_normalization():
    # Integral of poly6 over its support is 1 (radial quadrature).
    r = np.linspace(0, H, 20001)
    w = np.asarray(K.poly6(jnp.asarray(r * r, jnp.float32), jnp.float32(H)))
    integral = np.trapezoid(4 * np.pi * r * r * w, r)
    assert abs(integral - 1.0) < 1e-3


def test_spiky_grad_direction_and_magnitude():
    rij = jnp.asarray([[0.1, 0.0, 0.0]], jnp.float32)
    g = np.asarray(K.spiky_grad(rij, jnp.float32(H)))[0]
    r = 0.1
    expected_mag = 45.0 / (PI * H**6) * (H - r) ** 2
    assert g[0] < 0.0  # points from j toward... -rhat scaling
    assert abs(np.linalg.norm(g) - expected_mag) / expected_mag < 1e-5
    assert g[1] == 0.0 and g[2] == 0.0


def test_spiky_grad_zero_at_origin_and_outside():
    z = np.asarray(K.spiky_grad(jnp.zeros((1, 3), jnp.float32), jnp.float32(H)))
    assert np.all(z == 0.0)
    far = np.asarray(K.spiky_grad(
        jnp.asarray([[2 * H, 0, 0]], jnp.float32), jnp.float32(H)))
    assert np.all(far == 0.0)


def test_visc_laplacian():
    r = 0.2
    expected = 45.0 / (PI * H**6) * (H - r)
    got = float(K.visc_laplacian(jnp.float32(r), jnp.float32(H)))
    assert abs(got - expected) / expected < 1e-5
    assert float(K.visc_laplacian(jnp.float32(H * 1.5), jnp.float32(H))) == 0.0
