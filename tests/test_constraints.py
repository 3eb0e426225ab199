"""Shape projection tests against analytic points (OBBConstraints port)."""
import numpy as np
import jax.numpy as jnp

from sph_tpu.core import params as P
from sph_tpu.core.params import FluidParams, rotation_matrix
from sph_tpu.core.state import ParticleState
from sph_tpu.physics import constraints as CN


def _project(points, shape, half, aux=(5.0, 0.35, 2.5)):
    q, n, hit = CN.project_shape(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(shape, jnp.int32),
        jnp.asarray(half, jnp.float32),
        jnp.asarray(aux, jnp.float32))
    return np.asarray(q), np.asarray(n), np.asarray(hit)


def test_box_projection():
    q, n, hit = _project([[10.0, 0.0, 0.0], [0.0, 0.0, 0.0]], P.SHAPE_BOX,
                         [7, 7, 7])
    assert hit[0] and not hit[1]
    np.testing.assert_allclose(q[0], [7, 0, 0], atol=1e-6)
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-6)


def test_sphere_projection():
    q, n, hit = _project([[0.0, 10.0, 0.0]], P.SHAPE_SPHERE, [5, 0, 0])
    assert hit[0]
    np.testing.assert_allclose(q[0], [0, 5, 0], atol=1e-5)
    np.testing.assert_allclose(n[0], [0, 1, 0], atol=1e-6)


def test_cylinder_projection():
    q, n, hit = _project([[8.0, 0.0, 0.0], [0.0, 9.0, 0.0]],
                         P.SHAPE_CYLINDER, [5, 6, 0])
    assert hit.all()
    np.testing.assert_allclose(q[0], [5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(q[1], [0, 6, 0], atol=1e-5)
    np.testing.assert_allclose(n[1], [0, 1, 0], atol=1e-5)


def test_torus_projection():
    # Ring radius 4, tube radius 1: point at x=6 on the ring plane projects
    # to x=5 (ring point x=4 plus tube radius along +x).
    q, n, hit = _project([[6.0, 0.0, 0.0]], P.SHAPE_TORUS, [4, 1, 0])
    assert hit[0]
    np.testing.assert_allclose(q[0], [5, 0, 0], atol=1e-5)


def test_capsule_projection():
    q, n, hit = _project([[0.0, 8.0, 0.0]], P.SHAPE_CAPSULE, [2, 3, 0])
    assert hit[0]
    np.testing.assert_allclose(q[0], [0, 5, 0], atol=1e-5)  # cap top = H + R


def test_egg_projection_normal_is_gradient():
    a, b = 3.0, 5.0
    q, n, hit = _project([[4.0, 4.0, 0.0]], P.SHAPE_EGG, [a, b, 0])
    assert hit[0]
    g = np.array([2 * q[0][0] / a**2, 2 * q[0][1] / b**2, 0.0])
    g /= np.linalg.norm(g)
    np.testing.assert_allclose(n[0], g, atol=1e-5)
    # projected point is on the ellipsoid
    f = (q[0][0] / a) ** 2 + (q[0][1] / b) ** 2 + (q[0][2] / a) ** 2
    assert abs(f - 1.0) < 1e-4


def test_superellipsoid_projection_on_surface():
    a, b, ne = 3.0, 4.0, 4.0
    q, n, hit = _project([[5.0, 5.0, 5.0]], P.SHAPE_SUPERELLIPSOID,
                         [a, b, 0], aux=[5.0, 0.35, ne])
    assert hit[0]
    f = (abs(q[0][0]) / a) ** ne + (abs(q[0][1]) / b) ** ne + (abs(q[0][2]) / a) ** ne
    assert abs(f - 1.0) < 1e-3


def test_trefoil_projection_within_tube():
    S, r = 2.0, 0.8
    q, n, hit = _project([[20.0, 0.0, 0.0]], P.SHAPE_TREFOIL, [S, r, 0])
    assert hit[0]
    # q must lie exactly r from some curve sample
    t = 2.0 * np.pi * np.arange(48) / 48.0
    curve = S * np.stack([np.sin(t) + 2 * np.sin(2 * t),
                          0.35 * (-np.sin(3 * t)),
                          np.cos(t) - 2 * np.cos(2 * t)], -1)
    d = np.linalg.norm(curve - q[0], axis=-1).min()
    assert abs(d - r) < 1e-4


def test_container_reflection_restitution_friction():
    params = FluidParams.default(wall_restitution=0.5, wall_friction=0.1)
    st = ParticleState.zeros(256)
    st = st.replace(
        pos=st.pos.at[0].set(jnp.asarray([8.0, 0.0, 0.0])),
        vel=st.vel.at[0].set(jnp.asarray([2.0, 3.0, 0.0])),
        valid=st.valid.at[0].set(1))
    out = CN.apply_container(st, params)
    np.testing.assert_allclose(np.asarray(out.pos)[0], [7, 0, 0], atol=1e-5)
    # vn = 2 along +x -> -0.5*2 = -1; vt = 3 along y -> 0.9*3 = 2.7
    np.testing.assert_allclose(np.asarray(out.vel)[0], [-1.0, 2.7, 0.0],
                               atol=1e-5)


def test_rotated_box_containment():
    params = FluidParams.default(box_euler_deg=[0.0, 0.0, 45.0])
    rot = np.asarray(rotation_matrix(params.box_euler_deg))
    st = ParticleState.zeros(256)
    p_world = rot @ np.array([10.0, 0.0, 0.0], np.float32)
    st = st.replace(pos=st.pos.at[0].set(jnp.asarray(p_world)),
                    valid=st.valid.at[0].set(1))
    out = CN.apply_container(st, params)
    expected = rot @ np.array([7.0, 0.0, 0.0], np.float32)
    np.testing.assert_allclose(np.asarray(out.pos)[0], expected, atol=1e-4)


def test_ghosts_skip_container():
    params = FluidParams.default()
    st = ParticleState.zeros(256)
    st = st.replace(pos=st.pos.at[0].set(jnp.asarray([9.0, 0.0, 0.0])),
                    ghost=st.ghost.at[0].set(1),
                    valid=st.valid.at[0].set(1))
    out = CN.apply_container(st, params)
    np.testing.assert_allclose(np.asarray(out.pos)[0], [9, 0, 0])


def test_terrain_collision():
    params = FluidParams.default(
        terrain_min=[-7.0, -7.0], terrain_size=[14.0, 14.0],
        terrain_restitution=0.5, terrain_friction=0.0)
    terrain = jnp.full((64, 64), 2.0, jnp.float32)  # flat floor at y=2
    st = ParticleState.zeros(256)
    st = st.replace(pos=st.pos.at[0].set(jnp.asarray([0.0, 1.0, 0.0])),
                    vel=st.vel.at[0].set(jnp.asarray([0.0, -4.0, 1.0])),
                    valid=st.valid.at[0].set(1))
    out = CN.apply_terrain(st, terrain, params)
    p, v = np.asarray(out.pos)[0], np.asarray(out.vel)[0]
    assert abs(p[1] - 2.001) < 1e-5
    np.testing.assert_allclose(v, [0.0, 2.0, 1.0], atol=1e-5)


def test_container_planes_matches_row_form():
    """The resident engine's component-wise plane form of the box
    container must match apply_container on identical inputs (rotated
    OBB, mixed inside/outside, restitution + friction)."""
    import numpy as _np

    params = FluidParams.default(
        box_half=_np.asarray([4.0, 3.0, 5.0], _np.float32),
        box_euler_deg=_np.asarray([20.0, 0.0, 30.0], _np.float32),
        wall_restitution=0.4, wall_friction=0.07)
    rng = _np.random.RandomState(11)
    n = 512
    pos = rng.uniform(-8.0, 8.0, (n, 3)).astype(_np.float32)
    vel = rng.uniform(-5.0, 5.0, (n, 3)).astype(_np.float32)
    st = ParticleState.zeros(n).replace(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        valid=jnp.ones((n,), jnp.int32))
    ref = CN.apply_container(st, params)

    px, py, pz, vx, vy, vz = CN.apply_container_planes(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(pos[:, 2]), jnp.asarray(vel[:, 0]),
        jnp.asarray(vel[:, 1]), jnp.asarray(vel[:, 2]),
        jnp.ones((n,), bool), params)
    got_p = _np.stack([px, py, pz], -1)
    got_v = _np.stack([vx, vy, vz], -1)
    _np.testing.assert_allclose(got_p, _np.asarray(ref.pos), atol=2e-5)
    _np.testing.assert_allclose(got_v, _np.asarray(ref.vel), atol=2e-5)
