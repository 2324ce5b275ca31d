"""Native C++ host runtime parity: every mmrt function must match its JAX /
numpy counterpart to float64 precision."""

import numpy as np
import jax.numpy as jnp
import pytest

from mmmpc_tpu import native
from mmmpc_tpu.models import arm_fk as jax_arm_fk
from mmmpc_tpu.models.mobile_manipulator import (
    wholebody_fk as jax_wb_fk, wholebody_step as jax_wb_step,
)
from mmmpc_tpu.runtime.reference import nearest_index as py_nearest
from mmmpc_tpu.sim.kinematic_plant import (
    plant_observation as jax_plant_obs, plant_step as jax_plant_step,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

RNG = np.random.default_rng(21)


def test_native_arm_fk_parity():
    for _ in range(50):
        q = RNG.uniform([-1.5, -3.0, 0.0], [1.5, 0.0, 4.5])
        ee_n, j2_n, j3_n = native.arm_fk(q)
        ee_j, j2_j, j3_j = jax_arm_fk(jnp.asarray(q))
        np.testing.assert_allclose(ee_n, np.asarray(ee_j), atol=1e-14)
        np.testing.assert_allclose(j2_n, np.asarray(j2_j), atol=1e-14)
        np.testing.assert_allclose(j3_n, np.asarray(j3_j), atol=1e-14)


def test_native_wholebody_fk_parity():
    for _ in range(20):
        x = RNG.normal(size=9)
        pose_n, j2_n, j3_n = native.wholebody_fk(x)
        pose_j, j2_j, j3_j = jax_wb_fk(jnp.asarray(x))
        np.testing.assert_allclose(pose_n, np.asarray(pose_j), atol=1e-13)
        np.testing.assert_allclose(j2_n, np.asarray(j2_j), atol=1e-13)
        np.testing.assert_allclose(j3_n, np.asarray(j3_j), atol=1e-13)


def test_native_wholebody_step_parity():
    for _ in range(20):
        x = RNG.normal(size=9)
        u = RNG.normal(size=5)
        out_n = native.wholebody_step(x, u, 0.1)
        out_j = jax_wb_step(jnp.asarray(x), jnp.asarray(u), 0.1)
        np.testing.assert_allclose(out_n, np.asarray(out_j), atol=1e-14)


def test_native_plant_parity():
    for _ in range(20):
        s = RNG.normal(size=12)
        a = RNG.normal(size=11)
        np.testing.assert_allclose(
            native.plant_step(s, a, 0.01),
            np.asarray(jax_plant_step(jnp.asarray(s), jnp.asarray(a), 0.01)),
            atol=1e-14)
        pos_n, vel_n = native.plant_observation(s, a)
        pos_j, vel_j = jax_plant_obs(jnp.asarray(s), jnp.asarray(a))
        np.testing.assert_allclose(pos_n, np.asarray(pos_j), atol=1e-14)
        np.testing.assert_allclose(vel_n, np.asarray(vel_j), atol=1e-14)


def test_native_reference_windowing():
    traj = RNG.normal(size=(40, 9))
    point = traj[17] + 0.01
    idx = np.array([0, 1])
    assert native.nearest_index(traj, point, idx) == py_nearest(
        traj, point, idx)
    win = native.local_ref_window(traj, 35, 9)
    assert win.shape == (9, 9)
    np.testing.assert_allclose(win[:5], traj[35:40], atol=0)
    np.testing.assert_allclose(win[5:], np.tile(traj[-1], (4, 1)), atol=0)


def test_native_integrate_command():
    v = native.integrate_command([0.1, -0.2], [1.0, 2.0], 0.01)
    # reference interface:473: V channel reversed
    np.testing.assert_allclose(v, [0.1 - 0.01, -0.2 + 0.02], atol=1e-15)
