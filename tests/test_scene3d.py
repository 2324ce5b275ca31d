"""3-D scene rendering artifacts (reference result-GIF family,
/root/reference/README.md:89-98) and the host-side FK twin."""

import numpy as np
import pytest

from mmmpc_tpu.models.arm import arm_fk, arm_fk_np
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.runtime.scene3d import scene3d_animation, scene3d_plot


def test_arm_fk_np_matches_jax():
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.uniform([-np.pi / 2, -np.pi, 0], [np.pi / 2, 0, 3 * np.pi / 2])
        ee_j, j2_j, j3_j = arm_fk(q)
        ee_n, j2_n, j3_n = arm_fk_np(q)
        np.testing.assert_allclose(np.asarray(ee_j), ee_n, atol=1e-12)
        np.testing.assert_allclose(np.asarray(j2_j), j2_n, atol=1e-12)
        np.testing.assert_allclose(np.asarray(j3_j), j3_n, atol=1e-12)


def _fake_log(T=12):
    t = np.linspace(0, 1, T)
    x = np.zeros((T, 9))
    x[:, 0] = 3 * t
    x[:, 1] = 0.5 * np.sin(2 * t)
    x[:, 2] = 0.3 * t
    x[:, 6] = -0.5 * t
    x[:, 7] = -1.0 + 0.4 * t
    x[:, 8] = 1.0 + 0.5 * t
    return x


def test_scene3d_plot_writes_artifact(tmp_path):
    path = tmp_path / "scene3d.png"
    scene3d_plot(
        _fake_log(),
        obstacles=[Obstacles(1.5, 0.5, 0.3)],
        halfplanes=[(np.array([2.0, 0.0, 1.2]),
                     np.array([[0.0, 0.0, 1.0]]))],
        target=np.array([3.2, 0.4, 1.1]),
        save_path=str(path))
    assert path.exists() and path.stat().st_size > 10_000


def test_scene3d_animation_writes_gif(tmp_path):
    path = tmp_path / "scene3d.gif"
    scene3d_animation(_fake_log(8), obstacles=[Obstacles(1.0, 0.0, 0.2)],
                      target=np.array([2.5, 0.0, 1.0]),
                      save_path=str(path), fps=5, stride=2)
    assert path.exists() and path.stat().st_size > 5_000


def test_interface_plot3d_emits_scene(tmp_path):
    """Interface.plot3D(save_dir) must include the 3-D scene artifact."""
    from demo_wholebody_qref import build_world

    world = build_world(0, physical_sim=False)
    world.x_log = list(_fake_log())
    world.u_log = list(np.zeros((11, 5)))
    world.manipulator_pose_log = [np.zeros(10)] * 12
    world.endpoint_relative_pos_log = [np.zeros(3)] * 12
    world.plot3D(save_dir=str(tmp_path))
    assert (tmp_path / "scene3d.png").exists()
