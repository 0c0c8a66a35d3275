"""Inverse-rendering + checkpoint tests: recover perturbed scene
parameters by gradient descent on the rendered image."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from esctp1raytracer_tpu import Camera, RenderConfig, render, sphere_plane_scene
from esctp1raytracer_tpu.grad import fit_scene
from esctp1raytracer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

CAM = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
CFG = RenderConfig()
N = 32


@pytest.fixture(scope="module")
def scene():
    return sphere_plane_scene()


@pytest.fixture(scope="module")
def target(scene):
    return render(scene, CAM, N, N, CFG)


class TestCheckpoint:
    def test_roundtrip(self, scene, tmp_path):
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, scene, step=7, extra={"lr": np.float32(0.1)})
        restored, step, extra = load_checkpoint(path, scene)
        assert step == 7
        assert float(extra["lr"]) == pytest.approx(0.1)
        for a, b in zip(
            __import__("jax").tree.leaves(scene),
            __import__("jax").tree.leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, scene, tmp_path):
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, scene)
        other = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(
                scene.spheres, center=jnp.zeros((16, 3), jnp.float32),
                radius=jnp.zeros((16,), jnp.float32),
                ka=jnp.zeros((16, 3)), kd=jnp.zeros((16, 3)),
                ks=jnp.zeros((16, 3)), ke=jnp.zeros((16, 3)),
                ns=jnp.zeros((16,)), valid=jnp.zeros((16,), bool),
            ),
        )
        with pytest.raises(ValueError):
            load_checkpoint(path, other)

    def test_missing_file_raises(self, scene, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_checkpoint(str(tmp_path / "nope.npz"), scene)


class TestFit:
    def test_recovers_material(self, scene, target, tmp_path):
        # Perturb the sphere diffuse color; fit should recover it.
        perturbed = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(scene.spheres, kd=scene.spheres.kd * 0.4),
        )
        result = fit_scene(
            perturbed, target, CAM, steps=60, lr=0.08, cfg=CFG, log_every=0,
            # fit only the sphere diffuse color; freeze everything else
            param_filter=lambda i, p: p is perturbed.spheres.kd,
        )
        assert result.losses[-1] < result.losses[0] * 0.25
        got = np.asarray(result.scene.spheres.kd[0])
        want = np.asarray(scene.spheres.kd[0])
        start = np.asarray(perturbed.spheres.kd[0])
        # recovered most of the perturbation
        assert np.abs(got - want).max() < np.abs(start - want).max() * 0.25

    def test_param_filter_freezes(self, scene, target):
        perturbed = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(scene.spheres, kd=scene.spheres.kd * 0.4),
        )
        result = fit_scene(
            perturbed, target, CAM, steps=3, lr=0.05, cfg=CFG, log_every=0,
            param_filter=lambda i, p: False,  # everything frozen
        )
        for a, b in zip(
            __import__("jax").tree.leaves(perturbed.spheres),
            __import__("jax").tree.leaves(result.scene.spheres),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_resume(self, scene, target, tmp_path):
        path = str(tmp_path / "fit.npz")
        perturbed = dataclasses.replace(
            scene,
            spheres=dataclasses.replace(scene.spheres, kd=scene.spheres.kd * 0.5),
        )
        fit_scene(perturbed, target, CAM, steps=4, lr=0.05, cfg=CFG,
                  checkpoint_path=path, checkpoint_every=2, log_every=0)
        assert os.path.exists(path)
        _, step, _ = load_checkpoint(path, perturbed)
        assert step == 4
        # Resuming starts from the saved step.
        result = fit_scene(perturbed, target, CAM, steps=6, lr=0.05, cfg=CFG,
                           checkpoint_path=path, checkpoint_every=10, log_every=0)
        assert result.steps == 2
