"""Finite-difference gradient checks — the BASELINE.json correctness
metric: pixel gradients w.r.t. sphere centers/radii, triangle vertices,
and material albedo/specular must match finite differences (away from
visibility discontinuities). The reference has no gradients at all
(SURVEY.md §3.5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esctp1raytracer_tpu import Camera, RenderConfig, render, sphere_plane_scene
from esctp1raytracer_tpu.scene.builders import mixed_scene

CAM = Camera.look_at((0, 2, 6), (0, 1, 0), aspect=1.0)
CFG = RenderConfig()
N = 48


def _loss_fn(scene):
    # A smooth scalar of the image; masks out nothing so every parameter
    # can influence it.
    img = render(scene, CAM, N, N, CFG)
    return jnp.sum(img * jnp.cos(0.1 * jnp.arange(img.size).reshape(img.shape)))


def _fd_check(scene, get, set_, eps, rtol, atol):
    """Central finite difference on a scalar parameter vs autodiff."""
    grad = jax.grad(lambda s: _loss_fn(s), allow_int=True)(scene)
    g_auto = float(get(grad))
    base = float(get(scene))
    lo = _loss_fn(set_(scene, base - eps))
    hi = _loss_fn(set_(scene, base + eps))
    g_fd = float((hi - lo) / (2 * eps))
    assert np.isfinite(g_auto)
    np.testing.assert_allclose(g_auto, g_fd, rtol=rtol, atol=atol)
    return g_auto


def _set_field(scene, path, value):
    """Return a scene with scene.<path[0]>.<path[1]>[idx] = value."""
    buf_name, field, idx = path
    buf = getattr(scene, buf_name)
    arr = getattr(buf, field).at[idx].set(value)
    new_buf = dataclasses.replace(buf, **{field: arr})
    return dataclasses.replace(scene, **{buf_name: new_buf})


def _get_field(tree, path):
    buf_name, field, idx = path
    return getattr(getattr(tree, buf_name), field)[idx]


@pytest.fixture(scope="module")
def scene():
    return sphere_plane_scene()


class TestGradients:
    def test_sphere_center(self, scene):
        path = ("spheres", "center", (0, 1))  # y of the sphere center
        g = _fd_check(
            scene,
            lambda s: _get_field(s, path),
            lambda s, v: _set_field(s, path, v),
            eps=2e-3, rtol=0.08, atol=2e-2,
        )
        assert g != 0.0

    def test_sphere_radius(self, scene):
        path = ("spheres", "radius", 0)
        g = _fd_check(
            scene,
            lambda s: _get_field(s, path),
            lambda s, v: _set_field(s, path, v),
            eps=2e-3, rtol=0.08, atol=2e-2,
        )
        assert g != 0.0

    def test_material_diffuse(self, scene):
        path = ("spheres", "kd", (0, 0))
        _fd_check(
            scene,
            lambda s: _get_field(s, path),
            lambda s, v: _set_field(s, path, v),
            eps=1e-3, rtol=0.02, atol=1e-3,
        )

    def test_material_specular(self, scene):
        path = ("spheres", "ks", (0, 0))
        _fd_check(
            scene,
            lambda s: _get_field(s, path),
            lambda s, v: _set_field(s, path, v),
            eps=1e-3, rtol=0.05, atol=1e-3,
        )

    def test_triangle_vertex(self, scene):
        # Ground-plane vertex y: moves shading positions smoothly.
        path = ("triangles", "v0", (0, 1))
        g = _fd_check(
            scene,
            lambda s: _get_field(s, path),
            lambda s, v: _set_field(s, path, v),
            eps=2e-3, rtol=0.15, atol=5e-2,
        )
        assert np.isfinite(g)

    def test_light_vertex_grad_flows(self, scene):
        # The sampled light point P depends on light-triangle vertices;
        # gradient must flow into them.
        grads = jax.grad(_loss_fn, allow_int=True)(scene)
        light_tri = int(scene.lights.tri_idx[0, 0])
        gv = np.asarray(grads.triangles.v0)[light_tri]
        assert np.isfinite(gv).all()

    def test_no_nan_grads_anywhere(self):
        scene = mixed_scene()
        cam = Camera.look_at((0, 2.5, 7), (0, 1, 0), aspect=1.0)
        cfg = RenderConfig(depth=3)

        def loss(s):
            return jnp.sum(render(s, cam, 32, 32, cfg))

        grads = jax.grad(loss, allow_int=True)(scene)
        leaves = jax.tree.leaves(grads)
        for leaf in leaves:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert bool(jnp.isfinite(leaf).all()), "non-finite gradient leaf"
