"""Pallas lane-kernel tests (interpret mode on CPU).

Cross-backend golden equality is the SURVEY.md §4 strategy: the reference
validated its ISPC kernel against the C++ loop by comparing rendered
images; here the Pallas kernels are validated against the jnp search the
same way (plus index-level agreement).

The round-1 "bundle" kernel (hit_pallas.py) that this file originally
covered was retired in round 5 — it won no measured regime vs
lane/mxtile/tile (ROOFLINE.md); its cull pre-pass utilities moved to
kernels/cull.py (tested in tests/test_cullmode.py) and the "pallas"
backend name became a deprecated alias of "auto" (tested below). The
tile/mxtile kernel families have their own suites (test_rt_tile.py,
test_cullmode.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from esctp1raytracer_tpu import Camera, RenderConfig, cornell_box, render
from esctp1raytracer_tpu.core.intersect import EPS, argmin_hit

CAM = Camera.look_at((0, 1, 2), (0, 1, 0), aspect=1.0)


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


class TestLaneKernel:
    """Ray-lane brute-force kernel (kernels/lane_pallas.py) — the small-
    table fast path (every VPU lane a ray, scalar loop over triangles)."""

    def test_matches_jnp_search(self, cornell):
        from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

        o, d = CAM.ray_grid(64, 64)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t_ref, p_ref, _ = argmin_hit(o, d, cornell, EPS, use_mxu=False)
        t, p = lane_tri_search(o, d, cornell.triangles, EPS)
        # Plane+barycentric constants round differently from direct MT at
        # the eps acceptance window — the standard cross-backend quirk-16
        # tolerance: a handful of borderline flips, identical elsewhere.
        agree = np.asarray(p) == np.asarray(p_ref)
        assert agree.mean() > 0.995
        hit = (np.asarray(p_ref) >= 0) & agree
        np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(t_ref)[hit],
                                   rtol=2e-6)

    def test_nonmultiple_ray_count(self, cornell):
        from esctp1raytracer_tpu.kernels.lane_pallas import lane_tri_search

        o, d = CAM.ray_grid(19, 13)  # 247 rays
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        t, p = lane_tri_search(o, d, cornell.triangles, EPS)
        assert t.shape == (247,)
        assert (np.asarray(p) < 36).all()

    def test_capacity_limit(self, cornell):
        import dataclasses

        from esctp1raytracer_tpu.kernels.lane_pallas import (
            LANE_TRI_LIMIT, lane_tri_search)

        big = dataclasses.replace(
            cornell.triangles,
            v0=jnp.zeros((LANE_TRI_LIMIT + 512, 3), jnp.float32),
        )
        with pytest.raises(ValueError):
            lane_tri_search(jnp.zeros((8, 3)), jnp.zeros((8, 3)), big, EPS)

    def test_render_matches_jnp_backend(self, cornell):
        a = np.asarray(render(cornell, CAM, 64, 64, RenderConfig(backend="jnp")))
        b = np.asarray(render(cornell, CAM, 64, 64, RenderConfig(backend="lane")))
        diff = np.abs(a - b).max(-1)
        assert (diff > 1e-3).mean() < 0.005


class TestPallasAlias:
    """backend="pallas" must keep rendering (deprecated alias of "auto")."""

    def test_alias_resolves_and_matches_jnp(self, cornell):
        from esctp1raytracer_tpu.core.render import resolve_backend

        cfg = RenderConfig(backend="pallas")
        resolved = resolve_backend(cfg, cornell)
        assert resolved in ("fused", "lane", "mxtile", "tile")
        a = np.asarray(render(cornell, CAM, 48, 48, RenderConfig(backend="jnp")))
        b = np.asarray(render(cornell, CAM, 48, 48, cfg))
        diff = np.abs(a - b).max(-1)
        assert (diff > 1e-2).mean() < 0.005
