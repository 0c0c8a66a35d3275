#!/usr/bin/env python
"""Inverse rendering demo: recover a sphere's position and color from a
target image by gradient descent through the renderer — the capability
the reference C++ tracer cannot express at all.

    python examples/inverse_rendering.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import esctp1raytracer_tpu as rt
from esctp1raytracer_tpu.grad import fit_scene


def main():
    true_scene = rt.sphere_plane_scene()
    cam = rt.Camera.look_at((0, 2, 6), (0, 1, 0), vfov=60.0, aspect=1.0)
    cfg = rt.RenderConfig()
    target = rt.render(true_scene, cam, 96, 96, cfg)

    # Perturb the sphere's color and specular. (Geometry offsets can be
    # fitted too, but position gradients flow only through shading — the
    # fixed-winner hit selection is silhouette-blind, the standard
    # differentiable-ray-tracing caveat — so materials make the crisp
    # demo.)
    start = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(
            true_scene.spheres,
            kd=true_scene.spheres.kd * 0.4,
            ks=true_scene.spheres.ks * 0.1,
        ),
    )

    ckpt = "/tmp/inverse_demo.npz"
    if os.path.exists(ckpt):
        os.unlink(ckpt)  # fresh demo run (fit_scene would resume otherwise)
    result = fit_scene(
        start, target, cam, steps=100, lr=0.02, cfg=cfg,
        param_filter=lambda i, p: p is start.spheres.kd or p is start.spheres.ks,
        checkpoint_path=ckpt, checkpoint_every=50,
        log_every=20,
    )

    print(f"loss: {result.losses[0]:.5f} -> {result.losses[-1]:.5f}")
    print("kd: true", np.asarray(true_scene.spheres.kd[0]),
          "recovered", np.asarray(result.scene.spheres.kd[0]))
    print("ks: true", np.asarray(true_scene.spheres.ks[0]),
          "recovered", np.asarray(result.scene.spheres.ks[0]))
    rt.write_ppm("/tmp/inverse_before.ppm",
                 np.asarray(rt.render(start, cam, 96, 96, cfg)))
    rt.write_ppm("/tmp/inverse_after.ppm",
                 np.asarray(rt.render(result.scene, cam, 96, 96, cfg)))
    print("wrote /tmp/inverse_before.ppm and /tmp/inverse_after.ppm")


if __name__ == "__main__":
    main()
