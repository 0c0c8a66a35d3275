"""Inverse rendering: fit scene parameters to a target image.

The capability the reference lacks entirely (SURVEY.md §3.5): gradient
descent on any float scene parameter (sphere centers/radii, triangle
vertices, material albedo/specular) through the differentiable renderer,
optionally sharded over a device mesh with psum'd gradients, with
checkpoint/resume between steps.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from esctp1raytracer_tpu.core.camera import Camera
from esctp1raytracer_tpu.core.render import RenderConfig, render
from esctp1raytracer_tpu.parallel.sharding import (
    float_params,
    loss_and_grad_sharded,
    merge_params,
)
from esctp1raytracer_tpu.scene.types import Scene
from esctp1raytracer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from esctp1raytracer_tpu.utils.debug import get_logger

logger = get_logger(__name__)


def adam_init(params: Sequence[jax.Array]):
    zeros = [jnp.zeros_like(p) for p in params]
    return {"m": zeros, "v": [jnp.zeros_like(p) for p in params],
            "t": jnp.zeros((), jnp.int32)}


def adam_update(params, grads, state, lr=1e-2, b1=0.9, b2=0.999, eps=1e-8):
    t = state["t"] + 1
    m = [b1 * m_ + (1 - b1) * g for m_, g in zip(state["m"], grads)]
    v = [b2 * v_ + (1 - b2) * g * g for v_, g in zip(state["v"], grads)]
    tf = t.astype(jnp.float32)
    mhat = [m_ / (1 - b1 ** tf) for m_ in m]
    vhat = [v_ / (1 - b2 ** tf) for v_ in v]
    new_params = [
        p - lr * mh / (jnp.sqrt(vh) + eps)
        for p, mh, vh in zip(params, mhat, vhat)
    ]
    return new_params, {"m": m, "v": v, "t": t}


@dataclass
class OptimizeResult:
    scene: Scene
    losses: List[float]
    steps: int


def fit_scene(
    scene: Scene,
    target: jax.Array,  # [H, W, 3]
    camera: Camera,
    steps: int = 100,
    lr: float = 1e-2,
    cfg: RenderConfig = RenderConfig(),
    mesh=None,
    param_filter: Optional[Callable[[int, jax.Array], bool]] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 25,
    log_every: int = 10,
) -> OptimizeResult:
    """Adam-optimize the scene's float parameters toward `target`.

    `param_filter(i, leaf) -> bool` freezes parameters it rejects (their
    gradients are zeroed) — e.g. keep geometry fixed and fit materials.
    With `mesh` set, the forward/backward shards rays across devices and
    all-reduces scene gradients (parallel/sharding.py); otherwise the
    single-device renderer is differentiated directly.
    """
    start_step = 0
    resume_extra: Dict[str, np.ndarray] = {}
    # Every process loads the checkpoint (all hold the replicated scene;
    # resuming only on process 0 would make the processes diverge).
    if checkpoint_path:
        try:
            scene, start_step, resume_extra = load_checkpoint(checkpoint_path, scene)
            logger.info("resumed from %s at step %d", checkpoint_path, start_step)
        except FileNotFoundError:
            pass

    height, width = target.shape[0], target.shape[1]

    if mesh is None:
        def loss_and_grad(ps):
            def loss_fn(ps):
                img = render(merge_params(scene, ps), camera, width, height, cfg)
                return jnp.mean((img - target) ** 2)
            return jax.value_and_grad(loss_fn)(ps)
        loss_and_grad = jax.jit(loss_and_grad)
    else:
        def loss_and_grad(ps):
            return loss_and_grad_sharded(
                merge_params(scene, ps), target, camera, cfg, mesh
            )

    params = float_params(scene)
    state = adam_init(params)
    if "adam_t" in resume_extra:  # restore the optimizer moments too —
        # resetting them would change the optimization trajectory
        state = {
            "m": [jnp.asarray(resume_extra[f"adam_m_{i}"]) for i in range(len(params))],
            "v": [jnp.asarray(resume_extra[f"adam_v_{i}"]) for i in range(len(params))],
            "t": jnp.asarray(resume_extra["adam_t"], jnp.int32),
        }

    def adam_extra(st):
        extra = {"adam_t": st["t"]}
        for i, (m_, v_) in enumerate(zip(st["m"], st["v"])):
            extra[f"adam_m_{i}"] = m_
            extra[f"adam_v_{i}"] = v_
        return extra

    frozen = [
        param_filter is not None and not param_filter(i, p)
        for i, p in enumerate(params)
    ]

    losses: List[float] = []
    for step in range(start_step, steps):
        loss, grads = loss_and_grad(params)
        grads = [jnp.zeros_like(g) if frz else g for g, frz in zip(grads, frozen)]
        params, state = adam_update(params, grads, state, lr=lr)
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            logger.info("step %d loss %.6g", step, losses[-1])
        if checkpoint_path and checkpoint_every and (step + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, merge_params(scene, params),
                            step + 1, extra=adam_extra(state))

    final = merge_params(scene, params)
    if checkpoint_path:
        save_checkpoint(checkpoint_path, final, steps, extra=adam_extra(state))
    return OptimizeResult(scene=final, losses=losses, steps=steps - start_step)
