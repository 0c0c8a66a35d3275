"""Backward cost by parameter group + sanity check of the take-VJP timing."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from esctp1raytracer_tpu import Camera, RenderConfig
from esctp1raytracer_tpu.core.render import trace_rays
from esctp1raytracer_tpu.scene.builders import (
    _area_light, _ground_plane, icosphere_mesh, scene_from_mesh,
)

def timed(label, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt

# --- sanity: is the take-VJP scatter really 0.2 ms? check vs segment_sum
R, N, C = 2073600, 10752, 32
base = jax.random.randint(jax.random.PRNGKey(0), (R // 16,), 0, N)
idx = jnp.repeat(base, 16).astype(jnp.int32)
ct = jax.random.normal(jax.random.PRNGKey(1), (R, C), jnp.float32)
table = jnp.zeros((N, C), jnp.float32)
f1 = jax.jit(lambda i, c: jax.vjp(lambda t: jnp.take(t, i, axis=0), table)[1](c)[0])
f4 = jax.jit(lambda i, c: jax.ops.segment_sum(c, i, num_segments=N))
a, b = np.asarray(f1(idx, ct)), np.asarray(f4(idx, ct))
print("take-VJP == segment_sum:", np.allclose(a, b, rtol=1e-5, atol=1e-3),
      "max|d|:", np.abs(a - b).max(), flush=True)
timed("take-VJP scatter (recheck)", f1, idx, ct)

# --- per-group backward cost
scene = scene_from_mesh([
    icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
    icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0), smooth=False),
    _ground_plane(),
    _area_light(center=(0.0, 6.0, 2.0), half=1.5),
])
cam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0, aspect=1920/1080)
o, d = cam.ray_grid(1920, 1080)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
cfg = RenderConfig(backend="tile", ray_chunk=0, block_size=512, depth=1)

import jax.tree_util as jtu
leaves_p, treedef = jtu.tree_flatten_with_path(scene)
float_ix = [i for i, (p, l) in enumerate(leaves_p)
            if jnp.issubdtype(l.dtype, jnp.floating)]
names = [jtu.keystr(leaves_p[i][0]) for i in float_ix]
print("float leaves:", names, flush=True)
all_leaves = [l for _, l in leaves_p]

def loss_subset(sub_vals, sub_pos):
    leaves = list(all_leaves)
    for v, i in zip(sub_vals, sub_pos):
        leaves[i] = v
    sc = jtu.tree_unflatten(treedef, leaves)
    c = trace_rays(o, d, sc, ids, cfg)
    return jnp.sum(c * c)

groups = {
    "verts (v0,v1,v2)": [i for i, n in zip(float_ix, names) if ".v" in n],
    "normals (n0..n2)": [i for i, n in zip(float_ix, names) if ".n0" in n or ".n1" in n or ".n2" in n],
    "materials tris":   [i for i, n in zip(float_ix, names) if any(k in n for k in (".ka", ".kd", ".ks", ".ke", ".ns"))],
    "uv":               [i for i, n in zip(float_ix, names) if ".uv" in n],
    "all":              float_ix,
}
for label, pos in groups.items():
    if not pos:
        continue
    vals = [all_leaves[i] for i in pos]
    g = jax.jit(jax.grad(lambda vs: loss_subset(vs, pos)))
    timed(f"fwd+bwd wrt {label} ({len(pos)})", g, vals)
