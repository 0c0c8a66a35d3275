"""Decompose the config-5 cull pre-pass: slab mask vs list compaction.

The round-4 breakdown (probe_cfg5_breakdown) shows the pre-pass costs
more than the kernel sweep at 100k tris (152 vs ~105 ms per 2M-ray
quarter frame, mean list len 3.0 of 784): the frame is now
pre-pass-bound. This probe times the two halves separately:

  - block_cull_mask: per-ray slab tests [rays, NSUB] + 8-ray OR-fold
  - argsort compaction: stable argsort of ~gmask over NSUB columns

and A/Bs candidate replacements (bundle-level slab tests, top_k
compaction) for winner-exactness and time.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from esctp1raytracer_tpu import Camera
from esctp1raytracer_tpu.kernels import rt_tile
from esctp1raytracer_tpu.kernels.cull import block_cull_mask
from esctp1raytracer_tpu.scene import builders


def timed(label, fn, *args, iters=2, batches=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / iters)
    print(f"{label:52s} {best*1e3:9.1f} ms", flush=True)
    return best, out


scene = builders.random_scene(100_000)
cam = Camera.look_at((0, 18, 45), (0, 1, 0), vfov=60.0, aspect=3840/2160)
o, d = cam.ray_grid(3840, 2160)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
# 1/8 frame: the [rays, nsub] per-ray mask legs hold multiple f32 temps
# of that shape; 2M rays OOMs the 16 GB chip when timed un-streamed.
S = o.shape[0] // 8
o1, d1 = jax.block_until_ready(o[:S]), d[:S]

tc, aabbs, perm, _, _ = rt_tile.tri_constants_sub(scene.triangles)
nsub = aabbs.shape[1]
print(f"rays {S}, nsub {nsub}", flush=True)

# --- halves of the current pre-pass -------------------------------------
mask_fn = jax.jit(lambda oo, dd: block_cull_mask(oo, dd, aabbs, None))
_, mask = timed("per-ray slab mask [rays, nsub]", mask_fn, o1, d1)

gmask_fn = jax.jit(lambda oo, dd: jnp.any(
    block_cull_mask(oo, dd, aabbs, None).reshape(-1, 8, nsub), axis=1))
_, gmask = timed("slab mask + bundle OR-fold", gmask_fn, o1, d1)

sort_fn = jax.jit(lambda gm: (
    jnp.argsort(~gm, axis=1, stable=True).astype(jnp.int32),
    jnp.sum(gm, axis=1).astype(jnp.int32)))
timed("argsort compaction (current)", sort_fn, gmask)

full_fn = jax.jit(lambda oo, dd: rt_tile._cull_lists(oo, dd, None, aabbs))
_, (ids_ref, cnt_ref) = timed("full _cull_lists (current)", full_fn, o1, d1)

# --- candidate: top_k compaction ----------------------------------------
# All set blocks in ascending id order via one exact top_k. K must bound
# max(cnt); overflow falls back to the dense iota list (sweep everything,
# conservative-correct).
K = 256
iota = jnp.arange(nsub, dtype=jnp.int32)


def topk_lists(gm):
    vals = jnp.where(gm, nsub - iota, 0)          # descending val = asc id
    top, _ = jax.lax.top_k(vals, K)               # [bundles, K]
    ids = nsub - top                              # ascending block ids
    cnt = jnp.sum(gm, axis=1).astype(jnp.int32)
    over = cnt > K
    ids = jnp.where(over[:, None],
                    jnp.broadcast_to(iota[:K], ids.shape), ids)
    cnt = jnp.where(over, jnp.int32(nsub), cnt)   # would need wide kernel
    return ids.astype(jnp.int32), cnt


topk_fn = jax.jit(topk_lists)
_, (ids_tk, cnt_tk) = timed(f"top_k(K={K}) compaction", topk_fn, gmask)

cn_r, cn_t = np.asarray(cnt_ref), np.asarray(cnt_tk)
print(f"cnt agree: {(cn_r == cn_t).mean():.6f}  max cnt {cn_r.max()}",
      flush=True)
ir, it = np.asarray(ids_ref), np.asarray(ids_tk)
rows = np.arange(ir.shape[0])
pref_ok = all(
    (ir[r, :cn_r[r]] == it[r, :cn_r[r]]).all()
    for r in rows[:: max(1, len(rows)//1000)])
print(f"list prefix agree (sampled): {pref_ok}", flush=True)

# --- candidate: bundle-level interval slab test --------------------------
# All 8 rays of a bundle share one conservative slab test built from
# per-bundle component intervals (primary rays share an origin; direction
# intervals are tight for coherent pixels). Conservative: may keep a
# block no ray needs, never drops one a ray needs.
def bundle_cull_mask(oo, dd, boxes):
    ob = oo.reshape(-1, 8, 3)
    db = dd.reshape(-1, 8, 3)
    o_lo, o_hi = jnp.min(ob, axis=1), jnp.max(ob, axis=1)
    d_lo, d_hi = jnp.min(db, axis=1), jnp.max(db, axis=1)
    # Interval reciprocal of d: if the sign flips inside the bundle the
    # axis is unbounded -> that axis contributes (-inf, +inf) (no cull).
    flip = (d_lo <= 0.0) & (d_hi >= 0.0)
    inv_a = jnp.where(flip, -jnp.inf, 1.0 / jnp.where(flip, 1.0, d_hi))
    inv_b = jnp.where(flip, jnp.inf, 1.0 / jnp.where(flip, 1.0, d_lo))
    inv_lo = jnp.minimum(inv_a, inv_b)
    inv_hi = jnp.maximum(inv_a, inv_b)
    bmin = boxes[0:3].T  # [nsub, 3]
    bmax = boxes[3:6].T
    tn = jnp.full((ob.shape[0], bmin.shape[0]), -jnp.inf, jnp.float32)
    tf = jnp.full((ob.shape[0], bmin.shape[0]), jnp.inf, jnp.float32)
    for a in range(3):
        # interval (bmin - o) and (bmax - o)
        lo1 = bmin[None, :, a] - o_hi[:, a:a+1]
        hi1 = bmin[None, :, a] - o_lo[:, a:a+1]
        lo2 = bmax[None, :, a] - o_hi[:, a:a+1]
        hi2 = bmax[None, :, a] - o_lo[:, a:a+1]
        il, ih = inv_lo[:, a:a+1], inv_hi[:, a:a+1]

        def imul(lo, hi):
            c1, c2 = lo * il, lo * ih
            c3, c4 = hi * il, hi * ih
            return (jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4)),
                    jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4)))

        l1, h1 = imul(lo1, hi1)
        l2, h2 = imul(lo2, hi2)
        near = jnp.minimum(l1, l2)   # conservative entry
        far = jnp.maximum(h1, h2)    # conservative exit
        tn = jnp.maximum(tn, near)
        tf = jnp.minimum(tf, far)
    return (tn <= tf) & (tf >= 0.0)


bslab_fn = jax.jit(lambda oo, dd: bundle_cull_mask(oo, dd, aabbs))
_, bmask = timed("bundle-interval slab mask [bundles, nsub]", bslab_fn,
                 o1, d1)
gm, bm = np.asarray(gmask), np.asarray(bmask)
missed = (gm & ~bm).sum()
extra = (~gm & bm).sum()
print(f"bundle-interval: missed {missed} (MUST be 0), extra kept "
      f"{extra} (+{extra/max(gm.sum(),1)*100:.1f}% blocks)", flush=True)

comb_fn = jax.jit(lambda oo, dd: topk_lists(bundle_cull_mask(oo, dd, aabbs)))
timed("bundle slab + top_k (candidate pre-pass)", comb_fn, o1, d1)

# --- span statistics: are per-bundle candidate blocks contiguous? --------
# Blocks are Morton-ordered, so a bundle's needed sub-blocks may form a
# tight run; a (first, len) span needs NO argsort and NO ids list at all.
def span_stats(name, gm):
    gm = np.asarray(gm)
    any_row = gm.any(axis=1)
    first = gm.argmax(axis=1)
    last = gm.shape[1] - 1 - gm[:, ::-1].argmax(axis=1)
    span = np.where(any_row, last - first + 1, 0)
    cnt = gm.sum(axis=1)
    print(f"{name}: cnt mean {cnt.mean():.2f} p99 "
          f"{np.percentile(cnt, 99):.0f} max {cnt.max()} | span mean "
          f"{span.mean():.2f} p99 {np.percentile(span, 99):.0f} max "
          f"{span.max()} | sweep-inflation x"
          f"{span.sum() / max(cnt.sum(), 1):.2f}", flush=True)

span_stats("cfg5 primary", gmask)

# Flagship scene (bench.py's 10.2k-tri build), primary wavefront @1080p.
fl = builders.scene_from_mesh([
    builders.icosphere_mesh(subdivisions=4, radius=1.0, center=(-1.3, 1.0, 0.0)),
    builders.icosphere_mesh(subdivisions=4, radius=1.0, center=(1.3, 1.0, 0.0),
                            smooth=False),
    builders._ground_plane(),
    builders._area_light(center=(0.0, 6.0, 2.0), half=1.5),
])
fcam = Camera.look_at((0.0, 2.0, 6.0), (0.0, 1.0, 0.0), vfov=60.0,
                      aspect=1920 / 1080)
fo, fd = fcam.ray_grid(1920, 1080)
fo, fd = fo.reshape(-1, 3), fd.reshape(-1, 3)
ftc, faabbs, *_ = rt_tile.tri_constants_sub(fl.triangles)
fns = faabbs.shape[1]
fgm_fn = jax.jit(lambda oo, dd: jnp.any(
    block_cull_mask(oo, dd, faabbs, None).reshape(-1, 8, fns), axis=1))
fgmask = jax.block_until_ready(fgm_fn(fo, fd))
span_stats("flagship primary", fgmask)
fb_fn = jax.jit(lambda oo, dd: bundle_cull_mask(oo, dd, faabbs))
fbm = np.asarray(jax.block_until_ready(fb_fn(fo, fd)))
fgm = np.asarray(fgmask)
print(f"flagship bundle-interval: missed {(fgm & ~fbm).sum()} extra "
      f"{(~fgm & fbm).sum()} (+{(~fgm & fbm).sum()/max(fgm.sum(),1)*100:.1f}%)",
      flush=True)
span_stats("flagship primary (interval mask)", fbm)

# --- candidate: K-step ascending extraction (argsort replacement) --------
# Extract the set block ids in ascending order with K min-reductions
# (each O(nsub) on the VPU) instead of a full 784-column sort network.
# Exact for cnt <= K; overflow bundles (cnt > K) fall back to the dense
# iota row (sweep everything) — conservative-correct, never wrong.
def extract_lists(gm, K):
    nb, ns = gm.shape
    iot = jnp.arange(ns, dtype=jnp.int32)
    big = jnp.int32(ns)
    masked = jnp.where(gm, iot, big)
    cols = []
    last = jnp.full((nb, 1), -1, jnp.int32)
    for _ in range(K):
        cur = jnp.min(jnp.where(masked > last, masked, big), axis=1,
                      keepdims=True)
        cols.append(cur)
        last = cur
    ids_k = jnp.concatenate(cols, axis=1)          # [nb, K] ascending
    cnt = jnp.sum(gm, axis=1).astype(jnp.int32)
    over = cnt > K
    tail = jnp.broadcast_to(iot[None, K:], (nb, ns - K))
    ids = jnp.concatenate([ids_k, tail], axis=1)
    ids = jnp.where(over[:, None], iot[None, :], ids)
    cnt = jnp.where(over, jnp.int32(ns), cnt)
    return ids.astype(jnp.int32), cnt

for K in (8, 16, 32):
    ex_fn = jax.jit(lambda gm, K=K: extract_lists(gm, K))
    _, (ids_ex, cnt_ex) = timed(f"extract(K={K}) compaction", ex_fn, gmask)
ce = np.asarray(cnt_ex)
ie = np.asarray(ids_ex)
ok = (ce == cn_r).all() and all(
    (ie[r, :cn_r[r]] == ir[r, :cn_r[r]]).all()
    for r in range(0, len(ce), max(1, len(ce)//1000)))
print(f"extract(K=32) exact vs argsort: {ok}", flush=True)

comb2 = jax.jit(lambda oo, dd: extract_lists(bundle_cull_mask(oo, dd, aabbs), 16))
timed("bundle slab + extract16 (candidate total)", comb2, o1, d1)

# --- shadow-wavefront exactness of the interval test ---------------------
# Shadow rays: origin = per-pixel hit point (differs within a bundle),
# direction = toward a sampled light point. Build the real shadow
# wavefront for cfg5 and compare per-ray-OR vs bundle-interval masks,
# including the t_limit ceiling.
from esctp1raytracer_tpu.core.intersect import closest_hit
from esctp1raytracer_tpu import RenderConfig
eps = jnp.float32(np.finfo(np.float32).eps)
t1, i1 = jax.jit(lambda: rt_tile.tile_tri_search(o1, d1, scene.triangles,
                                                 eps))()
hitm = np.asarray(i1) >= 0
tt = np.asarray(t1)
hp = np.asarray(o1) + np.asarray(d1) * (tt[:, None] - 1e-4)
lp = np.array([0.0, 30.0, 0.0], np.float32)   # a plausible light point
sd = lp[None] - hp
dist = np.linalg.norm(sd, axis=1, keepdims=True)
sd = sd / np.maximum(dist, 1e-9)
tl = np.where(hitm, dist[:, 0] - 1e-3, -1.0).astype(np.float32)
so, sdir = jnp.asarray(hp.astype(np.float32)), jnp.asarray(sd.astype(np.float32))
stl = jnp.asarray(tl)

sg_fn = jax.jit(lambda: jnp.any(
    block_cull_mask(so, sdir, aabbs, stl).reshape(-1, 8, nsub), axis=1))
sgm = np.asarray(jax.block_until_ready(sg_fn()))

def bundle_cull_mask_tl(oo, dd, tlim, boxes):
    m = bundle_cull_mask(oo, dd, boxes)
    # conservative ceiling: a block survives if ANY ray's ceiling could
    # reach it — use the bundle max of t_limit against the block's
    # conservative entry t. Recompute tn inside for the ceiling compare.
    return m  # ceiling handled separately below

sb_fn = jax.jit(lambda: bundle_cull_mask(so, sdir, aabbs))
sbm = np.asarray(jax.block_until_ready(sb_fn()))
print(f"shadow interval (no ceiling): missed {(sgm & ~sbm).sum()} extra "
      f"{(~sgm & sbm).sum()} (+{(~sgm & sbm).sum()/max(sgm.sum(),1)*100:.1f}%)",
      flush=True)
span_stats("cfg5 shadow", sgm)
