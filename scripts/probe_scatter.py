"""Standalone cost of the backward's table scatter-add, plus variants.

The flagship backward's 102 ms is the VJP of packed table gathers:
scatter-add of [R=2.07M, C] cotangent rows into [N=10752, C] tables.
Variants measured: plain jnp.take VJP, pre-sorted indices, segment_sum,
and a bundle-local pre-reduction (winners are spatially coherent).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

R, N, C = 2073600, 10752, 32
key = jax.random.PRNGKey(0)
# realistic coherent winners: neighboring rays hit the same triangle
base = jax.random.randint(key, (R // 16,), 0, N)
idx = jnp.repeat(base, 16).astype(jnp.int32)
ct = jax.random.normal(jax.random.PRNGKey(1), (R, C), jnp.float32)
table = jnp.zeros((N, C), jnp.float32)

def timed(label, fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    print(f"{label:38s} {(time.time()-t0)/iters*1e3:9.1f} ms", flush=True)

# 1. the VJP scatter as jnp.take produces it
f1 = jax.jit(lambda i, c: jax.vjp(lambda t: jnp.take(t, i, axis=0), table)[1](c)[0])
timed("take-VJP scatter-add", f1, idx, ct)

# 2. explicit scatter-add via .at[].add
f2 = jax.jit(lambda i, c: table.at[i].add(c))
timed(".at[].add", f2, idx, ct)

# 3. sort-then-scatter (indices_are_sorted path)
def f3(i, c):
    si, perm = jax.lax.sort_key_val(i, jnp.arange(R, dtype=jnp.int32))
    sc = jnp.take(c, perm, axis=0)
    return table.at[si].add(sc, indices_are_sorted=True)
timed("sort + sorted scatter-add", jax.jit(f3), idx, ct)

# 4. segment_sum
f4 = jax.jit(lambda i, c: jax.ops.segment_sum(c, i, num_segments=N))
timed("segment_sum", f4, idx, ct)

# 5. local pre-reduction: within 16-ray runs, sum rows sharing one winner
#    (general form: one scatter at 1/16 the updates after an in-run
#    compare+prefix trick; here approximate the best case with all-equal runs)
def f5(i, c):
    ir = i.reshape(-1, 16)
    cr = c.reshape(-1, 16, C)
    lead = ir[:, 0]
    same = jnp.all(ir == lead[:, None], axis=1)
    # coherent runs: one summed update; incoherent: fall back per-row
    summed = jnp.sum(cr, axis=1)
    upd_coh = jnp.where(same[:, None], summed, 0.0)
    out = table.at[lead].add(upd_coh)
    upd_rest = jnp.where(same[:, None, None], 0.0, cr)
    return out.at[ir.reshape(-1)].add(upd_rest.reshape(-1, C))
timed("bundle pre-reduce + 2 scatters", jax.jit(f5), idx, ct)

# 6. one-hot matmul over ray chunks (MXU segment sum)
def f6(i, c):
    CH = 4096
    def body(acc, args):
        ic, cc = args
        oh = jax.nn.one_hot(ic, N, dtype=jnp.bfloat16)
        return acc + jnp.dot(oh.T, cc.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), None
    acc, _ = jax.lax.scan(body, jnp.zeros((N, C), jnp.float32),
                          (i.reshape(-1, CH), c.reshape(-1, CH, C)))
    return acc
timed("one-hot bf16 matmul (chunked)", jax.jit(f6), idx, ct)
