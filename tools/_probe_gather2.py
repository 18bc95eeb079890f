import time, numpy as np
import jax, jax.numpy as jnp

N = 32768
S, B = 99, 131072
nd = jnp.asarray(np.random.default_rng(0).uniform(1, 2, N).astype(np.float32))
idx2d = jnp.asarray(np.random.default_rng(1).integers(0, N, (S, B)).astype(np.int32))
idx1d = idx2d.reshape(-1)
ds2d = jnp.asarray(np.random.default_rng(2).uniform(0,1,(S,B)).astype(np.float32))

def timeit(label, f, *args, iters=10):
    r = f(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/iters
    n = S*B
    print(f"{label:44s} {dt*1e3:8.2f} ms ({dt/n*1e9:5.2f} ns/elem)", flush=True)

timeit("gather 2D idx -> (S,B)", jax.jit(lambda i: nd[i].sum()), idx2d)
timeit("gather 1D idx -> (SB,)", jax.jit(lambda i: nd[i].sum()), idx1d)
timeit("gather 1D + mult + sum", jax.jit(lambda i, d: (nd[i] * d.reshape(-1)).sum()), idx1d, ds2d)
timeit("gather 2D via flatten inside", jax.jit(lambda i, d: (nd[i.reshape(-1)].reshape(S,B) * d).sum()), idx2d, ds2d)
# take variant
timeit("jnp.take 1D", jax.jit(lambda i: jnp.take(nd, i).sum()), idx1d)
# scatter comparison
vals1d = ds2d.reshape(-1)
rf = jnp.zeros((N,), jnp.float32)
timeit("scatter-add 1D idx", jax.jit(lambda r_, i, v: r_.at[i].add(v)), rf, idx1d, vals1d)
timeit("scatter-add 2D idx arrays", jax.jit(lambda r_, i, v: r_.at[i.reshape(-1)].add(v.reshape(-1))), rf, idx2d, ds2d)
# segment-sum style: sort then add
def sorted_scatter(r_, i, v):
    si = jnp.argsort(i)
    return r_.at[i[si]].add(v[si], indices_are_sorted=True)
timeit("sort + sorted scatter-add", jax.jit(sorted_scatter), rf, idx1d, vals1d)
