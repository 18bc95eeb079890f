import time, numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 32768
B = 131072
nd = jnp.asarray(np.random.default_rng(0).uniform(1, 2, N).astype(np.float32))
idx = jnp.asarray(np.random.default_rng(1).integers(0, N, B).astype(np.int32))

# 1) vector gather from VMEM table
def gather_kernel(nd_ref, idx_ref, out_ref):
    out_ref[:] = nd_ref[idx_ref[:]]

try:
    f = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(f)
    r = jf(nd, idx); jax.block_until_ready(r)
    ok = np.allclose(np.asarray(r), np.asarray(nd)[np.asarray(idx)])
    t0=time.perf_counter()
    for _ in range(20): r = jf(nd, idx)
    jax.block_until_ready(r)
    print(f"VMEM vector gather: OK correct={ok}  {(time.perf_counter()-t0)/20*1e6:.0f} us for {B} elems", flush=True)
except Exception as e:
    print("VMEM vector gather FAILED:", type(e).__name__, str(e)[:300], flush=True)

# 2) jnp.take inside kernel
def take_kernel(nd_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(nd_ref[:], idx_ref[:], axis=0)

try:
    f2 = pl.pallas_call(
        take_kernel,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf2 = jax.jit(f2)
    r2 = jf2(nd, idx); jax.block_until_ready(r2)
    ok = np.allclose(np.asarray(r2), np.asarray(nd)[np.asarray(idx)])
    t0=time.perf_counter()
    for _ in range(20): r2 = jf2(nd, idx)
    jax.block_until_ready(r2)
    print(f"VMEM jnp.take: OK correct={ok}  {(time.perf_counter()-t0)/20*1e6:.0f} us", flush=True)
except Exception as e:
    print("VMEM jnp.take FAILED:", type(e).__name__, str(e)[:300], flush=True)

# 3) scatter-add into VMEM accumulator
def scat_kernel(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] = out_ref[:].at[idx_ref[:]].add(val_ref[:])

vals = jnp.ones((B,), jnp.float32)
try:
    f3 = pl.pallas_call(
        scat_kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf3 = jax.jit(f3)
    r3 = jf3(idx, vals); jax.block_until_ready(r3)
    expect = np.bincount(np.asarray(idx), minlength=N)
    ok = np.allclose(np.asarray(r3), expect)
    t0=time.perf_counter()
    for _ in range(20): r3 = jf3(idx, vals)
    jax.block_until_ready(r3)
    print(f"VMEM scatter-add: OK correct={ok}  {(time.perf_counter()-t0)/20*1e6:.0f} us", flush=True)
except Exception as e:
    print("VMEM scatter-add FAILED:", type(e).__name__, str(e)[:300], flush=True)

# 4) baseline XLA gather timing for comparison
jg = jax.jit(lambda nd_, i_: nd_[i_])
r = jg(nd, idx); jax.block_until_ready(r)
t0=time.perf_counter()
for _ in range(20): r = jg(nd, idx)
jax.block_until_ready(r)
print(f"XLA gather baseline: {(time.perf_counter()-t0)/20*1e6:.0f} us", flush=True)
