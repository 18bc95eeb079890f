"""Microbenchmark: gather/scatter primitive rates on the attached TPU.

Informs the octree-path redesign: the scan-march cost model depends on XLA
gather throughput at the table/index sizes tree traversal actually uses.

Timing method: the axon remote backend dispatches asynchronously and
block_until_ready does not reflect device completion, so each measurement
runs K chained iterations inside ONE jitted fori_loop and syncs a scalar at
the end; rate = K*work / (t_sync - t_start). Compile time excluded by a
prior warmup call at K=1.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(build, K=64):
    """build(K) -> jitted fn(args)->scalar with K chained iterations."""
    f1, args1 = build(1)
    float(f1(*args1))          # compile small variant + warm path
    fK, argsK = build(K)
    float(fK(*argsK))          # compile K variant
    t0 = time.perf_counter()
    out = float(fK(*argsK))
    dt = time.perf_counter() - t0
    return dt / K, out


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # -- bandwidth floor: chained saxpy on 64MB
    def build_saxpy(K):
        x = jax.random.normal(key, (1 << 24,))
        @jax.jit
        def f(x):
            def body(i, x):
                return x * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, K, body, x).sum()
        return f, (x,)
    dt, _ = timed_loop(build_saxpy)
    print(f"saxpy 64MB: {dt*1e3:8.3f} ms/iter -> {2*(1<<24)*4/dt/1e9:7.0f} GB/s", flush=True)

    # -- flat gather, chained (idx derived from previous values)
    for tab_n in (1024, 32768, 1 << 20):
        def build_gather(K, tab_n=tab_n):
            tab = jax.random.normal(key, (tab_n,))
            idx = jax.random.randint(key, (1 << 22,), 0, tab_n)
            @jax.jit
            def f(tab, idx):
                def body(i, c):
                    idx2, acc = c
                    v = tab[idx2]
                    idx2 = (idx2 + v.astype(jnp.int32) + 1) % tab_n
                    return (idx2, acc + v.sum())
                _, acc = jax.lax.fori_loop(0, K, body, (idx, 0.0))
                return acc
            return f, (tab, idx)
        dt, _ = timed_loop(build_gather, K=32)
        print(f"flat gather tab={tab_n:>8} idx=4M: {dt*1e3:8.3f} ms "
              f"{(1<<22)/dt/1e9:8.2f} Gelem/s", flush=True)

    # -- row gather (N,8)
    def build_row8(K):
        tab = jax.random.normal(key, (32768, 8))
        idx = jax.random.randint(key, (1 << 20,), 0, 32768)
        @jax.jit
        def f(tab, idx):
            def body(i, c):
                idx2, acc = c
                v = tab[idx2]                     # (1M, 8)
                idx2 = (idx2 + v[:, 0].astype(jnp.int32) + 1) % 32768
                return (idx2, acc + v.sum())
            _, acc = jax.lax.fori_loop(0, K, body, (idx, 0.0))
            return acc
        return f, (tab, idx)
    dt, _ = timed_loop(build_row8, K=32)
    print(f"row gather (N,8) idx=1M: {dt*1e3:8.3f} ms "
          f"{(1<<20)/dt/1e6:8.1f} Mrow/s", flush=True)

    # -- scatter-add chained
    for tab_n in (32768, 1 << 20):
        def build_scat(K, tab_n=tab_n):
            idx = jax.random.randint(key, (1 << 22,), 0, tab_n)
            val = jax.random.normal(key, (1 << 22,))
            @jax.jit
            def f(idx, val):
                def body(i, c):
                    acc, idx2 = c
                    acc = acc.at[idx2].add(val)
                    idx2 = (idx2 + 1 + acc[0].astype(jnp.int32) % 3) % tab_n
                    return (acc, idx2)
                acc, _ = jax.lax.fori_loop(
                    0, K, body, (jnp.zeros((tab_n,), jnp.float32), idx))
                return acc.sum()
            return f, (idx, val)
        dt, _ = timed_loop(build_scat, K=16)
        print(f"scatter-add tab={tab_n:>8} idx=4M: {dt*1e3:8.3f} ms "
              f"{(1<<22)/dt/1e9:8.2f} Gelem/s", flush=True)

    # -- the octree traversal pattern: in-scan per-step row gather, B lanes
    B = 1 << 17
    def build_oct(K):
        tab = jax.random.normal(key, (32768, 8))
        idx0 = jax.random.randint(key, (B,), 0, 32768)
        @jax.jit
        def f(tab, idx0):
            def step(c, _):
                v = tab[c]
                c = (c + v[:, 0].astype(jnp.int32) + 1) % 32768
                return c, jnp.sum(v)
            def body(i, carry):
                idx, acc = carry
                idx2, out = jax.lax.scan(step, idx, None, length=K)
                return (idx2, acc + out.sum())
            _, acc = jax.lax.fori_loop(0, 4, body, (idx0, 0.0))
            return acc
        return f, (tab, idx0)
    dt, _ = timed_loop(build_oct, K=64)
    print(f"in-scan row gather (N,8) {B} lanes: {dt/4*1e6/64:8.2f} us/step "
          f"{4*64*B/dt/1e6:8.1f} Mrow/s", flush=True)


if __name__ == "__main__":
    main()
