import time, numpy as np
import jax, jax.numpy as jnp
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys
from skirt9_tpu.sources import base as src
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16
grid = make_cartesian(((-1.2*PC, 1.2*PC),)*3, (32,)*3)
sigma=1e-24
nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
med = msys.make_medium(grid, nd, np.array([0.4e-6,0.7e-6]),
                       np.array([[sigma,sigma]]), np.full((1,2),0.6), np.full((1,2),0.5))
B = 1<<17
S = grid.max_steps()
s_ = src.PointSource(luminosity=1.0, lam0=0.55e-6)
pkt = src.launch_batch(s_, s_.tables(), grid, jax.random.PRNGKey(0),
                       jnp.arange(B, dtype=jnp.int32), B)
opt = msys.optics_at(med, pkt.lam)
mask = pkt.alive

def timeit(label, f, *args, iters=6):
    r = f(*args); jax.block_until_ready(jax.tree.leaves(r))
    t0=time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    dt=(time.perf_counter()-t0)/iters
    print(f"{label:34s} {dt*1e3:8.2f} ms  ({dt/S*1e6:7.1f} us/step)", flush=True)
    return dt

# 1. march_record alone
f1 = jax.jit(lambda p, d, c: lc.march_record(grid, med, opt, p, d, c, S, mask))
timeit("march_record (record ys)", f1, pkt.pos, pkt.dir, pkt.cell)

# 2. trace_tau alone (no ys outputs)
f2 = jax.jit(lambda p, d, c: lc.trace_tau(grid, med, opt, p, d, c, S, mask))
timeit("trace_tau (no outputs)", f2, pkt.pos, pkt.dir, pkt.cell)

# 3. grid-step-only march (no opacity gather)
def step_only(p, d, c):
    def body(carry, _):
        pp, cc = carry
        ds, nc, np_ = grid.step(pp, d, cc)
        return (np_, nc), ds
    (_, _), ds = jax.lax.scan(body, (p, c), None, length=S)
    return ds.sum()
f3 = jax.jit(step_only)
timeit("march steps only (no opacity)", f3, pkt.pos, pkt.dir, pkt.cell)

# 4. opacity gather alone, S times
def gather_only(c):
    def body(carry, _):
        acc = carry
        k = msys.opacity_ext(med, opt, c)
        return acc + k.sum(), None
    out, _ = jax.lax.scan(body, 0.0, None, length=S)
    return out
f4 = jax.jit(gather_only)
timeit("opacity gathers only (S times)", f4, pkt.cell)

# 5. deposit (scatter) alone
cells = jnp.tile(pkt.cell, (S,1)); ds_ = jnp.ones((S,B)); dtau = jnp.full((S,B), 0.01)
tb = jnp.cumsum(dtau,0)-dtau
rf = jnp.zeros((grid.ncells,1))
f5 = jax.jit(lambda rf_, c_, d_, dt_, tb_: lc.deposit_rf(rf_, c_, d_, dt_, tb_, pkt.lum,
             jnp.zeros((B,),jnp.int32), mask, 1e20))
timeit("deposit_rf scatter (S*B elems)", f5, rf, cells, ds_, dtau, tb)
