import time, numpy as np
import jax, jax.numpy as jnp
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
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
inst = dinst.DistantInstrumentCfg(name="i0", wave_borders=(0.5e-6,0.6e-6), distance=100*PC,
                                  npx=64, npy=64, fovx=4*PC, fovy=4*PC)
tabs=[dinst.device_tables(inst)]
rfb = jnp.asarray([0.5e-6,0.6e-6], jnp.float32)

def timeit(label, f, *args, iters=6):
    r = f(*args); jax.block_until_ready(jax.tree.leaves(r))
    t0=time.perf_counter()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    print(f"{label:40s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

f1 = jax.jit(lambda p,d,c: lc.march_geometry(grid, p, d, c, S, mask))
timeit("march_geometry", f1, pkt.pos, pkt.dir, pkt.cell)

f2 = jax.jit(lambda p,d,c: lc.march_record(grid, med, opt, p, d, c, S, mask))
timeit("march_record (geom+dense opacity)", f2, pkt.pos, pkt.dir, pkt.cell)

f3 = jax.jit(lambda p,d,c: lc.trace_tau(grid, med, opt, p, d, c, S, mask))
timeit("trace_tau", f3, pkt.pos, pkt.dir, pkt.cell)

cells = jnp.tile(pkt.cell, (S,1)); ds_ = jnp.ones((S,B)); dtau = jnp.full((S,B), 0.01)
tb = jnp.cumsum(dtau,0)-dtau
rf0 = jnp.zeros((grid.ncells,1))
f4 = jax.jit(lambda rf_, c_, d_, dt_, tb_: lc.deposit_rf(rf_, c_, d_, dt_, tb_, pkt.lum,
             jnp.zeros((B,),jnp.int32), mask, 1e20))
timeit("deposit_rf", f4, rf0, cells, ds_, dtau, tb)

f5 = jax.jit(lambda c_, d_, dt_, tb_, ti: lc.interaction_point(pkt.pos, pkt.dir, c_, d_, dt_, tb_, ti, mask))
timeit("interaction_point", f5, cells, ds_, dtau, tb, jnp.full((B,),0.5))

opts1 = lc.TransportOptions(max_steps=S, max_events=1, rf_scale=1e20, peel_off=False, store_rf=False)
f6 = jax.jit(lambda pkt_: lc.life_cycle(grid, med, opts1, (), [], rfb, pkt_, None, []))
timeit("life_cycle 1 event, no peel no rf", f6, pkt)

opts2 = lc.TransportOptions(max_steps=S, max_events=1, rf_scale=1e20, peel_off=False)
f7 = jax.jit(lambda pkt_, rf_: lc.life_cycle(grid, med, opts2, (), [], rfb, pkt_, rf_, []))
timeit("life_cycle 1 event, +rf", f7, pkt, rf0)

opts3 = lc.TransportOptions(max_steps=S, max_events=1, rf_scale=1e20)
f8 = jax.jit(lambda pkt_, rf_, a_: lc.life_cycle(grid, med, opts3, (inst,), tabs, rfb, pkt_, rf_, a_))
timeit("life_cycle 1 event, +rf +inst", f8, pkt, rf0, [dinst.init_accumulators(inst)])
