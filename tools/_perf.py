import time, numpy as np, json
import jax, jax.numpy as jnp
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.sources import base as src
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16
n = 32
box = 1.2*PC
grid = make_cartesian(((-box, box),)*3, (n,)*3)
sigma=1e-24
nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
med = msys.make_medium(grid, nd, np.array([0.4e-6,0.7e-6]),
                       np.array([[sigma,sigma]]), np.full((1,2),0.6), np.full((1,2),0.5))
inst = dinst.DistantInstrumentCfg(name="i0", wave_borders=(0.5e-6,0.6e-6), distance=100*PC,
                                  npx=64, npy=64, fovx=4*PC, fovy=4*PC)
tabs=[dinst.device_tables(inst)]
rfb = jnp.asarray([0.5e-6,0.6e-6], jnp.float32)
source = src.PointSource(luminosity=1.0, lam0=0.55e-6)
stabs = source.tables()
B = 1<<15

def bench(label, opts, with_inst=True, with_rf=True, B=B, iters=4):
    insts = (inst,) if with_inst else ()
    t = tabs if with_inst else []
    def run(key, hist, rf, accs):
        pkt = src.launch_batch(source, stabs, grid, key, hist, B)
        return lc.life_cycle(grid, med, opts, insts, t, rfb, pkt, rf, accs)
    f = jax.jit(run, donate_argnums=(2,3))
    key = jax.random.PRNGKey(0)
    def fresh():
        rf = jnp.zeros((grid.ncells,1), jnp.float32) if with_rf else None
        accs = [dinst.init_accumulators(inst)] if with_inst else []
        return rf, accs
    rf, accs = fresh()
    hist = jnp.arange(B, dtype=jnp.int32)
    rf, accs = f(key, hist, rf, accs)  # compile+warm
    jax.block_until_ready(jax.tree.leaves((rf, accs)))
    t0=time.perf_counter()
    for i in range(iters):
        rf, accs = f(jax.random.fold_in(key,i), hist, rf, accs)
    jax.block_until_ready(jax.tree.leaves((rf, accs)))
    dt = (time.perf_counter()-t0)/iters
    print(f"{label:45s} {B/dt:>12,.0f} pk/s   ({dt*1e3:7.1f} ms/batch)", flush=True)
    return B/dt

scale = 1.07e17/B
base = dict(max_steps=grid.max_steps(), path_length_bias=0.5, rf_scale=scale)
bench("full (rf + 1 inst, 24 events)", lc.TransportOptions(**base, max_events=24))
bench("no RF store", lc.TransportOptions(**base, max_events=24, store_rf=False), with_rf=False)
bench("no instruments", lc.TransportOptions(**base, max_events=24, peel_off=False), with_inst=False)
bench("no RF + no inst", lc.TransportOptions(**base, max_events=24, store_rf=False, peel_off=False), with_inst=False, with_rf=False)
bench("full, 12 events", lc.TransportOptions(**base, max_events=12))
bench("full, 6 events", lc.TransportOptions(**base, max_events=6))
bench("full, B=2^17", lc.TransportOptions(**base, max_events=24), B=1<<17, iters=2)
bench("full, B=2^13", lc.TransportOptions(**base, max_events=24), B=1<<13)
