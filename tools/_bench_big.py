import time, numpy as np
import jax, jax.numpy as jnp
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16
for B in [1<<16, 1<<17]:
    grid = make_cartesian(((-1.2*PC, 1.2*PC),)*3, (32,)*3)
    sigma=1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
    med = msys.make_medium(grid, nd, np.array([0.4e-6,0.7e-6]),
                           np.array([[sigma,sigma]]), np.full((1,2),0.6), np.full((1,2),0.5))
    inst = dinst.DistantInstrumentCfg(name="i0", wave_borders=(0.5e-6,0.6e-6), distance=100*PC,
                                      npx=64, npy=64, fovx=4*PC, fovy=4*PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=24)
    sim = Simulation(grid=grid, medium=med, sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts, rf_borders=np.array([0.5e-6,0.6e-6]),
                     num_packets=B*2, batch_size=B, seed=0)
    sim.run_primary(verbose=False)  # compile+warm
    sim.num_packets = B*8
    t0=time.perf_counter()
    sim.run_primary(verbose=False)
    dt = time.perf_counter()-t0
    print(f"B={B}: {B*8/dt:,.0f} packets/s", flush=True)
