"""DD + XL sweep composition on the real TPU chip.

Only one physical chip is available, so the mesh is size 1: the run
exercises the full DD code path (shard_map, all_gather/all_to_all/psum
collectives — degenerate at n=1 — plus the per-device XL sweep on the
local slab) against the replicated XL engine on the same chip. The ratio
bounds the DD engine's non-collective overhead; tools/bench_dd.py
measures the collective protocol cost separately on the virtual 8-device
mesh (march-for-march).

Usage: python tools/bench_dd_tpu.py -> updates DD_BENCH_r05.json
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax
import numpy as np
from jax.sharding import Mesh


def _sim(n, n_pk, batch):
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    box = 1.2 * PC
    grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.6),
                           g=np.full((1, 2), 0.5))
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
        npx=64, npy=64, fovx=4 * PC, fovy=4 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=24,
                               store_rf=False)
    return Simulation(grid=grid, medium=med,
                      sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                      instruments=[inst], options=opts,
                      num_packets=n_pk, batch_size=batch, seed=0)


def _rate(sim, n_pk):
    sim.run_primary(verbose=False)
    t0 = time.perf_counter()
    sim.run_primary(verbose=False)
    return n_pk / (time.perf_counter() - t0)


def main():
    n_pk = 1 << 17
    sim = _sim(128, n_pk, 1 << 16)
    r_rep = _rate(sim, n_pk)

    sim_dd = _sim(128, n_pk, 1 << 16)
    sim_dd.mesh = Mesh(np.array(jax.devices()[:1]), (sim_dd.mesh_axis,))
    sim_dd.dd = True
    r_dd = _rate(sim_dd, n_pk)

    path = os.path.join(REPO, "DD_BENCH_r05.json")
    out = {}
    if os.path.exists(path):
        out = json.load(open(path))
    out.update({
        "tpu_bench1_128_replicated_pk_s": round(r_rep),
        "tpu_bench1_128_dd_xl_1dev_pk_s": round(r_dd),
        "tpu_bench1_128_dd_xl_over_replicated": round(r_dd / r_rep, 3),
        "tpu_note": "1 physical chip: DD mesh of size 1 exercises the "
                    "full composed path (shard_map + per-device XL "
                    "sweep); collective protocol cost measured "
                    "separately on the virtual 8-dev mesh",
    })
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
