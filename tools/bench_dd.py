"""DD protocol throughput: spatial domain decomposition vs the replicated
engine on the SAME 8-device (virtual CPU) mesh.

Real multi-chip hardware is not available in this environment, so the
absolute pk/s says nothing about TPU — but the RATIO between the two
engines on identical devices isolates the cost of the DD protocol itself
(per-event all_gather of ray states + all_to_all owner exchange vs zero
communication), which is the quantity the design argues is bounded
(parallel/domain.py: O(nB) words per device per event).

Both engines run the scan-march transport here (the Pallas sweeps are
TPU-only), so the comparison is march-for-march fair.

Usage: python tools/bench_dd.py  -> prints JSON, writes DD_BENCH_r05.json
"""

import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden")


def _rate(sim, n_pk):
    sim.run_primary(verbose=False)          # warm/compile
    t0 = time.perf_counter()
    sim.run_primary(verbose=False)
    return n_pk / (time.perf_counter() - t0)


def _bench2(dd: bool, n_pk: int = 1 << 14):
    from skirt9_tpu.config.ski import load_ski

    sim = load_ski(os.path.join(GOLD, "bench2.ski"), batch_size=1 << 13,
                   max_events=12, num_packets=n_pk)
    sim.seed = 0
    sim.mesh = Mesh(np.array(jax.devices()[:8]), (sim.mesh_axis,))
    sim.dd = dd
    sim._build_sweep_tables()
    return _rate(sim, n_pk)


def _bench1_128(dd: bool, n_pk: int = 1 << 13):
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    R = PC
    box = 1.2 * R
    grid = make_cartesian(((-box, box),) * 3, (128,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, R)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.6),
                           g=np.full((1, 2), 0.5))
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
        npx=64, npy=64, fovx=4 * PC, fovy=4 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts,
                     rf_borders=np.array([0.5e-6, 0.6e-6]),
                     num_packets=n_pk, batch_size=1 << 13, seed=0)
    sim.mesh = Mesh(np.array(jax.devices()[:8]), (sim.mesh_axis,))
    sim.dd = dd
    sim._build_sweep_tables()
    return _rate(sim, n_pk)


def main():
    out = {"devices": 8, "backend": "cpu (virtual mesh)",
           "note": "scan-march on both sides; the ratio isolates the DD "
                   "protocol cost (per-event all_gather + all_to_all)"}
    r_rep = _bench2(False)
    r_dd = _bench2(True)
    out["bench2_replicated_pk_s"] = round(r_rep)
    out["bench2_dd_pk_s"] = round(r_dd)
    out["bench2_dd_over_replicated"] = round(r_dd / r_rep, 3)
    r_rep1 = _bench1_128(False)
    r_dd1 = _bench1_128(True)
    out["bench1_128_replicated_pk_s"] = round(r_rep1)
    out["bench1_128_dd_pk_s"] = round(r_dd1)
    out["bench1_128_dd_over_replicated"] = round(r_dd1 / r_rep1, 3)
    with open(os.path.join(REPO, "DD_BENCH_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
