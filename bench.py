"""Benchmark: photon packets/s on the scattering uniform-sphere problem.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

The baseline denominator is SKIRT9's measured multi-core CPU packets/s on the
equivalent problem (BASELINE.md); until that reference measurement lands,
vs_baseline is reported against the recorded value in BENCH_BASELINE if
present, else 1.0.
"""

import json
import os
import time

import numpy as np

# persistent compilation cache: engine compiles on the axon TPU take
# minutes; warmed entries make driver re-runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def main():
    import jax
    import jax.numpy as jnp

    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    R = PC
    box = 1.2 * R
    n = 32
    grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, R)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.6),
                           g=np.full((1, 2), 0.5))
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
        npx=64, npy=64, fovx=4 * PC, fovy=4 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=24)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts,
                     rf_borders=np.array([0.5e-6, 0.6e-6]),
                     num_packets=1 << 17, batch_size=1 << 17, seed=0)

    # warmup (compile) at the same packet count as the timed run: the
    # per-source launch count is a static jit argument, so warming at a
    # different count would put a recompile inside the timed region
    sim.num_packets = 1 << 20
    sim.run_primary(verbose=False)
    # timed
    t0 = time.perf_counter()
    rf, accs = sim.run_primary(verbose=False)
    dt = time.perf_counter() - t0
    rate = sim.num_packets / dt

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f).get("packets_per_s")
    vs = rate / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "photon packets/s (uniform-sphere tau=1 albedo=0.6, 32^3 grid, peel-off imaging)",
        "value": round(rate, 1),
        "unit": "packets/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
