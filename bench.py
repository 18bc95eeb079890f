"""Benchmark: photon packets/s, headline = panchromatic dust emission.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
north-star metric (BASELINE.json: packets/s on a panchromatic dust-emission
run), with the monochromatic config-1 rate as an extra diagnostic field.

The baseline denominators are SKIRT9's measured multi-core CPU packets/s on
the equivalent problems (BASELINE.md / BENCH_BASELINE.json), using the same
MRN mean dust table exported by tools/export_dustmix.py on both sides.
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

HERE = os.path.dirname(os.path.abspath(__file__))


def bench_config1():
    """Monochromatic scattering uniform sphere (BASELINE.md config 1)."""
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
                     num_packets=1 << 20, batch_size=1 << 17, seed=0)
    # warmup (compile) at the same packet count as the timed run: the
    # per-source launch count is a static jit argument
    sim.run_primary(verbose=False)
    t0 = time.perf_counter()
    sim.run_primary(verbose=False)
    dt = time.perf_counter() - t0
    return sim.num_packets / dt


def bench_config2():
    """Panchromatic MRN dust emission (the north-star workload): the exact
    bench2.ski the reference binary runs (tests/golden/bench2.ski), through
    the ski loader -> stratified sweep engine -> secondary emission."""
    from skirt9_tpu.config.ski import load_ski

    ski = os.path.join(HERE, "tests", "golden", "bench2.ski")
    n_pk = 1 << 20

    def build():
        sim = load_ski(ski, batch_size=1 << 17, max_events=24,
                       num_packets=n_pk)
        sim.seed = 0
        return sim

    # warmup/compile run
    sim = build()
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    # timed run (fresh object: no cached emission tables)
    sim = build()
    t0 = time.perf_counter()
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    dt = time.perf_counter() - t0
    total_packets = n_pk * (1 + info["iterations"]
                            + (1 if info["L_dust"] > 0 else 0))
    return total_packets / dt, info


def bench_config1h():
    """High optical depth (radial tau=10, albedo 0.9) with lane refill —
    packet lifetimes ~90 events (BASELINE.md config 1h)."""
    from skirt9_tpu.config.ski import load_ski

    ski = os.path.join(HERE, "tests", "golden", "bench1h.ski")
    n_pk = 1 << 19

    def build():
        sim = load_ski(ski, batch_size=1 << 17, max_events=16,
                       num_packets=n_pk)
        sim.seed = 0
        sim.refill_events = 16
        return sim

    sim = build()
    sim.run_primary(verbose=False)      # warmup/compile
    sim = build()
    t0 = time.perf_counter()
    sim.run_primary(verbose=False)
    return n_pk / (time.perf_counter() - t0)


def bench_config3():
    """Octree + dust self-absorption iterations (BASELINE.md config 3)."""
    from skirt9_tpu.config.ski import load_ski

    ski = os.path.join(HERE, "tests", "golden", "bench3.ski")
    n_pk = 1 << 18

    def build():
        sim = load_ski(ski, batch_size=1 << 16, max_events=24,
                       num_packets=n_pk)
        sim.seed = 0
        return sim

    sim = build()
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    sim = build()
    t0 = time.perf_counter()
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    dt = time.perf_counter() - t0
    total = n_pk * (1 + info["iterations"] + (1 if info["L_dust"] > 0 else 0))
    return total / dt


def main():
    rate2, info = bench_config2()
    rate1 = bench_config1()
    rate1h = bench_config1h()
    rate3 = bench_config3()

    base1 = base2 = base1h = base3 = None
    bp = os.path.join(HERE, "BENCH_BASELINE.json")
    if os.path.exists(bp):
        with open(bp) as f:
            b = json.load(f)
        base1 = b.get("packets_per_s")
        base2 = b.get("config2_packets_per_s")
        base1h = b.get("config1h_packets_per_s")
        base3 = b.get("config3_packets_per_s")
    vs = rate2 / base2 if base2 else 1.0
    print(json.dumps({
        "metric": "photon packets/s, panchromatic MRN dust-emission "
                  "(BB source, tau_V=2 sphere, 32^3 grid, 25-bin RF, "
                  "64x64 imaging + 40-bin SED, self-absorption iterations)",
        "value": round(rate2, 1),
        "unit": "packets/s",
        "vs_baseline": round(vs, 3),
        "config1_packets_per_s": round(rate1, 1),
        "config1_vs_baseline": round(rate1 / base1, 3) if base1 else 1.0,
        "config1h_tau10_packets_per_s": round(rate1h, 1),
        "config1h_vs_baseline": round(rate1h / base1h, 3) if base1h else 1.0,
        "config3_octree_packets_per_s": round(rate3, 1),
        "config3_vs_baseline": round(rate3 / base3, 3) if base3 else 1.0,
        "iterations": info["iterations"],
    }))


if __name__ == "__main__":
    main()
