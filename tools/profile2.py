"""Phase-level profile of bench2 (north-star config) on the TPU.

Round-2 weak #2: nobody profiled the panchromatic path. This isolates:
  primary segment (stratified sweep) with/without peel-off and RF,
  secondary iteration segment (currently scan-march), final secondary.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import dataclasses

import jax
import numpy as np


def block(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf).ravel()[:1]  # force a real host transfer


def timeit(label, fn, n=1):
    fn()          # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    block(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label::<50} {dt*1e3:10.1f} ms", flush=True)
    return dt


def main():
    from skirt9_tpu.config.ski import load_ski
    n_pk = 1 << 18
    B = 1 << 17
    ski = os.path.join(HERE, "tests", "golden", "bench2.ski")

    def build(**kw):
        sim = load_ski(ski, batch_size=B, max_events=24, num_packets=n_pk)
        sim.seed = 0
        for k, v in kw.items():
            setattr(sim, k, v)
        return sim

    sim = build()
    print(f"ncells={sim.grid.ncells} rf_bins={len(sim.rf_borders)-1} "
          f"insts={len(sim.instruments)} sweep={sim._sweep_tabs is not None}",
          flush=True)

    # full primary
    dt = timeit("primary (sweep, peel, rf)", lambda: sim.run_primary(verbose=False))
    print(f"  -> {n_pk/dt:,.0f} pk/s", flush=True)

    # primary without peel-off
    sim2 = build()
    sim2.options = dataclasses.replace(sim2.options, peel_off=False)
    dt = timeit("primary no-peel", lambda: sim2.run_primary(verbose=False))
    print(f"  -> {n_pk/dt:,.0f} pk/s", flush=True)

    # primary without RF (peel only)
    sim3 = build()
    sim3.options = dataclasses.replace(sim3.options, store_rf=False)
    sim3.rf_borders = None
    sim3.__post_init__()
    dt = timeit("primary no-rf", lambda: sim3.run_primary(verbose=False))
    print(f"  -> {n_pk/dt:,.0f} pk/s", flush=True)

    # secondary iteration segment (scan path today)
    sim4 = build()
    rf_prim, accs = sim4.run_primary(verbose=False)
    from skirt9_tpu.emission import equilibrium as eq
    etabs = eq.build_emission_tables(sim4.medium, np.asarray(sim4.rf_borders),
                                     np.asarray(sim4.ems_borders))
    src2 = sim4._make_secondary(etabs, rf_prim)
    opts2 = dataclasses.replace(sim4.options, primary=False, peel_off=False)

    def sec_iter():
        rf = sim4._init_rf()
        rf, _ = sim4._run_segment(src2, src2.tables(), opts2, n_pk,
                                  jax.random.PRNGKey(5), rf, [],
                                  seg_key=("prof-seco",))
        return rf
    dt = timeit("secondary iter segment (no peel)", sec_iter)
    print(f"  -> {n_pk/dt:,.0f} pk/s", flush=True)

    # final secondary (peel, no rf)
    opts3 = dataclasses.replace(sim4.options, primary=False, store_rf=False)

    def sec_final():
        accs2 = [__import__('skirt9_tpu.simulation', fromlist=['x'])
                 ._inst_accumulators(c) for c in sim4.instruments]
        _, a = sim4._run_segment(src2, src2.tables(), opts3, n_pk,
                                 jax.random.PRNGKey(6), None, accs2,
                                 seg_key=("prof-seco-final",))
        return a
    dt = timeit("secondary final segment (peel, no rf)", sec_final)
    print(f"  -> {n_pk/dt:,.0f} pk/s", flush=True)


if __name__ == "__main__":
    main()
