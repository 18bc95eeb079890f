"""Kernel-level timings of the sweep engine at bench2 shapes.

Separates sweep_dtau, sweep_deposit (1 vs 32 bin groups), launch, and the
fixed per-jit-call dispatch overhead, to locate the panchromatic gap vs the
monochromatic configuration.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, args, K=20):
    f = jax.jit(fn, static_argnums=())
    out = f(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(K):
        out = f(*args)
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf).ravel()[:1]
    dt = (time.perf_counter() - t0) / K
    print(f"{label:<44} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.transport import sweep as sw

    PC = 3.0857e16
    n = 32
    box = 1.2 * PC
    grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, 2.0 * sigma, PC)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.6),
                           g=np.full((1, 2), 0.5))
    tabs = sw.build_tables(grid, med)
    B = 1 << 17
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (B, 3), minval=-0.5 * PC, maxval=0.5 * PC)
    dirn = jax.random.normal(key, (B, 3))
    dirn = dirn / jnp.linalg.norm(dirn, axis=-1, keepdims=True)
    sig = jnp.full((B,), sigma)
    active = jnp.ones((B,), bool)

    dt1 = timeit("sweep_dtau B=131072", lambda p, d, s, a:
                 sw.sweep_dtau(tabs, p, d, s, a).sum(),
                 (pos, dirn, sig, active))

    scale = jnp.ones((tabs.nmax, B), jnp.float32)
    rel = jnp.full((tabs.nmax, B), 0.5, jnp.float32)

    def dep(p, d, s, a, sc, re, ng):
        rf, si, ic, fo = sw.sweep_deposit(tabs, p, d, s, a, sc, re,
                                          n_groups=ng)
        return rf.sum() + si.sum()

    timeit("sweep_deposit n_groups=1", lambda *a: dep(*a, 1),
           (pos, dirn, sig, active, scale, rel))
    timeit("sweep_deposit n_groups=32", lambda *a: dep(*a, 32),
           (pos, dirn, sig, active, scale, rel))

    # dispatch floor: trivial jit call with host sync
    timeit("dispatch floor (x+1 on (128,))",
           lambda x: x + 1.0, (jnp.zeros((128,)),))

    # launch cost: BB stratified
    from skirt9_tpu.config.ski import load_ski
    ski = os.path.join(HERE, "tests", "golden", "bench2.ski")
    sim = load_ski(ski, batch_size=B, max_events=24, num_packets=B)
    src0 = sim.sources[0]
    stabs = dict(sim._src_tabs[0])
    strata = sim._strata_for(src0, sim.options)
    stabs["strata"] = jnp.asarray(strata[0], jnp.float32)
    from skirt9_tpu.sources import base as src

    def launch(seed):
        pkt = src.launch_batch(src0, stabs, sim.grid, seed,
                               jnp.arange(B, dtype=jnp.int32), B)
        return pkt.lam.sum() + pkt.lum.sum() + pkt.pos.sum()
    timeit(f"launch_batch stratified R={len(strata[1])}",
           launch, (jax.random.PRNGKey(1),))

    # full event cost in context: one life_cycle with max_events=1 vs 2
    import dataclasses

    from skirt9_tpu.transport import lifecycle as lc
    rfb = jnp.asarray(sim.rf_borders, jnp.float32)
    R_g = len(strata[1])
    inst_tabs = sim._inst_tabs
    insts = tuple(sim.instruments)

    def seg(seed, nev):
        opts = dataclasses.replace(sim.options, max_events=nev,
                                   rf_strata=R_g, rf_bin_map=strata[1])
        pkt = src.launch_batch(src0, stabs, sim.grid, seed,
                               jnp.arange(B, dtype=jnp.int32), B)
        rf = jnp.zeros((sim.grid.ncells, len(sim.rf_borders) - 1),
                       jnp.float32)
        from skirt9_tpu.simulation import _inst_accumulators
        accs = [_inst_accumulators(c) for c in insts]
        rf, accs = lc.life_cycle(sim.grid, sim.medium, opts, insts,
                                 inst_tabs, rfb, pkt, rf, accs,
                                 sweep_tabs=sim._sweep_tabs)
        return rf.sum() + accs[0]["sed"].sum()

    d1 = timeit("life_cycle 1 event", lambda s: seg(s, 1),
                (jax.random.PRNGKey(2),), K=10)
    d2 = timeit("life_cycle 2 events", lambda s: seg(s, 2),
                (jax.random.PRNGKey(2),), K=10)
    d4 = timeit("life_cycle 4 events", lambda s: seg(s, 4),
                (jax.random.PRNGKey(2),), K=10)
    d24 = timeit("life_cycle 24 events", lambda s: seg(s, 24),
                 (jax.random.PRNGKey(2),), K=10)
    print(f"per-event marginal: {1e3*(d2-d1):.2f} ms; "
          f"(d4-d2)/2={1e3*(d4-d2)/2:.2f}; (d24-d4)/20={1e3*(d24-d4)/20:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
