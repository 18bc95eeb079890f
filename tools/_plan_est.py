"""Estimate the multi-granularity march-plan win on bench3's octree."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from skirt9_tpu.config.ski import load_ski
from skirt9_tpu.transport import mlsweep as ml

ski = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "bench3.ski")
sim = load_ski(ski, batch_size=1 << 16, max_events=24, num_packets=1 << 18)
grid, med = sim.grid, sim.medium
meta = ml._analyze(grid)
levels = meta["levels"]
nf = meta["nf"]
nmax = max(nf)
print("fine grid:", nf, "nmax:", nmax)
for li, (sig, lv) in enumerate(zip(meta["levels_present"], levels)):
    print(f"level {li}: sig={sig} shift={lv.shift} box={lv.box} "
          f"nvox={lv.nvox} rows/axis={[a.rows for a in lv.ax]} "
          f"t-range/axis={[(a.t0, a.t1) for a in lv.ax]}")
enc = sum(a.rows for lv in levels for a in lv.ax)
print("enc rows:", enc)

# ---- current cost: per fine slab t, select rows = sum over (lv, a) with
# t inside the level's major box (the lax.cond gating skips boxes with
# coverage < 0.55 -- treat cond-gated levels as costing only inside)
cur_rows = 0
for t in range(nmax):
    for lv in levels:
        for a in range(3):
            g = lv.ax[a]
            tl = t >> g.sht
            cov = (g.t1 - g.t0) * (1 << g.sht) / nmax
            inside = g.t0 <= tl < g.t1
            if cov < 0.55 and g.rows >= 2:
                if inside:
                    cur_rows += g.rows
            else:
                cur_rows += g.rows  # unconditional
print(f"current: {nmax} slabs, total select rows = {cur_rows}, "
      f"deposit substeps = {nmax * 3}")

# ---- plan: granularity per fine slab = min over levels covering t (any
# axis layout) of min(level shift); segments must be aligned
gmax = min(min(lv.shift) for lv in levels)  # finest level present
gs_t = np.full(nmax, 31, np.int32)
for t in range(nmax):
    g_here = None
    for lv in levels:
        for a in range(3):
            g = lv.ax[a]
            if g.t0 <= (t >> g.sht) < g.t1:
                m = min(lv.shift)
                g_here = m if g_here is None else min(g_here, m)
    gs_t[t] = 0 if g_here is None else g_here

# build aligned segments: walk t, at each aligned position take the
# largest granularity g such that all 2^g slabs have gs_t >= g and
# t % 2^g == 0
steps = []  # (t0_fine, gs)
t = 0
while t < nmax:
    g = int(gs_t[t])
    while g > 0 and (t % (1 << g) or (gs_t[t:t + (1 << g)] < g).any()):
        g -= 1
    steps.append((t, g))
    t += 1 << g
print(f"plan: {len(steps)} march steps (vs {nmax})")

# plan select rows: per step, statically include (lv, a) pairs whose major
# box overlaps the step's fine range
plan_rows = 0
for t0, g in steps:
    t1 = t0 + (1 << g)
    for lv in levels:
        for a in range(3):
            ga = lv.ax[a]
            f0, f1 = ga.t0 << ga.sht, ga.t1 << ga.sht
            if f0 < t1 and t0 < f1:
                plan_rows += ga.rows
print(f"plan: total select rows = {plan_rows}, "
      f"deposit substeps = {len(steps) * 3}")
print(f"dtau select-loop ratio: {cur_rows / max(plan_rows, 1):.2f}x")
print(f"deposit matmul ratio:   {nmax / len(steps):.2f}x")
