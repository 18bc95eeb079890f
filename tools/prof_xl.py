"""Stage profile of the XL engine at n^3 (default 128): pass-1 dtau,
peel-off dtau, deposit, resolve, and the full lifecycle step."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys
from skirt9_tpu.sources import base as src
from skirt9_tpu.transport import sweep as sw
from skirt9_tpu.transport import sweepxl as xl

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 16)

PC = 3.0857e16
box = 1.2 * PC
grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
sigma = 1e-24
nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                       sigma_ext=np.array([[sigma, sigma]]),
                       albedo=np.full((1, 2), 0.6), g=np.full((1, 2), 0.5))
tabs = xl.build_tables(grid, med)
print("tabs:", tabs.n, "U,V:", tabs.U, tabs.V, "nmax:", tabs.nmax)

s_ = src.PointSource(luminosity=1.0, lam0=0.55e-6)
pkt = src.launch_batch(s_, s_.tables(), grid, jax.random.PRNGKey(0),
                       jnp.arange(B, dtype=jnp.int32), B)
opt = msys.optics_at(med, pkt.lam)
mask = pkt.alive
sig = opt.sigma_ext.T  # (C,B)? actually (H,B)


def timeit(label, f, *args, iters=5):
    r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1e3:9.2f} ms   {B/dt/1e6:8.2f} Mlane/s",
          flush=True)
    return dt


f_sub = jax.jit(lambda p, d: xl.sweep_dtau(tabs, p, d, sig, mask,
                                           want_sub=True))
t_sub = timeit("pass1 dtau want_sub", f_sub, pkt.pos, pkt.dir)

# axis+sign+entry-sorted lanes: what lifecycle feeds the kernel
grp_h = np.asarray(sw.dominant_axis(tabs, pkt.dir))
pa = np.take_along_axis(np.asarray(pkt.pos), grp_h[:, None], 1)[:, 0]
da = np.take_along_axis(np.asarray(pkt.dir), grp_h[:, None], 1)[:, 0]
t_ent = np.clip(((pa - np.asarray(tabs.lo)[grp_h])
                 / np.asarray(tabs.h)[grp_h]).astype(np.int32),
                0, tabs.nmax - 1)
skey = (grp_h * 2 + (da > 0)) * tabs.nmax + t_ent
perm = jnp.asarray(np.argsort(skey, kind="stable"))
p_pos = pkt.pos[perm]
p_dir = pkt.dir[perm]
t_sub_s = timeit("pass1 dtau want_sub SORTED", f_sub, p_pos, p_dir)

f_tot = jax.jit(lambda p, d: xl.sweep_dtau(tabs, p, d, sig, mask))
t_tot = timeit("peel dtau (no sub)", f_tot, pkt.pos, pkt.dir)

f_hint = jax.jit(lambda p, d: xl.sweep_dtau(tabs, p, d, sig, mask,
                                            axis_hint=2))
t_hint = timeit("peel dtau axis_hint=2", f_hint, pkt.pos, pkt.dir)

dtau_sub = f_sub(pkt.pos, pkt.dir)
dtau_slab = jnp.sum(dtau_sub, axis=1)
grp = sw.dominant_axis(tabs, pkt.dir)
dmaj = jnp.take_along_axis(pkt.dir, grp[:, None], 1)[:, 0]
tb_slab, tau_path = sw.slab_prefix(dtau_slab, dmaj > 0)
tau_int = 0.5 * tau_path


def f_res(p, d, ds_, tb, ti):
    return xl.resolve_interaction(tabs, p, d, mask, ds_, tb, ti)


f_resj = jax.jit(f_res)
timeit("resolve_interaction", f_resj, pkt.pos, pkt.dir, dtau_sub,
       tb_slab, tau_int)

scale_slab = jnp.exp(-tb_slab)
f_dep = jax.jit(lambda p, d, ds_, sc: xl.sweep_deposit(tabs, p, d, mask,
                                                       ds_, sc))
timeit("deposit", f_dep, pkt.pos, pkt.dir, dtau_sub, scale_slab)

dtau_sub_s = f_sub(p_pos, p_dir)
dtau_slab_s = jnp.sum(dtau_sub_s, axis=1)
up_s = (np.asarray(da) > 0)[np.asarray(perm)]
tb_s, tp_s = sw.slab_prefix(dtau_slab_s, jnp.asarray(up_s))
timeit("deposit SORTED", f_dep, p_pos, p_dir, dtau_sub_s, jnp.exp(-tb_s))
timeit("resolve SORTED", f_resj, p_pos, p_dir, dtau_sub_s, tb_s,
       0.5 * tp_s)

# slab_prefix cost
f_pre = jax.jit(lambda ds_, up: sw.slab_prefix(jnp.sum(ds_, axis=1), up))
timeit("slab_prefix(XLA)", f_pre, dtau_sub, dmaj > 0)

mac_sub = B * tabs.nmax * 3 * 2 * 2 * 3 * tabs.U * tabs.V  # C=1? C=2 comps?
print("C =", tabs.ncomp)
print(f"pass1 modeled MACs {mac_sub/1e12:.2f} T; at measured "
      f"{t_sub*1e3:.1f} ms -> {mac_sub/t_sub/1e12:.1f} TMAC/s")
