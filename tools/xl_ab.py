"""A/B the XL pass-1 dtau kernel's memory-vs-MXU bound at 256^3.

Variants (same numerics where noted):
  base    : bf16 hi+lo tables, 2 bf16 dots per row lookup   (shipping)
  f32     : f32 hi+lo tables, DEFAULT dots (1 MXU pass each; hi/lo are
            bf16-valued so DEFAULT rounding is exact) -> 2x HBM bytes,
            same MAC passes. Time ~2x base => HBM-bound.
  hionly  : bf16 hi only -> half bytes + half MACs (approximate).
"""
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 17)

PC = 3.0857e16
box = 1.2 * PC
grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
sigma = 1e-24
nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                       sigma_ext=np.array([[sigma, sigma]]),
                       albedo=np.full((1, 2), 0.6), g=np.full((1, 2), 0.5))
tabs = xl.build_tables(grid, med)

s_ = src.PointSource(luminosity=1.0, lam0=0.55e-6)
pkt = src.launch_batch(s_, s_.tables(), grid, jax.random.PRNGKey(0),
                       jnp.arange(B, dtype=jnp.int32), B)
opt = msys.optics_at(med, pkt.lam)
mask = pkt.alive
sig = opt.sigma_ext.T

# axis+sign+entry sorted lanes, as lifecycle feeds the kernel
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


def timeit(label, f, *args, iters=5):
    r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


f_base = jax.jit(lambda hi, lo, p, d: xl.sweep_dtau(
    tabs._replace(rho_hi=hi, rho_lo=lo), p, d, sig, mask, want_sub=True))
t0 = timeit("base bf16 hi+lo (sorted)", f_base, tabs.rho_hi, tabs.rho_lo,
            p_pos, p_dir)

# f32-table variant: monkeypatch _row_dot + tables
tab32 = tabs._replace(rho_hi=tabs.rho_hi.astype(jnp.float32),
                      rho_lo=tabs.rho_lo.astype(jnp.float32))
_orig_row_dot = xl._row_dot
_orig_onehots = xl._row_onehots


def _row_dot_f32(rho_hi, rho_lo, AT):
    MT = jax.lax.dot_general(rho_hi, AT, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return MT + jax.lax.dot_general(rho_lo, AT, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)


def _row_onehots_f32(iu0, iu2, U, lb):
    usub = jax.lax.broadcasted_iota(jnp.int32, (U, lb), 0)
    ATa = jnp.where(usub == iu0.reshape(1, lb), 1.0, 0.0)
    ATb = jnp.where(usub == iu2.reshape(1, lb), 1.0, 0.0)
    return ATa, ATb


xl._row_dot = _row_dot_f32
xl._row_onehots = _row_onehots_f32
# tables as jit ARGUMENTS (an f32 closure constant overflows axon's
# remote-compile request buffer); halve the slab-tile budget (f32 tiles
# are 2x the bf16 bytes the shipping _tile_dtau assumes)
_orig_tile = xl._tile_dtau
xl._tile_dtau = lambda t: _orig_tile(t._replace(
    rho_hi=jnp.zeros((t.ncomp, 1, 1, 2 * t.U, t.V), jnp.bfloat16)))
xl._tile_dtau = lambda t: xl._tile_size(t, t.ncomp * t.U * t.V * 8)
f_f32 = jax.jit(lambda hi, lo, p, d: xl.sweep_dtau(
    tab32._replace(rho_hi=hi, rho_lo=lo), p, d, sig, mask,
    want_sub=True))
t1 = timeit("f32 hi+lo DEFAULT (sorted)", f_f32, tab32.rho_hi,
            tab32.rho_lo, p_pos, p_dir)
xl._tile_dtau = _orig_tile

# hi-only: lo table zeros don't save MACs; patch _row_dot to skip lo
def _row_dot_hi(rho_hi, rho_lo, AT):
    return jax.lax.dot_general(rho_hi, AT, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


xl._row_dot = _row_dot_hi
xl._row_onehots = _orig_onehots
f_hi = jax.jit(lambda hi, lo, p, d: xl.sweep_dtau(
    tabs._replace(rho_hi=hi, rho_lo=lo), p, d, sig, mask, want_sub=True))
t2 = timeit("bf16 hi only (sorted)", f_hi, tabs.rho_hi, tabs.rho_lo,
            p_pos, p_dir)

xl._row_dot = _orig_row_dot
print(f"f32/base = {t1/t0:.2f}  hi-only/base = {t2/t0:.2f}")


# ---- int8 in-situ timing probe (fake scales: timing only, numerics wrong)
def _row_dot_i8(rho_hi, rho_lo, AT):
    M1 = jax.lax.dot_general(rho_hi, AT, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    M2 = jax.lax.dot_general(rho_lo, AT, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return (M1.astype(jnp.float32) * 127.0 + M2.astype(jnp.float32)) \
        * 7.9e-26


def _row_onehots_i8(iu0, iu2, U, lb):
    usub = jax.lax.broadcasted_iota(jnp.int32, (U, lb), 0)
    ATa = jnp.where(usub == iu0.reshape(1, lb), 1, 0).astype(jnp.int8)
    ATb = jnp.where(usub == iu2.reshape(1, lb), 1, 0).astype(jnp.int8)
    return ATa, ATb


xl._row_dot = _row_dot_i8
xl._row_onehots = _row_onehots_i8
tab8 = tabs._replace(
    rho_hi=jnp.clip((tabs.rho_hi.astype(jnp.float32) * 1e25), -127,
                    127).astype(jnp.int8),
    rho_lo=jnp.clip((tabs.rho_lo.astype(jnp.float32) * 1e27), -127,
                    127).astype(jnp.int8))
xl._tile_dtau = lambda t: xl._tile_size(t, t.ncomp * t.U * t.V * 2)
f_i8 = jax.jit(lambda hi, lo, p, d: xl.sweep_dtau(
    tab8._replace(rho_hi=hi, rho_lo=lo), p, d, sig, mask, want_sub=True))
t3 = timeit("int8 hi+lo (sorted, fake scale)", f_i8, tab8.rho_hi,
            tab8.rho_lo, p_pos, p_dir)
xl._tile_dtau = _orig_tile
xl._row_dot = _orig_row_dot
xl._row_onehots = _orig_onehots
print(f"int8/base = {t3/t0:.2f}")
