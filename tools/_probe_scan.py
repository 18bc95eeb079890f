import time, numpy as np
import jax, jax.numpy as jnp
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys
from skirt9_tpu.sources import base as src

PC = 3.0857e16
grid = make_cartesian(((-1.2*PC, 1.2*PC),)*3, (32,)*3)
sigma=1e-24
nd_arr = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
med = msys.make_medium(grid, nd_arr, np.array([0.4e-6,0.7e-6]),
                       np.array([[sigma,sigma]]), np.full((1,2),0.6), np.full((1,2),0.5))
B = 1<<17
S = 99
s_ = src.PointSource(luminosity=1.0, lam0=0.55e-6)
pkt = src.launch_batch(s_, s_.tables(), grid, jax.random.PRNGKey(0),
                       jnp.arange(B, dtype=jnp.int32), B)
opt = msys.optics_at(med, pkt.lam)
nd1 = med.nd[:, 0]
sig_pkt = opt.sigma_ext[:, 0]

def timeit(label, f, *args, iters=8):
    r = f(*args); jax.block_until_ready(jax.tree.leaves(r))
    t0=time.perf_counter()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r))
    dt=(time.perf_counter()-t0)/iters
    print(f"{label:44s} {dt*1e3:8.2f} ms ({dt/S*1e6:6.1f} us/step)", flush=True)

# A: scan, gather only, carry-varying index
def fA(c0):
    def body(carry, _):
        c, acc = carry
        k = nd1[c]                      # 1D gather, carry-dependent
        return ((c + 1) % grid.ncells, acc + k.sum()), None
    (_, acc), _ = jax.lax.scan(body, (c0, 0.0), None, length=S)
    return acc
timeit("A: scan gather-only (carry idx)", jax.jit(fA), pkt.cell)

# B: scan, step-only + tau accumulate with CONSTANT k
def fB(p0, d, c0):
    def body(carry, _):
        p, c, tau = carry
        ds, nc, np_ = grid.step(p, d, c)
        tau = tau + jnp.where((c >= 0), 1e-17 * ds, 0.0)
        return (np_, nc, tau), None
    (_, _, tau), _ = jax.lax.scan(body, (p0, c0, jnp.zeros(B)), None, length=S)
    return tau
timeit("B: scan step+tau, const k", jax.jit(fB), pkt.pos, pkt.dir, pkt.cell)

# C: step + gather (the real trace_tau core) single-component fast path
def fC(p0, d, c0):
    def body(carry, _):
        p, c, tau = carry
        k = nd1[jnp.maximum(c,0)] * sig_pkt
        ds, nc, np_ = grid.step(p, d, c)
        tau = tau + jnp.where((c >= 0), k * ds, 0.0)
        return (np_, nc, tau), None
    (_, _, tau), _ = jax.lax.scan(body, (p0, c0, jnp.zeros(B)), None, length=S)
    return tau
timeit("C: scan step+gather+tau (fused)", jax.jit(fC), pkt.pos, pkt.dir, pkt.cell)

# D: like C but using msys.opacity_ext (2D nd table + H-dot)
def fD(p0, d, c0):
    def body(carry, _):
        p, c, tau = carry
        k = msys.opacity_ext(med, opt, c)
        ds, nc, np_ = grid.step(p, d, c)
        tau = tau + jnp.where((c >= 0), k * ds, 0.0)
        return (np_, nc, tau), None
    (_, _, tau), _ = jax.lax.scan(body, (p0, c0, jnp.zeros(B)), None, length=S)
    return tau
timeit("D: scan step+opacity_ext(2D)+tau", jax.jit(fD), pkt.pos, pkt.dir, pkt.cell)
