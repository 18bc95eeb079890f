"""Round-4 phase profile: config-3 (octree mlsweep) and config-5
(polarized+kinematic sweep) per-event kernel timings + roofline numbers.

Timing rule for the axon tunnel: K chained jitted iterations, synced by
pulling one scalar (see memory notes; naive block_until_ready lies)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jaxcache_tpu")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(label, step, x0, K=32, flops=None, bytes_=None):
    """Time K chained applications of step (x -> x-like scalar carrier)."""
    @jax.jit
    def many(x):
        def body(i, x):
            return step(x)
        return jax.lax.fori_loop(0, K, body, x)

    r = many(x0)
    float(jnp.sum(r))                    # force
    t0 = time.perf_counter()
    r = many(x0)
    float(jnp.sum(r))
    dt = (time.perf_counter() - t0) / K
    extra = ""
    if flops:
        extra += f"  {flops/dt/1e12:7.1f} TFLOP/s"
    if bytes_:
        extra += f"  {bytes_/dt/1e9:7.1f} GB/s"
    print(f"{label:<46} {dt*1e3:8.3f} ms{extra}", flush=True)
    return dt


def profile_config3():
    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.transport import mlsweep as ml
    from skirt9_tpu.transport import sweep as sw

    print("== config 3 (octree, multi-level sweep), B=65536")
    sim = load_ski(os.path.join(HERE, "tests", "golden", "bench3.ski"),
                   batch_size=1 << 16, max_events=24, num_packets=1 << 16)
    tabs = sim._sweep_tabs
    assert isinstance(tabs, ml.MLTables)
    B = 1 << 16
    rs = np.random.default_rng(0)
    lo = np.asarray(tabs.lo)
    box = np.asarray(tabs.h) * np.asarray(tabs.n)
    pos = jnp.asarray(lo + rs.uniform(0.05, 0.95, (B, 3)) * box,
                      jnp.float32)
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    act = jnp.ones((B,), bool)
    sig = jnp.full((B,), 4e-25, jnp.float32)
    enc = tabs.enc
    nmax = tabs.nmax
    print(f"   levels={len(tabs.levels)} enc={enc} nmax={nmax}")

    def dtau_step(x):
        o = ml.sweep_dtau(tabs, pos + x * 0.0, d, sig, act)
        return x + o[0, :1] * 0.0

    chain_time("ml.sweep_dtau (3-axis select)", dtau_step,
               jnp.zeros((1,), jnp.float32))

    def dtau_hint(x):
        o = ml.sweep_dtau(tabs, pos + x * 0.0, d, sig, act, axis_hint=0)
        return x + o[0, :1] * 0.0

    chain_time("ml.sweep_dtau (axis-hint peel-off)", dtau_hint,
               jnp.zeros((1,), jnp.float32))

    dtau_slab = ml.sweep_dtau(tabs, pos, d, sig, act)
    grp = sw.dominant_axis(tabs, d)
    dmaj = jnp.take_along_axis(d, grp[:, None], 1)[:, 0]
    tb, tp = sw.slab_prefix(dtau_slab, dmaj > 0)
    lum = jnp.ones((B,), jnp.float32)
    ti = 0.7 * tp

    def dep_step(x):
        rfd, s_i, ic, fn = ml.sweep_deposit(tabs, pos + x * 0.0, d, sig,
                                            act, lum, ti, tb, 1.0)
        return x + s_i[:1] * 0.0

    chain_time("ml.sweep_deposit (1 group)", dep_step,
               jnp.zeros((1,), jnp.float32))

    def dep32(x):
        rfd, s_i, ic, fn = ml.sweep_deposit(tabs, pos + x * 0.0, d, sig,
                                            act, lum, ti, tb, 1.0,
                                            n_groups=32)
        return x + s_i[:1] * 0.0

    chain_time("ml.sweep_deposit (32 groups)", dep32,
               jnp.zeros((1,), jnp.float32))


def profile_config5():
    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.transport import sweep as sw

    print("== config 5 (polarized+kinematic, 32^3 sweep), B=131072")
    sim = load_ski(os.path.join(HERE, "tests", "golden", "bench5.ski"),
                   batch_size=1 << 17, max_events=24, num_packets=1 << 17)
    tabs = sim._sweep_tabs
    assert isinstance(tabs, sw.SweepTables)
    med = sim.medium
    B = 1 << 17
    rs = np.random.default_rng(0)
    lo = np.asarray(tabs.lo)
    box = np.asarray(tabs.h) * np.asarray(tabs.n)
    pos = jnp.asarray(lo + rs.uniform(0.05, 0.95, (B, 3)) * box,
                      jnp.float32)
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    act = jnp.ones((B,), bool)
    lam = jnp.full((B,), 0.55e-6, jnp.float32)
    sig = jnp.full((B,), 6.65e-29, jnp.float32)

    def dtau_step(x):
        o = sw.sweep_dtau(tabs, pos + x * 0.0, d, sig, act)
        return x + o[0, :1] * 0.0

    chain_time("sw.sweep_dtau (event march)", dtau_step,
               jnp.zeros((1,), jnp.float32))

    def dtau_hint(x):
        o = sw.sweep_dtau(tabs, pos + x * 0.0, d, sig, act, axis_hint=0)
        return x + o[0, :1] * 0.0

    chain_time("sw.sweep_dtau (peel-off, axis hint)", dtau_hint,
               jnp.zeros((1,), jnp.float32))

    def optics_step(x):
        o = msys.optics_at(med, lam + x * 0.0)
        return x + o.sigma_ext[:1, 0] * 0.0

    chain_time("optics_at (per-event kinematic)", optics_step,
               jnp.zeros((1,), jnp.float32))

    # the polarized peel-off math (Mueller + rotations, no march)
    from skirt9_tpu.ops import stokes as stk
    mueller = sim.mueller
    st0 = jnp.zeros((B, 4), jnp.float32).at[:, 0].set(1.0)
    nrm = jnp.zeros((B, 3), jnp.float32).at[:, 2].set(1.0)
    h = jnp.zeros((B,), jnp.int32)
    kobs = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    def stokes_step(x):
        ko = jnp.broadcast_to(kobs, (B, 3))
        ct_o = jnp.sum(d * ko, axis=-1) + x[0] * 0.0
        phi_o, pn = stk.rotate_normal_into_plane(d, nrm, ko)
        S11, S12, S33, S34 = stk.mueller_at(mueller, h, ct_o)
        st_rot = stk.rotate_stokes(st0, phi_o)
        st_obs = stk.apply_mueller(st_rot, S11, S12, S33, S34)
        st_obs, I_obs = stk.normalize_stokes(st_obs)
        return x + I_obs[:1] * 0.0

    chain_time("polarized peel-off Stokes math", stokes_step,
               jnp.zeros((1,), jnp.float32))


def roofline():
    """Achieved FLOP/s / bytes of the three hot kernels vs v5e peaks."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.transport import sweep as sw

    print("== roofline: 32^3 resident sweep, B=131072")
    PC = 3.0857e16
    grid = make_cartesian(((-1.2 * PC, 1.2 * PC),) * 3, (32,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 2.0, sigma, PC)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.6),
                           g=np.full((1, 2), 0.5))
    tabs = sw.build_tables(grid, med)
    B = 1 << 17
    rs = np.random.default_rng(1)
    pos = jnp.asarray(rs.uniform(-PC, PC, (B, 3)), jnp.float32)
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    act = jnp.ones((B,), bool)
    sig = jnp.full((B,), sigma, jnp.float32)
    nmax, rows = tabs.nmax, tabs.rows

    # dtau: per substep per slab: 3 axes x rows broadcast-compare-select
    # VPU ops over B lanes ~ 6 ops each
    vpu_ops = 3 * nmax * (3 * rows) * B * 6
    def dtau_step(x):
        o = sw.sweep_dtau(tabs, pos + x * 0.0, d, sig, act)
        return x + o[0, :1] * 0.0
    dt = chain_time("sweep_dtau", dtau_step, jnp.zeros((1,), jnp.float32))
    print(f"    select-loop ~{vpu_ops/dt/1e12:.2f} Tops/s VPU-equivalent "
          f"(v5e VPU ~ 4-8 native Tops/s incl. fusion)")

    dtau_slab = sw.sweep_dtau(tabs, pos, d, sig, act)
    grp = sw.dominant_axis(tabs, d)
    dmaj = jnp.take_along_axis(d, grp[:, None], 1)[:, 0]
    tb, tp = sw.slab_prefix(dtau_slab, dmaj > 0)
    scale = jnp.ones((nmax, B), jnp.float32) * jnp.exp(-tb)
    rel = 0.7 * tp[None, :] - tb

    # deposit: per substep per slab one (128, lb)x(lb, 128) MXU matmul pair
    mxu_flops = 3 * nmax * B * 128 * 128 * 2 * 2
    def dep_step(x):
        rfd, s_i, ic, fn = sw.sweep_deposit(tabs, pos + x * 0.0, d, sig,
                                            act, scale, rel)
        return x + s_i[:1] * 0.0
    dt = chain_time("sweep_deposit", dep_step,
                    jnp.zeros((1,), jnp.float32), flops=mxu_flops)
    print(f"    one-hot deposit matmuls at {mxu_flops/dt/1e12:.1f} TFLOP/s "
          f"(v5e f32 MXU peak ~ 49; bf16 197)")

    print("== roofline: 128^3 streamed XL engine, B=65536")
    from skirt9_tpu.transport import sweepxl as xl
    grid2 = make_cartesian(((-1.2 * PC, 1.2 * PC),) * 3, (128,) * 3)
    nd2 = msys.uniform_density_sphere(grid2, 2.0, sigma, PC)
    med2 = msys.make_medium(grid2, nd2, np.array([0.4e-6, 0.7e-6]),
                            sigma_ext=np.array([[sigma, sigma]]),
                            albedo=np.full((1, 2), 0.6),
                            g=np.full((1, 2), 0.5))
    tabs2 = xl.build_tables(grid2, med2)
    B2 = 1 << 16
    pos2 = jnp.asarray(rs.uniform(-PC, PC, (B2, 3)), jnp.float32)
    d2 = jnp.asarray(d[:B2])
    act2 = jnp.ones((B2,), bool)
    sig2 = jnp.full((B2,), sigma, jnp.float32)
    U = V = 128
    # lookup: per substep-slab: (3U x V) x lb one-hot matmul (f32 HIGHEST
    # ~ 6 bf16 passes -> count raw MACs once)
    look_flops = 3 * 128 * B2 * (3 * U) * V * 2
    def xl_step(x):
        o = xl.sweep_dtau(tabs2, pos2 + x * 0.0, d2, sig2, act2,
                          want_sub=True)
        return x + o[0, 0, :1] * 0.0
    dt = chain_time("xl.sweep_dtau 128^3", xl_step,
                    jnp.zeros((1,), jnp.float32), flops=look_flops, K=8)
    print(f"    one-hot lookups {look_flops/dt/1e12:.1f} TFLOP/s raw "
          f"(x6 passes at HIGHEST -> ~{6*look_flops/dt/1e12:.0f} bf16)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("3", "all"):
        profile_config3()
    if which in ("5", "all"):
        profile_config5()
    if which in ("roofline", "all"):
        roofline()
