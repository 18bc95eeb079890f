"""Slab-sweep transport engine: Pallas TPU kernels for the ray-march hot path.

Why this exists. The reference's per-packet grid traversal
(ref: SKIRT/core/CartesianSpatialGrid.cpp:87 segment generator +
SKIRT/core/MediumSystem.cpp:849 setExtinctionOpticalDepths +
SKIRT/core/MediumSystem.cpp:1294 radiation-field LockFree accumulation) is a
gather/scatter workload: every cell crossing reads a per-cell density and
every segment deposits into a per-cell table.  On TPU, XLA lowers *any*
indexed access (gather, scatter-add, even lane-wise take_along_axis) to a
serialized ~7 ns/element path (~0.15 Gelem/s measured on v5e) — 1000x below
the VPU — so per-cell marching is memory-system-hostile no matter how it is
phrased at the jnp level.

The TPU-native redesign here restructures the traversal into a *slab sweep*
(shear-warp factorization): each packet is assigned its dominant axis; the
kernel iterates over the ≤ n_major slabs of that axis.  A ray crosses the
slabs of its dominant axis monotonically and visits at most 3 cells per slab,
so a bounded 3-step sub-DDA per slab enumerates exactly the cells the
reference's segment generator would.  The payoffs:

  * per-slab density rows are dense `(rows,128)` VMEM tiles; the per-cell
    density lookup becomes a lane-wise `take_along_axis` select-loop at
    ~16 Gelem/s (measured) — 100x XLA's gather;
  * radiation-field deposits become a lane-flattened one-hot matmul pair on
    the MXU, accumulated into a per-axis VMEM scratch (~6 Gelem/s measured)
    — the TPU equivalent of the reference's `LockFree::add` CAS loop
    (ref: SKIRT/utils/LockFree.hpp:24);
  * cumulative optical depth per slab is a *dense* `(n_major, B)` prefix sum
    done in XLA (slab order is ray order up to a flip by the sign of the
    dominant direction component), replacing the reference's per-packet
    segment array + binary search
    (ref: SKIRT/utils/SpatialGridPath.hpp:93-155).

Two kernels:
  pass 1 `sweep_dtau`    : per-slab optical depth table  (n_major, B)
  pass 2 `sweep_deposit` : RF deposits (exact path integral of L e^-tau per
                           cell) + exact interaction-point resolution given
                           the sampled interaction optical depth.

Scope (v2): `UniformCartesianGrid`, up to ~4 medium components (per-lane
per-component sigma, constant along the path — panchromatic is fine, no
per-cell kinematic wavelength shifts), and wavelength-binned radiation
fields via bin-pure lane groups (stratified launch, see
sources.base stratified sampling + Simulation batch layout): each group's
deposits accumulate into a separate slab block selected by a static
program-id map.  Everything else falls back to the general scan-based march
in `lifecycle.py`.  Grids up to ~72^3 (3*minor_rows <= 128) fit the deposit
row encoding and VMEM budget.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3e37  # python float: jnp scalars would be captured as consts in kernels
LANE_BLOCK = 8192          # default lanes per kernel program: (64, 128)


class SweepTables(NamedTuple):
    """Per-axis-major slab density tables + static grid geometry."""

    rho: jax.Array          # (C, 3, n_major_max, rows, 128) f32 number density
    # static python metadata (hashable; the kernels close over it)
    n: tuple                # (nx, ny, nz)
    lo: tuple               # (x0, y0, z0) floats
    h: tuple                # cell sizes
    nmax: int               # padded slab count
    rows: int               # minor-plane rows of 128

    @property
    def ncomp(self) -> int:
        return self.rho.shape[0]


def supports_sweep(grid, med) -> bool:
    """True when (grid, medium) fits the sweep kernels."""
    import os

    from ..grids.cartesian import UniformCartesianGrid

    if (jax.default_backend() not in ("tpu", "axon")
            and os.environ.get("SKIRT9_TPU_FORCE_SWEEP") != "1"):
        # interpret-mode kernels are correct but far too slow for CPU runs;
        # the scan-based march stays the CPU path
        return False
    if not isinstance(grid, UniformCartesianGrid):
        return False
    nx, ny, nz = grid.shape
    minor = max(ny * nz, nx * nz, nx * ny)
    if 3 * (-(-minor // 128)) > 128:
        # the deposit matmul encodes (axis, minor-row) in 128 output rows
        return False
    if max(nx, ny, nz) > 256:
        return False
    # VMEM budget: per-component slab tables + one bin group's accumulator
    nmax = max(nx, ny, nz)
    rows = -(-minor // 128)
    vmem = (med.ncomp * 3 + 3) * nmax * rows * 128 * 4
    if med.ncomp > 4 or vmem > 10 * 2**20:
        return False
    return True


def build_tables(grid, med) -> SweepTables:
    """Build the three axis-major slab layouts of the density field,
    one set per medium component."""
    nx, ny, nz = grid.shape
    C = med.ncomp
    nmax = max(nx, ny, nz)
    minor = max(ny * nz, nx * nz, nx * ny)
    rows = -(-minor // 128)
    tab = np.zeros((C, 3, nmax, rows * 128), np.float32)
    for c in range(C):
        rho3d = np.asarray(med.nd[:, c]).reshape(nx, ny, nz)
        tab[c, 0, :nx, : ny * nz] = rho3d.reshape(nx, ny * nz)
        tab[c, 1, :ny, : nx * nz] = rho3d.transpose(1, 0, 2).reshape(ny, nx * nz)
        tab[c, 2, :nz, : nx * ny] = rho3d.transpose(2, 0, 1).reshape(nz, nx * ny)
    lo = np.asarray(grid.lo, np.float64)
    h = np.asarray(grid.h, np.float64)
    return SweepTables(
        rho=jnp.asarray(tab.reshape(C, 3, nmax, rows, 128)),
        n=(nx, ny, nz),
        lo=(float(lo[0]), float(lo[1]), float(lo[2])),
        h=(float(h[0]), float(h[1]), float(h[2])),
        nmax=nmax,
        rows=rows,
    )


# ------------------------------------------------------------------ helpers

def _sel3(a, x0, x1, x2):
    return jnp.where(a == 0, x0, jnp.where(a == 1, x1, x2))


def _lookup(rho_ref, c, a, t, m, rows, axes=(0, 1, 2)):
    """Per-lane density lookup from the (C, 3, nmax, rows, 128) slab tables
    for component c.

    The lane-wise take_along_axis select-loop replaces a serialized XLA
    gather (measured ~16 Gelem/s vs 0.15).  m is the flat minor index.
    `axes` restricts the layout loop when the dominant axis is statically
    known (shared-observer peel-off marches) — a 3x cheaper select loop.
    """
    row = m >> 7
    col = m & 127
    shape = m.shape
    acc = jnp.zeros(shape, jnp.float32)
    for aa in axes:
        amask = a == aa
        for r in range(rows):
            rv = jnp.broadcast_to(rho_ref[c, aa, t, r, :].reshape(1, 128),
                                  shape)
            g = jnp.take_along_axis(rv, col, axis=1)
            acc = acc + jnp.where(amask & (row == r), g, 0.0)
    return acc


def _nd_dot_sig(rho_ref, sig_ref, a, t, m, rows, C, axes=(0, 1, 2)):
    """Total extinction coefficient sum_c nd_c(cell) * sigma_c(lane)."""
    acc = _lookup(rho_ref, 0, a, t, m, rows, axes) * sig_ref[0]
    for c in range(1, C):
        acc = acc + _lookup(rho_ref, c, a, t, m, rows, axes) * sig_ref[c]
    return acc


def _axis_geometry(a, pos, dirn, n, lo, h):
    """Per-lane major/minor decomposition for dominant axis a (…,128 tiles).

    Returns dict of per-lane scalars: major (p, d, lo, h), minor u/v
    (p, d, lo, inv_h, h, n) with the fixed minor order
    a=0 -> (u,v)=(y,z); a=1 -> (x,z); a=2 -> (x,y).
    """
    px, py, pz = pos
    dx, dy, dz = dirn
    g = {}
    g["pa"] = _sel3(a, px, py, pz)
    g["da"] = _sel3(a, dx, dy, dz)
    g["loa"] = _sel3(a, lo[0], lo[1], lo[2])
    g["ha"] = _sel3(a, h[0], h[1], h[2])
    g["pu"] = _sel3(a, py, px, px)
    g["du"] = _sel3(a, dy, dx, dx)
    g["lou"] = _sel3(a, lo[1], lo[0], lo[0])
    g["hu"] = _sel3(a, h[1], h[0], h[0])
    g["nu"] = _sel3(a, n[1], n[0], n[0])
    g["pv"] = _sel3(a, pz, pz, py)
    g["dv"] = _sel3(a, dz, dz, dy)
    g["lov"] = _sel3(a, lo[2], lo[2], lo[1])
    g["hv"] = _sel3(a, h[2], h[2], h[1])
    g["nv"] = _sel3(a, n[2], n[2], n[1])
    return g


def _slab_entry(g, t, smin, smax):
    """Intersection [s_in, s_out) of the ray with major slab t, clipped to
    the in-grid parameter range [smin, smax)."""
    tiny = jnp.abs(g["da"]) < 1e-30
    inv_da = 1.0 / jnp.where(tiny, 1.0, g["da"])
    b0 = g["loa"] + t.astype(jnp.float32) * g["ha"]
    s0 = (b0 - g["pa"]) * inv_da
    s1 = (b0 + g["ha"] - g["pa"]) * inv_da
    slo = jnp.minimum(s0, s1)
    shi = jnp.maximum(s0, s1)
    s_in = jnp.maximum(jnp.where(tiny, smin, slo), smin)
    s_out = jnp.minimum(jnp.where(tiny, smax, shi), smax)
    return s_in, s_out


def _minor_idx(g, s):
    """Minor cell indices at path parameter s (clamped)."""
    iu = jnp.floor((g["pu"] + s * g["du"] - g["lou"]) / g["hu"]).astype(jnp.int32)
    iv = jnp.floor((g["pv"] + s * g["dv"] - g["lov"]) / g["hv"]).astype(jnp.int32)
    iu = jnp.clip(iu, 0, g["nu"] - 1)
    iv = jnp.clip(iv, 0, g["nv"] - 1)
    return iu, iv


def _minor_crossing(g, iu, iv):
    """Path parameters of the next minor-axis border crossings."""
    tiny_u = jnp.abs(g["du"]) < 1e-30
    tiny_v = jnp.abs(g["dv"]) < 1e-30
    bu = g["lou"] + (iu + (g["du"] > 0)).astype(jnp.float32) * g["hu"]
    bv = g["lov"] + (iv + (g["dv"] > 0)).astype(jnp.float32) * g["hv"]
    su = jnp.where(tiny_u, _BIG, (bu - g["pu"]) / jnp.where(tiny_u, 1.0, g["du"]))
    sv = jnp.where(tiny_v, _BIG, (bv - g["pv"]) / jnp.where(tiny_v, 1.0, g["dv"]))
    return su, sv


# ------------------------------------------------------------------ kernels

def _dtau_kernel(pos_ref, dir_ref, grp_ref, smin_ref, smax_ref, sig_ref,
                 rho_ref, out_ref, *, n, lo, h, nmax, rows, lb, C,
                 axes=(0, 1, 2)):
    a = grp_ref[...]
    pos = (pos_ref[0], pos_ref[1], pos_ref[2])
    dirn = (dir_ref[0], dir_ref[1], dir_ref[2])
    smin = smin_ref[...]
    smax = smax_ref[...]
    sig = tuple(sig_ref[c] for c in range(C))
    g = _axis_geometry(a, pos, dirn, n, lo, h)

    def slab(t, _):
        s_in, s_out = _slab_entry(g, t, smin, smax)
        act = s_in < s_out
        span = s_out - s_in
        s_cur = s_in
        iu, iv = _minor_idx(g, s_in + 1e-4 * span)
        dtau = jnp.zeros_like(s_in)
        for _j in range(3):
            su, sv = _minor_crossing(g, iu, iv)
            s_nxt = jnp.minimum(jnp.minimum(su, sv), s_out)
            ds = jnp.maximum(s_nxt - s_cur, 0.0) * act
            m = iu * g["nv"] + iv
            k = _nd_dot_sig(rho_ref, sig, a, t, m, rows, C, axes)
            dtau = dtau + k * ds
            cross_u = su <= sv
            iu = jnp.clip(iu + jnp.where(cross_u, jnp.where(g["du"] > 0, 1, -1), 0),
                          0, g["nu"] - 1)
            iv = jnp.clip(iv + jnp.where(cross_u, 0, jnp.where(g["dv"] > 0, 1, -1)),
                          0, g["nv"] - 1)
            s_cur = s_nxt
        out_ref[t] = dtau
        return 0

    jax.lax.fori_loop(0, nmax, slab, 0)


def _deposit_kernel(pos_ref, dir_ref, grp_ref, smin_ref, smax_ref, sig_ref,
                    scale_ref, rel_ref, rho_ref,
                    acc_ref, sint_ref, icell_ref, found_ref,
                    *, n, lo, h, nmax, rows, lb, C, ppb):
    gidx = pl.program_id(0)

    # one accumulator block per bin group (ppb consecutive programs share it)
    @pl.when(gidx % ppb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = grp_ref[...]
    pos = (pos_ref[0], pos_ref[1], pos_ref[2])
    dirn = (dir_ref[0], dir_ref[1], dir_ref[2])
    smin = smin_ref[...]
    smax = smax_ref[...]
    sig = tuple(sig_ref[c] for c in range(C))
    g = _axis_geometry(a, pos, dirn, n, lo, h)

    sint_ref[...] = jnp.zeros_like(smin)
    icell_ref[...] = jnp.full(smin.shape, -1, jnp.int32)
    found_ref[...] = jnp.zeros(smin.shape, jnp.int32)

    # global-cell strides per lane's axis layout: cell = (ix*ny + iy)*nz + iz
    nx, ny, nz = n
    # contributions of (t, iu, iv) to the flat cell index per axis:
    #   a=0: ix=t,  iy=iu, iz=iv
    #   a=1: ix=iu, iy=t,  iz=iv
    #   a=2: ix=iu, iy=iv, iz=t
    t_stride = _sel3(a, ny * nz, nz, 1)
    u_stride = _sel3(a, nz, ny * nz, ny * nz)
    v_stride = _sel3(a, 1, 1, nz)

    def slab(t, _):
        s_in, s_out = _slab_entry(g, t, smin, smax)
        act = s_in < s_out
        span = s_out - s_in
        s_cur = s_in
        iu, iv = _minor_idx(g, s_in + 1e-4 * span)
        scale = scale_ref[t]            # L * exp(-tau_before_slab) (ray order)
        rel = rel_ref[t]                # tau_int - tau_before_slab
        tau_loc = jnp.zeros_like(s_in)
        for _j in range(3):
            su, sv = _minor_crossing(g, iu, iv)
            s_nxt = jnp.minimum(jnp.minimum(su, sv), s_out)
            ds = jnp.maximum(s_nxt - s_cur, 0.0) * act
            m = iu * g["nv"] + iv
            k = _nd_dot_sig(rho_ref, sig, a, t, m, rows, C)
            dtau = k * ds
            # ---- RF deposit: exact integral of L e^-tau over the segment
            small = dtau < 1e-3
            # NB expm1 is not lowerable in Mosaic; the small-dtau branch
            # covers the cancellation-sensitive range
            gfac = jnp.where(small, 1.0 - 0.5 * dtau,
                             (1.0 - jnp.exp(-jnp.minimum(dtau, 80.0)))
                             / jnp.maximum(dtau, 1e-37))
            contrib = scale * jnp.exp(-tau_loc) * ds * gfac
            # scatter into the slab accumulator via the lane-flat one-hot
            # matmul pair (MXU): the output row encodes (axis, minor-row) as
            # a*rows + (m>>7), so one matmul serves all three axis layouts
            # (requires 3*rows <= 128, enforced by supports_sweep)
            mf = m.reshape(1, lb)
            cf = mf & 127
            rf_ = a.reshape(1, lb) * rows + (mf >> 7)
            sub = jax.lax.broadcasted_iota(jnp.int32, (128, lb), 0)
            Bm = jnp.where(sub == cf, 1.0, 0.0)
            A = jnp.where(sub == rf_, contrib.reshape(1, lb), 0.0)
            tile = jax.lax.dot_general(A, Bm, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            acc_ref[0, t] += tile[: 3 * rows]
            # ---- interaction point: first sub-segment where the local
            # cumulative tau crosses rel (= tau_int - tau_before_slab)
            rem = rel - tau_loc
            hit = act & (rem >= 0.0) & (rem < dtau) & (found_ref[...] == 0)
            frac = rem / jnp.maximum(dtau, 1e-37)
            s_hit = s_cur + frac * ds
            cell = (t * t_stride + iu * u_stride + iv * v_stride)
            sint_ref[...] = jnp.where(hit, s_hit, sint_ref[...])
            icell_ref[...] = jnp.where(hit, cell, icell_ref[...])
            found_ref[...] = jnp.where(hit, 1, found_ref[...])

            tau_loc = tau_loc + dtau
            cross_u = su <= sv
            iu = jnp.clip(iu + jnp.where(cross_u, jnp.where(g["du"] > 0, 1, -1), 0),
                          0, g["nu"] - 1)
            iv = jnp.clip(iv + jnp.where(cross_u, 0, jnp.where(g["dv"] > 0, 1, -1)),
                          0, g["nv"] - 1)
            s_cur = s_nxt
        return 0

    jax.lax.fori_loop(0, nmax, slab, 0)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _lane_block(NB: int, n_groups: int = 1) -> int:
    """Largest supported lanes-per-program dividing a bin group.

    With n_groups bin-pure lane groups (stratified panchromatic launch),
    every group of NB//n_groups rows is covered by an integral number of
    programs so the per-program accumulator block maps 1:1 onto bins.
    """
    if NB % n_groups:
        raise ValueError(f"{NB} row batch not divisible into {n_groups} groups")
    grows = NB // n_groups
    # largest divisor of the group's rows within the VMEM-friendly bound;
    # Mosaic requires the sublane block dim divisible by 8 (f32 tiling)
    # unless it equals the full array dim
    cap = LANE_BLOCK // 128
    best = None
    for d in range(1, grows + 1):
        if grows % d == 0 and d <= cap and (d % 8 == 0 or d == NB):
            best = d
    if best is None:
        if grows == NB:
            best = grows  # single block spanning the array dim
        elif _interpret():
            # interpret mode (CPU tests) has no Mosaic sublane-tiling rule;
            # any divisor of the group works
            best = max(d for d in range(1, grows + 1)
                       if grows % d == 0 and d <= cap)
        else:
            raise ValueError(
                f"bin group of {grows} lane-rows has no 8-divisible block; "
                f"round the batch to a multiple of 1024*n_groups")
    return best * 128


def dominant_axis(tabs, dirn):
    """Slab axis per lane: the axis with the highest CELL-crossing rate
    |dir_i|/h_i. For anisotropic cells a plain argmax|dir| would let the
    minor coordinate cross >1 cell per slab and break the 3-substep
    sub-DDA bound (round-3 bugfix, caught by the bintree tests)."""
    inv_h = jnp.asarray([1.0 / tabs.h[0], 1.0 / tabs.h[1], 1.0 / tabs.h[2]],
                        jnp.float32)
    return jnp.argmax(jnp.abs(dirn) * inv_h, axis=-1).astype(jnp.int32)


def _prep(tabs: SweepTables, pos, dirn, sigma, active):
    """XLA-side per-lane setup: dominant axis, in-grid parameter range.

    sigma: (B,) or (C, B) per-lane per-component cross sections.
    """
    B = pos.shape[0]
    lo = jnp.asarray(tabs.lo, jnp.float32)
    hi = lo + jnp.asarray(tabs.n, jnp.float32) * jnp.asarray(tabs.h, jnp.float32)
    group = dominant_axis(tabs, dirn)
    tiny = jnp.abs(dirn) < 1e-30
    inv = 1.0 / jnp.where(tiny, 1e-30, dirn)
    t1 = (lo[None] - pos) * inv
    t2 = (hi[None] - pos) * inv
    smin = jnp.maximum(jnp.max(jnp.where(tiny, -_BIG, jnp.minimum(t1, t2)), axis=-1), 0.0)
    smax = jnp.min(jnp.where(tiny, _BIG, jnp.maximum(t1, t2)), axis=-1)
    # a tiny direction component contributes no s bound, so the ray only
    # intersects the box if its POSITION lies within that dimension's
    # range (matters for DD subgrid boxes: an axis-aligned peel ray
    # outside the slab's x-range must integrate nothing here)
    inbox = ~jnp.any(tiny & ((pos < lo[None]) | (pos >= hi[None])), axis=-1)
    smax = jnp.where(active & inbox & (smax > smin), smax, smin)
    NB = B // 128

    def tile(x, dt=jnp.float32):
        return x.astype(dt).reshape(NB, 128)

    if sigma.ndim == 1:
        sigma = sigma[None, :]
    sig3 = sigma.astype(jnp.float32).reshape(sigma.shape[0], NB, 128)
    pos3 = jnp.stack([tile(pos[:, i]) for i in range(3)])      # (3,NB,128)
    dir3 = jnp.stack([tile(dirn[:, i]) for i in range(3)])
    return (pos3, dir3, tile(group, jnp.int32), tile(smin), tile(smax),
            sig3, NB)


def sweep_dtau(tabs: SweepTables, pos, dirn, sigma, active,
               axis_hint: int | None = None):
    """Per-slab optical depth table: (nmax, B) f32.

    Replaces the geometric march + per-step opacity gathers of
    `lifecycle.march_record` (pass 1) for supported grids. axis_hint: the
    statically known dominant axis shared by ALL lanes (peel-off marches
    toward one observer) — specializes the kernel to one slab layout.
    """
    pos3, dir3, grp, smin, smax, sig, NB = _prep(tabs, pos, dirn, sigma, active)
    C = sig.shape[0]
    axes = (0, 1, 2) if axis_hint is None else (int(axis_hint),)
    if axis_hint is not None:
        grp = jnp.full_like(grp, axis_hint)
    lb = _lane_block(NB)
    lbr = lb // 128
    meta = dict(n=tabs.n, lo=tabs.lo, h=tabs.h, nmax=tabs.nmax, rows=tabs.rows,
                lb=lb, C=C, axes=axes)
    kern = functools.partial(_dtau_kernel, **meta)
    G = NB // lbr
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((3, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3, tabs.nmax, tabs.rows, 128),
                         lambda g: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tabs.nmax, lbr, 128), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tabs.nmax, NB, 128), jnp.float32),
        interpret=_interpret(),
    )(pos3, dir3, grp, smin, smax, sig, tabs.rho)
    return out.reshape(tabs.nmax, NB * 128)


def sweep_deposit(tabs: SweepTables, pos, dirn, sigma, active,
                  scale_slab, rel_slab, n_groups: int = 1):
    """Pass 2: RF deposits + interaction resolution.

    scale_slab, rel_slab: (nmax, B) — L·exp(-tau_before) per slab and
    (tau_int - tau_before) per slab, both in ray order (built densely in XLA
    from pass 1's table).

    n_groups: number of contiguous bin-pure lane groups in the batch layout
    (stratified panchromatic launch); each group accumulates into its own
    radiation-field slab block, selected by a static program-id map, so the
    per-bin deposit costs no extra VMEM and no extra matmuls.

    Returns (rf_delta (n_groups, ncells), s_int (B,), icell (B,),
    found (B,) bool).
    """
    pos3, dir3, grp, smin, smax, sig, NB = _prep(tabs, pos, dirn, sigma, active)
    C = sig.shape[0]
    lb = _lane_block(NB, n_groups)
    lbr = lb // 128
    nmax, rows = tabs.nmax, tabs.rows
    G = NB // lbr
    ppb = G // n_groups  # programs per bin group
    meta = dict(n=tabs.n, lo=tabs.lo, h=tabs.h, nmax=nmax, rows=rows, lb=lb,
                C=C, ppb=ppb)
    kern = functools.partial(_deposit_kernel, **meta)
    scale3 = scale_slab.reshape(nmax, NB, 128)
    rel3 = rel_slab.reshape(nmax, NB, 128)
    acc, s_int, icell, found = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((3, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nmax, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nmax, lbr, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3, nmax, rows, 128), lambda g: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nmax, 3 * rows, 128), lambda g: (g // ppb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_groups, nmax, 3 * rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((NB, 128), jnp.float32),
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),
            jax.ShapeDtypeStruct((NB, 128), jnp.int32),
        ),
        interpret=_interpret(),
    )(pos3, dir3, grp, smin, smax, sig, scale3, rel3, tabs.rho)

    nx, ny, nz = tabs.n
    R = n_groups
    # split the combined accumulator (row = axis*rows + minor_row) and
    # recombine the three axis-major layouts into the flat cell table,
    # batched over the bin groups
    acc3 = acc.reshape(R, nmax, 3, rows * 128).transpose(2, 0, 1, 3)
    rf = acc3[0][:, :nx, : ny * nz].reshape(R, nx, ny, nz)
    rf = rf + acc3[1][:, :ny, : nx * nz].reshape(R, ny, nx, nz).transpose(0, 2, 1, 3)
    rf = rf + acc3[2][:, :nz, : nx * ny].reshape(R, nz, nx, ny).transpose(0, 2, 3, 1)
    B = NB * 128
    return (rf.reshape(R, -1), s_int.reshape(B), icell.reshape(B),
            found.reshape(B) != 0)


def slab_prefix(dtau_slab, d_major_pos):
    """Ray-ordered cumulative optical depth before each slab.

    dtau_slab: (nmax, B); d_major_pos: (B,) bool (dominant component > 0).
    Slab order equals ray order when the dominant direction component is
    positive; otherwise it is reversed.
    """
    nmax = dtau_slab.shape[0]
    total = jnp.sum(dtau_slab, axis=0)
    # strictly-lower-triangular ones matmul on the MXU: ~10x faster than
    # XLA's log-depth cumsum at (nmax, B) sweep shapes (measured round 5);
    # HIGHEST precision keeps the f32 tau sums exact-to-f32
    L = jnp.tril(jnp.ones((nmax, nmax), jnp.float32), -1)
    before_up = jax.lax.dot_general(L, dtau_slab, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
    before_dn = total[None, :] - before_up - dtau_slab
    return jnp.where(d_major_pos[None, :], before_up, before_dn), total
