"""Large-grid slab sweep: MXU one-hot transport for 128^3/256^3 grids.

The round-3 sweep engine (transport/sweep.py) keeps whole density layouts
in VMEM and looks cells up with an O(minor-rows) select loop — both stop
scaling at ~73^3 (VMEM and the 128-row deposit encoding). This engine is
the scale-out redesign:

  * density planes STREAM through VMEM slab-tile by slab-tile (the Pallas
    grid iterates over slab tiles; XLA pipelines the HBM copies);
  * the per-lane density lookup is a ONE-HOT MATMUL: a (U, lanes) one-hot
    of the minor-u row against the slab's (U, V) plane gives each lane its
    candidate minor row on the MXU, and a V-wide masked reduction picks
    the (iv) entry — O(U·V) MACs per lookup on the 100+ TFLOP/s unit
    instead of O(rows) VPU passes. (Measured: Mosaic has no per-lane
    sublane gather — take_along_axis(axis=0) fails to lower — so matmul
    one-hots are the only sub-O(rows) primitive;
    tools/bench_sublane_gather.py.)
  * the AXIS LAYOUT is a grid dimension (round-5 redesign): lanes are
    sorted by dominant axis per event (transport/lifecycle.py), so each
    lane block usually holds ONE axis and the kernel pays U·V MACs per
    lookup instead of 3U·V — `pl.when` skips the two foreign axis passes
    outright. Blocks that do mix axes stay exact (each axis pass covers
    its own lanes); sorting is a performance contract, not a correctness
    one.
  * a slab crossing touches at most a 2x2 minor patch (|d_minor| <=
    |d_major| bounds each minor axis to one crossing per slab), so TWO
    row matmuls — at the entry row iu0 and the exit row iu2 — serve all
    three substeps; the middle substep selects between them per lane.
    2 x (hi+lo) = 4 MXU passes per slab instead of 6.
  * each block clips its slab loop to the [tmin, tmax] window its lanes
    actually traverse (dynamic fori bounds) — interior launch points and
    one-sided peel-off rays skip roughly half the major axis.
  * pass 1 emits the PER-SUBSTEP optical depths (nmax, 3, B); the
    interaction point then resolves entirely in XLA (find the crossing
    slab from the prefix table, re-derive the <=3 sub-segments of that one
    slab per lane with vector math) — pass 2 needs no density access at
    all;
  * density planes split hi/lo in bf16: two native-MXU bf16 passes
    reconstruct f32 densities to ~2^-16 relative (hi = bf16(rho),
    lo = bf16(rho - hi)); same bytes as one f32 copy, 3x fewer MXU
    passes than an f32 HIGHEST dot.

Scope: UniformCartesianGrid beyond supports_sweep's ceiling, axes up to
512, <=4 components. Cost scales with the per-axis minor-plane AREA per
lane (U*V MACs per row lookup). The engine logs its choice; see
BASELINE.md roofline notes.

Ref for the capability: SKIRT routinely runs 256^3 grids and 10^6-cell
trees (SKIRT/core/TreeSpatialGrid.cpp:37-90); its per-crossing cost is
pointer-chasing on CPU caches, ours is MXU broadcast work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sweep as sw

_BIG = 3e37


class XLTables(NamedTuple):
    """Streamed slab-plane tables + static geometry."""

    # (C, nmax, 3, U, V) bf16: per slab, one (U, V) minor plane per axis
    # layout (a=0: slab=x,(u,v)=(y,z); a=1: slab=y,(x,z); a=2: slab=z,
    # (x,y)), zero-padded to the max axis
    rho_hi: jax.Array
    rho_lo: jax.Array     # (C, nmax, 3, U, V) bf16 residual
    n: tuple              # (nx, ny, nz)
    lo: tuple
    h: tuple
    nmax: int
    U: int                # padded minor-u size (max over axes)
    V: int                # padded minor-v size
    occ: tuple            # per-axis occupied slab range ((lo, hi),)*3:
    #                       slabs outside carry zero density in every
    #                       component, so the kernels clip their loops
    cellmap: jax.Array | None = None
    #                       (nvox,) voxel -> original cell id (tree-raster
    #                       mode: the tables live on a tree's fine voxel
    #                       grid — EXACT, leaves are voxel unions — and
    #                       interaction cells map back through this)
    rs: jax.Array | None = None
    #                       (C, 3, nmax, U) f32 per-row scales when the
    #                       planes are int8-quantized (rho_hi/rho_lo hold
    #                       q1/q2 int8; rho = (127*q1 + q2) * rs / 127^2,
    #                       |err| <= rs/(2*127^2) = 3.1e-5 * rowmax). int8
    #                       dots run ~1.5x the bf16 pair on the MXU; the
    #                       build gates on per-row density contrast so the
    #                       worst-cell relative error stays <= 5e-4.

    @property
    def ncomp(self) -> int:
        return self.rho_hi.shape[0]

    @property
    def quant(self) -> bool:
        return self.rs is not None


def supports_xl(grid, med) -> bool:
    import os

    from ..grids.cartesian import UniformCartesianGrid

    if (jax.default_backend() not in ("tpu", "axon")
            and os.environ.get("SKIRT9_TPU_FORCE_SWEEP") != "1"):
        return False
    if not isinstance(grid, UniformCartesianGrid):
        return False
    nx, ny, nz = grid.shape
    if max(nx, ny, nz) > 512 or med.ncomp > 4:
        return False
    # below the resident-table engine's ceiling that engine is faster
    if sw.supports_sweep(grid, med):
        return False
    return True


def supports_tree_xl(grid, med) -> bool:
    """Power-of-two tree grids whose multi-level sweep encoding exceeded
    the mlsweep cap: the tree rasterizes EXACTLY onto its fine voxel grid
    (every leaf is an aligned voxel union, grids/amr + octree/bintree
    construction), so the streamed XL engine runs the transport at fine
    resolution and interaction cells map back through `cellmap`.
    Refinement-everywhere trees (1e5-1e6 leaves) thereby keep a fast
    engine instead of the ~40x scan march (ref capability:
    SKIRT/core/TreeSpatialGrid.cpp:37-90)."""
    import os

    if (jax.default_backend() not in ("tpu", "axon")
            and os.environ.get("SKIRT9_TPU_FORCE_SWEEP") != "1"):
        return False
    from ..grids.amr import AMRGrid
    from ..grids.bintree import BinTreeGrid
    from ..grids.octree import OctreeGrid
    if not isinstance(grid, (OctreeGrid, BinTreeGrid, AMRGrid)):
        return False
    if med.ncomp > 4:
        return False
    from . import mlsweep as ml
    try:
        meta = ml._analyze(grid)
    except Exception:
        return False
    nf = tuple(int(v) for v in meta["nf"])
    if max(nf) > 512:
        return False
    # hi+lo bf16 table bytes on the fine raster
    if med.ncomp * max(nf) * 3 * max(nf) * max(nf) * 4 > 2_500_000_000:
        return False
    # a tree whose every leaf IS a fine voxel would make the voxel-space
    # RF indistinguishable from the cell-space one by shape
    # (Simulation._rf_finalize aggregates by shape); such trees are
    # uniform grids in disguise — leave them to the other engines
    if int(np.prod(nf)) == grid.ncells:
        return False
    return True


def build_tree_tables(grid, med) -> XLTables:
    """XL tables on a tree's fine voxel raster (exact; see
    supports_tree_xl) + the voxel -> leaf-cell map."""
    from ..parallel import domain as dom

    vox_grid, med_vox, cellmap = dom.voxelize_for_dd(grid, med, 1)
    tabs = build_tables(vox_grid, med_vox)
    return tabs._replace(cellmap=cellmap)


_QUANT_CONTRAST = 16.0


def _quantize_rows(tab: np.ndarray):
    """int8 hi/lo row quantization of the (C, nmax, 3, U, V) planes.

    rho = (127*q1 + q2) * rs / 127^2 with per-row scale rs = rowmax, so
    |err| <= rs/(2*127^2) = 3.1e-5 * rowmax per cell. Gated on per-row
    density contrast (max/min over nonzero cells <= 16) so the worst-cell
    RELATIVE error stays <= 5e-4 — beyond that the bf16 hi/lo pair
    (2^-16 relative per cell at any contrast) is the safe representation.
    Returns (q1, q2, rs) or None when the gate rejects."""
    if np.any(tab < 0.0):
        return None
    rowmax = tab.max(axis=4)
    nzmask = tab > 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        rowmin = np.where(nzmask, tab, np.inf).min(axis=4)
    occ_rows = np.isfinite(rowmin) & (rowmax > 0.0)
    contrast = np.where(occ_rows, rowmax / np.maximum(rowmin, 1e-300), 1.0)
    if float(contrast.max(initial=1.0)) > _QUANT_CONTRAST:
        return None
    rs = np.where(rowmax > 0.0, rowmax, 1.0).astype(np.float32)
    x = tab * (127.0 / rs[..., None])
    q1 = np.rint(x)
    r = x - q1
    q2 = np.clip(np.rint(r * 127.0), -127.0, 127.0)
    # rs laid out (C, 3, nmax, U): the streamed block keeps (T, U) as the
    # Mosaic-tileable trailing pair (a (.., 1, U) block is not)
    return (q1.astype(np.int8), q2.astype(np.int8),
            np.ascontiguousarray(rs.transpose(0, 2, 1, 3)))


def build_tables(grid, med) -> XLTables:
    nx, ny, nz = grid.shape
    n = (nx, ny, nz)
    C = med.ncomp
    nmax = max(n)
    # u axis per layout: a=0->y, a=1->x, a=2->x; v: z, z, y — pad both to
    # the max axis so the three planes stack into one uniform (3, U, V)
    U = max(n)
    V = max(n)
    tab = np.zeros((C, nmax, 3, U, V), np.float32)
    for c in range(C):
        r3 = np.asarray(med.nd[:, c]).reshape(nx, ny, nz)
        # a=0: slab=x, (u,v)=(y,z); a=1: slab=y,(x,z); a=2: slab=z,(x,y)
        tab[c, :nx, 0, :ny, :nz] = r3
        tab[c, :ny, 1, :nx, :nz] = r3.transpose(1, 0, 2)
        tab[c, :nz, 2, :nx, :ny] = r3.transpose(2, 0, 1)
    lo = np.asarray(grid.lo, np.float64)
    h = np.asarray(grid.h, np.float64)
    q = _quantize_rows(tab)
    if q is not None:
        hi_t = jnp.asarray(q[0])
        lo_t = jnp.asarray(q[1])
        rs_t = jnp.asarray(q[2])
    else:
        hi_t = jnp.asarray(tab, jnp.bfloat16)
        lo_t = jnp.asarray(tab - np.asarray(hi_t, np.float32),
                           jnp.bfloat16)
        rs_t = None
    try:
        from ..utils.log import default as _log
        _log().info(
            "sweepxl: density lookup planes "
            + ("int8 hi/lo + per-row scales (contrast-gated, "
               "|err| <= 3.1e-5 rowmax)" if q is not None
               else "bf16 hi/lo (row contrast > "
               f"{_QUANT_CONTRAST:g}: keeping 2^-16 per-cell exactness)"))
    except Exception:
        pass
    occ = []
    for a in range(3):
        nz = np.flatnonzero(np.abs(tab[:, :, a]).sum(axis=(0, 2, 3)) > 0)
        occ.append((int(nz[0]), int(nz[-1]) + 1) if nz.size
                   else (0, 0))
    return XLTables(
        rho_hi=hi_t,
        rho_lo=lo_t,
        n=n,
        lo=(float(lo[0]), float(lo[1]), float(lo[2])),
        h=(float(h[0]), float(h[1]), float(h[2])),
        nmax=nmax, U=U, V=V, occ=tuple(occ),
        rs=rs_t,
    )


def _tile_size(tabs: XLTables, per_slab: int,
               budget_mb: float = 6.0) -> int:
    """Slabs per kernel tile within the VMEM budget (doubled by the
    pipeline's prefetch buffer). Bigger tiles mean fewer grid steps —
    at 256^3 the per-step overhead is material."""
    t = max(1, int(budget_mb * 2**20 / max(per_slab, 1)))
    t = min(t, tabs.nmax)
    while tabs.nmax % t:
        t -= 1
    return t


def _tile_dtau(tabs: XLTables) -> int:
    # streamed rho tile: hi+lo (bf16 pair = 4B, int8 pair = 2B + row
    # scales), one axis plane, C components — PLUS the want_sub out tile
    # (T, 3, lbr, 128) f32 at the largest lane block (lbr=16), which the
    # scoped-vmem budget must cover too (the int8 tables halve the rho
    # bytes, and an unaccounted out tile then overflows the 16M limit)
    C = max(tabs.ncomp, 1)
    per = C * tabs.U * tabs.V * (2 if tabs.quant else 4)
    if tabs.quant:
        per += C * tabs.U * 4
    per += 3 * 16 * 128 * 4
    return _tile_size(tabs, per)


def _tile_deposit(tabs: XLTables) -> int:
    # resident accumulator tile: 3 axis planes f32 (+ small dsub/scale)
    return _tile_size(tabs, 3 * tabs.U * tabs.V * 4)


# ------------------------------------------------------------------ kernels

def _substeps(g, t, smin, smax):
    """The <=3 sub-segments of slab t for every lane: returns per-substep
    (ds, iu, iv, s_cur) with the same sub-DDA as transport/sweep.py."""
    s_in, s_out = sw._slab_entry(g, t, smin, smax)
    act = s_in < s_out
    span = s_out - s_in
    s_cur = s_in
    iu, iv = sw._minor_idx(g, s_in + 1e-4 * span)
    out = []
    for _j in range(3):
        su, sv = sw._minor_crossing(g, iu, iv)
        s_nxt = jnp.minimum(jnp.minimum(su, sv), s_out)
        ds = jnp.maximum(s_nxt - s_cur, 0.0) * act
        out.append((ds, iu, iv, s_cur))
        cross_u = su <= sv
        iu = jnp.clip(iu + jnp.where(cross_u,
                                     jnp.where(g["du"] > 0, 1, -1), 0),
                      0, g["nu"] - 1)
        iv = jnp.clip(iv + jnp.where(cross_u, 0,
                                     jnp.where(g["dv"] > 0, 1, -1)),
                      0, g["nv"] - 1)
        s_cur = s_nxt
    return out


def _block_window(g, mine, smin, smax, na, t0, T):
    """Local slab-loop bounds [lo, hi) for this block: the union of the
    slab ranges its (matching, active) lanes traverse, clipped to the
    tile, with a one-slab FP-safety margin."""
    ta0 = jnp.floor((g["pa"] + smin * g["da"] - g["loa"]) / g["ha"])
    ta1 = jnp.floor((g["pa"] + smax * g["da"] - g["loa"]) / g["ha"])
    tlo = jnp.minimum(ta0, ta1) - 1.0
    thi = jnp.maximum(ta0, ta1) + 1.0
    tlo = jnp.where(mine, tlo, _BIG)
    thi = jnp.where(mine, thi, -_BIG)
    na_f = jnp.asarray(na).astype(jnp.float32)
    t_lo = jnp.clip(jnp.min(tlo), 0.0, na_f).astype(jnp.int32)
    t_hi = jnp.clip(jnp.max(thi) + 1.0, 0.0, na_f).astype(jnp.int32)
    loop_lo = jnp.clip(t_lo - t0, 0, T)
    loop_hi = jnp.clip(t_hi - t0, 0, T)
    return loop_lo, loop_hi


def _row_onehots(iu0, iu2, U, lb):
    """bf16 one-hot row selectors (U, lb) for the two candidate minor
    rows of the slab's 2x2 patch (built in f32 — i1 masks can't relayout
    to the bf16 (16,128) tiling in this Mosaic — then cast; exact)."""
    usub = jax.lax.broadcasted_iota(jnp.int32, (U, lb), 0)
    ATa = jnp.where(usub == iu0.reshape(1, lb), 1.0, 0.0).astype(jnp.bfloat16)
    ATb = jnp.where(usub == iu2.reshape(1, lb), 1.0, 0.0).astype(jnp.bfloat16)
    return ATa, ATb


def _row_dot(rho_hi, rho_lo, AT):
    """(V, lb) f32 candidate minor row per lane: hi+lo bf16 MXU passes
    reconstruct the f32 densities to ~2^-16 relative."""
    MT = jax.lax.dot_general(rho_hi, AT, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return MT + jax.lax.dot_general(rho_lo, AT, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)


def _row_dot_i8(q1, q2, cmp):
    """(V, lb) int32 candidate row per lane, int8 MXU passes (~1.5x the
    bf16 pair): the hi one-hot carries WEIGHT 127 so the (127*q1 + q2)
    combine rides the MXU accumulator instead of a VPU pass; the caller
    rescales by rs/127^2 after the (cheap, small) extract."""
    AT127 = jnp.where(cmp, 127, 0).astype(jnp.int8)
    AT1 = jnp.where(cmp, 1, 0).astype(jnp.int8)
    M = jax.lax.dot_general(q1, AT127, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return M + jax.lax.dot_general(q2, AT1, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)


def _row_scale(rs_row, cmp, lbr):
    """(lbr, 128) f32 per-lane row scale rs[iu]/127^2 via a masked
    reduction of the row-compare mask against the (U,) scale vector."""
    sc = jnp.where(cmp, rs_row.reshape(-1, 1), 0.0)
    return (jnp.sum(sc, axis=0, keepdims=True).reshape(lbr, 128)
            * (1.0 / (127.0 * 127.0)))


def _extract(MT, vmask, lbr):
    return jnp.sum(jnp.where(vmask, MT, 0.0), axis=0,
                   keepdims=True).reshape(lbr, 128)


def _extract_i(MT, vmask, lbr):
    return jnp.sum(jnp.where(vmask, MT, 0), axis=0,
                   keepdims=True).reshape(lbr, 128)


def _xl_dtau_kernel(pos_ref, dir_ref, grp_ref, smin_ref, smax_ref, sig_ref,
                    rho_hi_ref, rho_lo_ref, *rest, n, lo, h, T, U, V,
                    lb, C, want_sub, t0_mul, occ, quant=False):
    if quant:
        rs_ref, out_ref = rest
    else:
        (out_ref,) = rest
    tidx = pl.program_id(0)
    a = pl.program_id(2)
    grp = grp_ref[...]
    smin = smin_ref[...]
    smax0 = smax_ref[...]
    mine = (grp == a) & (smax0 > smin)

    @pl.when(a == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.any(mine))
    def _():
        # foreign/inactive lanes collapse to an empty parameter range:
        # every ds they produce is zero, so += accumulation across the
        # three axis passes stays exact without per-lane writes masks
        smax = jnp.where(mine, smax0, smin)
        pos = (pos_ref[0], pos_ref[1], pos_ref[2])
        dirn = (dir_ref[0], dir_ref[1], dir_ref[2])
        sig = tuple(sig_ref[c] for c in range(C))
        g = sw._axis_geometry(a, pos, dirn, n, lo, h)
        lbr = lb // 128
        na = sw._sel3(a, n[0], n[1], n[2])
        t0 = tidx * t0_mul
        loop_lo, loop_hi = _block_window(g, mine, smin, smax, na, t0, T)
        # clip to the density-occupied slab range of this axis: outside
        # it every dtau is exactly zero (vacuum), so skipping is exact
        loop_lo = jnp.maximum(loop_lo,
                              sw._sel3(a, occ[0][0], occ[1][0],
                                       occ[2][0]) - t0)
        loop_hi = jnp.minimum(loop_hi,
                              sw._sel3(a, occ[0][1], occ[1][1],
                                       occ[2][1]) - t0)
        vsub = jax.lax.broadcasted_iota(jnp.int32, (V, lb), 0)

        def slab(tl, _):
            t = t0 + tl
            steps = _substeps(g, t, smin, smax)
            (ds0, iu0, iv0, _s0) = steps[0]
            (ds1, iu1, iv1, _s1) = steps[1]
            (ds2, iu2, iv2, _s2) = steps[2]
            # second candidate row: the u-crossing happens either at
            # j0->j1 (row iu1) or at j1->j2 (row iu2). When the slab is
            # exhausted early the DDA garbage-steps iu, so iu2 alone is
            # NOT reliable — but then the affected substeps have ds=0.
            same = iu1 == iu0
            rowb = jnp.where(same, iu2, iu1)
            vm0 = vsub == iv0.reshape(1, lb)
            vm1 = vsub == iv1.reshape(1, lb)
            vm2 = vsub == iv2.reshape(1, lb)
            k0 = k1 = k2 = jnp.zeros((lbr, 128), jnp.float32)
            if quant:
                usub = jax.lax.broadcasted_iota(jnp.int32, (U, lb), 0)
                cmp_a = usub == iu0.reshape(1, lb)
                cmp_b = usub == rowb.reshape(1, lb)
                for c in range(C):
                    MA = _row_dot_i8(rho_hi_ref[c, tl, 0],
                                     rho_lo_ref[c, tl, 0], cmp_a)
                    MB = _row_dot_i8(rho_hi_ref[c, tl, 0],
                                     rho_lo_ref[c, tl, 0], cmp_b)
                    rs_row = rs_ref[c, a, tl]
                    rs_a = _row_scale(rs_row, cmp_a, lbr)
                    rs_b = _row_scale(rs_row, cmp_b, lbr)
                    e0 = _extract_i(MA, vm0, lbr).astype(jnp.float32)
                    e1 = jnp.where(same, _extract_i(MA, vm1, lbr),
                                   _extract_i(MB, vm1, lbr)
                                   ).astype(jnp.float32)
                    e2 = _extract_i(MB, vm2, lbr).astype(jnp.float32)
                    rs_1 = jnp.where(same, rs_a, rs_b)
                    k0 = k0 + e0 * rs_a * sig[c]
                    k1 = k1 + e1 * rs_1 * sig[c]
                    k2 = k2 + e2 * rs_b * sig[c]
            else:
                ATa, ATb = _row_onehots(iu0, rowb, U, lb)
                for c in range(C):
                    MA = _row_dot(rho_hi_ref[c, tl, 0],
                                  rho_lo_ref[c, tl, 0], ATa)
                    MB = _row_dot(rho_hi_ref[c, tl, 0],
                                  rho_lo_ref[c, tl, 0], ATb)
                    k0 = k0 + _extract(MA, vm0, lbr) * sig[c]
                    k1 = k1 + jnp.where(same, _extract(MA, vm1, lbr),
                                        _extract(MB, vm1, lbr)) * sig[c]
                    k2 = k2 + _extract(MB, vm2, lbr) * sig[c]
            if want_sub:
                out_ref[tl, 0] += k0 * ds0
                out_ref[tl, 1] += k1 * ds1
                out_ref[tl, 2] += k2 * ds2
            else:
                out_ref[tl] += k0 * ds0 + k1 * ds1 + k2 * ds2
            return 0

        jax.lax.fori_loop(loop_lo, loop_hi, slab, 0)


def _xl_deposit_kernel(pos_ref, dir_ref, grp_ref, smin_ref, smax_ref,
                       dsub_ref, scale_ref, acc_ref, *, n, lo, h, T, U, V,
                       lb, t0_mul, ppb):
    tidx = pl.program_id(0)
    gidx = pl.program_id(1)
    a = pl.program_id(2)

    @pl.when((gidx % ppb == 0) & (a == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    grp = grp_ref[...]
    smin = smin_ref[...]
    smax0 = smax_ref[...]
    mine = (grp == a) & (smax0 > smin)

    @pl.when(jnp.any(mine))
    def _():
        smax = jnp.where(mine, smax0, smin)
        pos = (pos_ref[0], pos_ref[1], pos_ref[2])
        dirn = (dir_ref[0], dir_ref[1], dir_ref[2])
        g = sw._axis_geometry(a, pos, dirn, n, lo, h)
        na = sw._sel3(a, n[0], n[1], n[2])
        t0 = tidx * t0_mul
        loop_lo, loop_hi = _block_window(g, mine, smin, smax, na, t0, T)
        vsub = jax.lax.broadcasted_iota(jnp.int32, (V, lb), 0)
        usub = jax.lax.broadcasted_iota(jnp.int32, (U, lb), 0)

        def slab(tl, _):
            t = t0 + tl
            steps = _substeps(g, t, smin, smax)
            scale = scale_ref[tl]          # L * exp(-tau_before_slab)
            tau_loc = jnp.zeros_like(smin)
            contribs = []
            for j, (ds, iu, iv, _s) in enumerate(steps):
                dtau = dsub_ref[tl, j]
                small = dtau < 1e-3
                gfac = jnp.where(small, 1.0 - 0.5 * dtau,
                                 (1.0 - jnp.exp(-jnp.minimum(dtau, 80.0)))
                                 / jnp.maximum(dtau, 1e-37))
                contribs.append(scale * jnp.exp(-tau_loc) * ds * gfac)
                tau_loc = tau_loc + dtau
            (ds0, iu0, iv0, _), (ds1, iu1, iv1, _), (ds2, iu2, iv2, _) = \
                steps
            c0, c1, c2 = contribs
            # the slab's 2x2 patch: substeps sharing a minor row merge
            # into ONE weighted multi-hot column matrix per candidate row.
            # Second candidate row = iu1 when j0 crossed u, else iu2 (the
            # DDA garbage-steps iu once the slab is exhausted, but those
            # substeps carry ds=0 -> contrib 0).
            same = iu1 == iu0
            rowb = jnp.where(same, iu2, iu1)
            c1a = jnp.where(same, c1, 0.0).reshape(1, lb)
            c1b = jnp.where(same, 0.0, c1).reshape(1, lb)
            WA = (jnp.where(vsub == iv0.reshape(1, lb),
                            c0.reshape(1, lb), 0.0)
                  + jnp.where(vsub == iv1.reshape(1, lb), c1a, 0.0))
            WB = (jnp.where(vsub == iv1.reshape(1, lb), c1b, 0.0)
                  + jnp.where(vsub == iv2.reshape(1, lb),
                              c2.reshape(1, lb), 0.0))
            RA = jnp.where(usub == iu0.reshape(1, lb), 1.0, 0.0)
            RB = jnp.where(usub == rowb.reshape(1, lb), 1.0, 0.0)
            prod = jax.lax.dot_general(RA, WA, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            prod = prod + jax.lax.dot_general(
                RB, WB, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[0, tl, a] += prod
            return 0

        jax.lax.fori_loop(loop_lo, loop_hi, slab, 0)


# ------------------------------------------------------------------ wrappers

def _lane_block(NB: int) -> int:
    """Largest lane-block rows (multiple of 8, <=16) dividing NB.

    NB = B/128 lane rows; every program must own an exact block, so lbr
    must DIVIDE NB — silently flooring G = NB//lbr would drop the
    remainder rows (zero optical depth => transparent medium). Raise for
    batch shapes the kernel cannot cover (mirrors mlsweep._lane_block)."""
    best = None
    for d in (8, 16):
        if NB % d == 0:
            best = d
    if best is None:
        raise ValueError(
            f"sweepxl needs the {NB}-row batch divisible into 8-row lane "
            f"blocks; use a batch size that is a multiple of 1024")
    return best * 128


def sweep_dtau(tabs: XLTables, pos, dirn, sigma, active,
               axis_hint: int | None = None, want_sub: bool = False):
    """Per-slab (or per-substep) optical depth via streamed slab tiles.

    Returns (nmax, B) when want_sub is False, else (nmax, 3, B).
    Throughput contract: lanes should arrive sorted by dominant axis
    (transport/lifecycle.py sorts per event) so blocks are axis-pure and
    the kernel runs ONE axis pass per block; mixed blocks stay exact but
    pay up to 3x."""
    pos3, dir3, grp, smin, smax, sig, NB = sw._prep(tabs, pos, dirn, sigma,
                                                    active)
    C = sig.shape[0]
    if axis_hint is not None:
        grp = jnp.full_like(grp, axis_hint)
    lb = _lane_block(NB)
    lbr = lb // 128
    T = _tile_dtau(tabs)
    NT = tabs.nmax // T
    G = NB // lbr
    meta = dict(n=tabs.n, lo=tabs.lo, h=tabs.h, T=T, U=tabs.U, V=tabs.V,
                lb=lb, C=C, want_sub=want_sub, t0_mul=T, occ=tabs.occ,
                quant=tabs.quant)
    kern = functools.partial(_xl_dtau_kernel, **meta)
    lane = lambda t, g, a: (g, 0)
    if want_sub:
        out_spec = pl.BlockSpec((T, 3, lbr, 128),
                                lambda t, g, a: (t, 0, g, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((tabs.nmax, 3, NB, 128),
                                         jnp.float32)
    else:
        out_spec = pl.BlockSpec((T, lbr, 128), lambda t, g, a: (t, g, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((tabs.nmax, NB, 128), jnp.float32)
    in_specs = [
        pl.BlockSpec((3, lbr, 128), lambda t, g, a: (0, g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, lbr, 128), lambda t, g, a: (0, g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lbr, 128), lane, memory_space=pltpu.VMEM),
        pl.BlockSpec((lbr, 128), lane, memory_space=pltpu.VMEM),
        pl.BlockSpec((lbr, 128), lane, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, lbr, 128), lambda t, g, a: (0, g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tabs.ncomp, T, 1, tabs.U, tabs.V),
                     lambda t, g, a: (0, t, a, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tabs.ncomp, T, 1, tabs.U, tabs.V),
                     lambda t, g, a: (0, t, a, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    ins = [pos3, dir3, grp, smin, smax, sig, tabs.rho_hi, tabs.rho_lo]
    if tabs.quant:
        in_specs.append(pl.BlockSpec((tabs.ncomp, 3, T, tabs.U),
                                     lambda t, g, a: (0, 0, t, 0),
                                     memory_space=pltpu.VMEM))
        ins.append(tabs.rs)
    out = pl.pallas_call(
        kern,
        grid=(NT, G, 3),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=sw._interpret(),
    )(*ins)
    if want_sub:
        return out.reshape(tabs.nmax, 3, NB * 128)
    return out.reshape(tabs.nmax, NB * 128)


def sweep_deposit(tabs: XLTables, pos, dirn, active, dtau_sub, scale_slab,
                  n_groups: int = 1):
    """RF deposits from the recorded per-substep taus.

    dtau_sub: (nmax, 3, B) from sweep_dtau(want_sub=True);
    scale_slab: (nmax, B) = L_masked/sqrt-scaled * exp(-tau_before) in
    geometric slab order. n_groups: contiguous bin-pure lane groups, each
    accumulating its own plane set. Interaction resolution happens in XLA
    (resolve_interaction). Returns (n_groups, ncells)."""
    sigma = jnp.ones((pos.shape[0],), jnp.float32)
    pos3, dir3, grp, smin, smax, _sig, NB = sw._prep(tabs, pos, dirn,
                                                     sigma, active)
    lb = _lane_block(NB)
    lbr = lb // 128
    T = _tile_deposit(tabs)
    NT = tabs.nmax // T
    G = NB // lbr
    if G % n_groups:
        raise ValueError(f"{G} lane programs not divisible into "
                         f"{n_groups} bin groups")
    ppb = G // n_groups
    meta = dict(n=tabs.n, lo=tabs.lo, h=tabs.h, T=T, U=tabs.U, V=tabs.V,
                lb=lb, t0_mul=T, ppb=ppb)
    kern = functools.partial(_xl_deposit_kernel, **meta)
    lane = lambda t, g, a: (g, 0)
    dsub3 = dtau_sub.reshape(tabs.nmax, 3, NB, 128)
    scale3 = scale_slab.reshape(tabs.nmax, NB, 128)
    acc = pl.pallas_call(
        kern,
        grid=(NT, G, 3),
        in_specs=[
            pl.BlockSpec((3, lbr, 128), lambda t, g, a: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lbr, 128), lambda t, g, a: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lane, memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lane, memory_space=pltpu.VMEM),
            pl.BlockSpec((lbr, 128), lane, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 3, lbr, 128), lambda t, g, a: (t, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, lbr, 128), lambda t, g, a: (t, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 3, tabs.U, tabs.V),
                               lambda t, g, a: (g // ppb, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_groups, tabs.nmax, 3, tabs.U, tabs.V), jnp.float32),
        interpret=sw._interpret(),
    )(pos3, dir3, grp, smin, smax, dsub3, scale3)
    # decode the (group, slab, axis, U, V) planes back to flat cells
    nx, ny, nz = tabs.n
    rf = acc[:, :nx, 0, :ny, :nz]
    rf = rf + acc[:, :ny, 1, :nx, :nz].transpose(0, 2, 1, 3)
    rf = rf + acc[:, :nz, 2, :nx, :ny].transpose(0, 2, 3, 1)
    return rf.reshape(n_groups, -1)


def resolve_interaction(tabs: XLTables, pos, dirn, active, dtau_sub,
                        tb_slab, tau_int):
    """Exact interaction point/cell from the per-substep tau table, all in
    XLA: locate the crossing slab via the ray-ordered prefix, then re-derive
    that single slab's <=3 sub-segments with vector math (no density access
    — the recorded dtau_sub supplies the opacities).

    Returns (s_int, icell, found)."""
    B = pos.shape[0]
    nmax = tabs.nmax
    grp = sw.dominant_axis(tabs, dirn)
    dmaj = jnp.take_along_axis(dirn, grp[:, None], 1)[:, 0]
    up = dmaj > 0
    dtau_slab = jnp.sum(dtau_sub, axis=1)              # (nmax, B)
    # ray-ordered slab index o -> geometric slab t
    rel = tau_int[None, :] - tb_slab                    # (nmax, B) geometric
    hit = (rel >= 0.0) & (rel < dtau_slab) & (dtau_slab > 0)
    found = jnp.any(hit, axis=0) & active
    t_hit = jnp.argmax(hit, axis=0).astype(jnp.int32)   # (B,)

    # the hit slab is unique per lane (tau is monotone along the ray), so
    # per-lane row extraction is a masked reduction — much faster on TPU
    # than a take_along_axis gather over the (nmax, B) tables
    take_t = lambda arr: jnp.sum(jnp.where(hit, arr, 0.0), axis=0)
    rel_t = take_t(rel)
    d0 = take_t(dtau_sub[:, 0])
    d1 = take_t(dtau_sub[:, 1])
    d2 = take_t(dtau_sub[:, 2])
    # substeps are recorded in GEOMETRIC order along the ray: the sub-DDA
    # always walks in +s, so order is already ray order
    lo = jnp.asarray(tabs.lo, jnp.float32)
    hi = lo + jnp.asarray(tabs.n, jnp.float32) * jnp.asarray(tabs.h,
                                                             jnp.float32)
    tiny = jnp.abs(dirn) < 1e-30
    inv = 1.0 / jnp.where(tiny, 1e-30, dirn)
    t1 = (lo[None] - pos) * inv
    t2 = (hi[None] - pos) * inv
    smin = jnp.maximum(jnp.max(jnp.where(tiny, -_BIG,
                                         jnp.minimum(t1, t2)), axis=-1),
                       0.0)
    smax = jnp.min(jnp.where(tiny, _BIG, jnp.maximum(t1, t2)), axis=-1)
    # tiny-component rays intersect only if positioned inside that
    # dimension's range (DD subgrid boxes; see sweep._prep)
    inbox = ~jnp.any(tiny & ((pos < lo[None]) | (pos >= hi[None])), axis=-1)
    smax = jnp.where(active & inbox & (smax > smin), smax, smin)
    g = sw._axis_geometry(grp, (pos[:, 0], pos[:, 1], pos[:, 2]),
                          (dirn[:, 0], dirn[:, 1], dirn[:, 2]),
                          tabs.n, tabs.lo, tabs.h)
    steps = _substeps(g, t_hit, smin, smax)
    nx, ny, nz = tabs.n
    t_stride = sw._sel3(grp, ny * nz, nz, 1)
    u_stride = sw._sel3(grp, nz, ny * nz, ny * nz)
    v_stride = sw._sel3(grp, 1, 1, nz)
    cum = jnp.zeros_like(rel_t)
    s_int = jnp.zeros_like(rel_t)
    icell = jnp.full((B,), -1, jnp.int32)
    got = jnp.zeros((B,), bool)
    for j, (ds, iu, iv, s_cur) in enumerate(steps):
        dj = (d0, d1, d2)[j]
        here = (~got) & (rel_t >= cum) & (rel_t < cum + dj)
        frac = (rel_t - cum) / jnp.maximum(dj, 1e-37)
        s_int = jnp.where(here, s_cur + frac * ds, s_int)
        cell = t_hit * t_stride + iu * u_stride + iv * v_stride
        icell = jnp.where(here, cell, icell)
        got = got | here
        cum = cum + dj
    found = found & got
    return s_int, jnp.where(found, icell, -1), found
