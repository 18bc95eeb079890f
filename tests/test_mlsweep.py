"""Multi-level sweep (tree-grid Pallas engine) vs the scan-march reference.

Runs the Pallas kernels in interpret mode on CPU (SKIRT9_TPU_FORCE_SWEEP)
against the general scan march, which is itself validated against analytic
cases elsewhere. The octree decomposes into per-level uniform rasters; tau,
deposits, and interaction points must agree to f32 tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skirt9_tpu.grids.octree import build_octree
from skirt9_tpu.media import system as msys
from skirt9_tpu.transport import lifecycle as lc
from skirt9_tpu.transport import mlsweep as ml

PC = 3.0857e16
SIG = 1e-24


@pytest.fixture(autouse=True)
def _force_sweep(monkeypatch):
    monkeypatch.setenv("SKIRT9_TPU_FORCE_SWEEP", "1")


def _problem():
    R = PC

    def dens(p):
        r = np.linalg.norm(p, axis=-1)
        rc = np.maximum(r, 0.1 * R)
        return np.where(r < R, (R / rc) ** 2, 0.0)

    grid = build_octree(((-1.2 * R, 1.2 * R),) * 3, dens,
                        max_level=4, min_level=1, max_fraction=2e-2)
    centers = np.asarray(grid.cell_centers(), np.float64)
    nd = dens(centers) * 1.0 / (SIG * R)
    med = msys.make_medium(grid, nd.astype(np.float32),
                           np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.full((1, 2), SIG),
                           albedo=np.full((1, 2), 0.5),
                           g=np.full((1, 2), 0.3))
    return grid, med


def _rays(grid, n=512, seed=0):
    rs = np.random.default_rng(seed)
    lo = np.asarray(grid.box_lo, np.float64)
    hi = np.asarray(grid.box_hi, np.float64)
    pos = rs.uniform(lo + 0.05 * (hi - lo), hi - 0.05 * (hi - lo), (n, 3))
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32))


def test_levels_partition_and_leafmap():
    grid, med = _problem()
    tabs = ml.build_tables(grid, med)
    # every cell is covered (coarse-level merging may map one cell to
    # several voxels of a finer raster; all must map back to it)
    ids = np.concatenate([np.asarray(c) for c in tabs.cells_id])
    assert len(np.unique(ids)) == grid.ncells
    # leafmap covers the full fine raster with valid cells
    lm = np.asarray(tabs.leafmap)
    assert (lm >= 0).all() and lm.max() == grid.ncells - 1
    # locate agrees with the tree descent
    pos, _ = _rays(grid, 256, seed=3)
    tree_cells = np.asarray(
        grid._replace(leafmap=None, fine_n=()).locate(pos))
    ml_cells = np.asarray(ml.locate_cells(tabs, pos))
    np.testing.assert_array_equal(tree_cells, ml_cells)


def test_dtau_matches_scan():
    grid, med = _problem()
    tabs = ml.build_tables(grid, med)
    pos, dirn = _rays(grid, 512)
    opt = msys.optics_at(med, jnp.full((512,), 0.55e-6))
    cell = grid.locate(pos)
    active = cell >= 0
    tau_ref = lc.trace_tau(grid, med, opt, pos, dirn, cell,
                           grid.max_steps(), active)
    dtau_slab = ml.sweep_dtau(tabs, pos, dirn, opt.sigma_ext.T, active)
    tau_ml = np.asarray(jnp.sum(dtau_slab, axis=0))
    tau_ref = np.asarray(tau_ref)
    np.testing.assert_allclose(tau_ml[np.asarray(active)],
                               tau_ref[np.asarray(active)],
                               rtol=2e-4, atol=1e-5)


def test_deposit_and_interaction_match_scan():
    from skirt9_tpu.transport.sweep import slab_prefix

    grid, med = _problem()
    tabs = ml.build_tables(grid, med)
    B = 512
    pos, dirn = _rays(grid, B, seed=1)
    lam = jnp.full((B,), 0.55e-6)
    opt = msys.optics_at(med, lam)
    cell = grid.locate(pos)
    active = cell >= 0

    # scan reference: step table + RF deposits + interaction point
    cells, ds, dtau = lc.march_record(grid, med, opt, pos, dirn, cell,
                                      grid.max_steps(), active)
    tau_before = jnp.cumsum(dtau, axis=0) - dtau
    tau_path_ref = tau_before[-1] + dtau[-1]
    lum = jnp.ones((B,), jnp.float32)
    rf_ref = lc.deposit_rf(jnp.zeros((grid.ncells, 1), jnp.float32),
                           cells, ds, dtau, tau_before, lum,
                           jnp.zeros((B,), jnp.int32), active, 1.0)
    tau_int = 0.7 * tau_path_ref
    ipos_r, icell_r, found_r, _, _ = lc.interaction_point(
        pos, dirn, cells, ds, dtau, tau_before, tau_int, active)

    # multi-level sweep
    dtau_slab = ml.sweep_dtau(tabs, pos, dirn, opt.sigma_ext.T, active)
    grp = jnp.argmax(jnp.abs(dirn), axis=-1)
    dmaj = jnp.take_along_axis(dirn, grp[:, None], 1)[:, 0]
    tb_slab, tau_path = slab_prefix(dtau_slab, dmaj > 0)
    np.testing.assert_allclose(np.asarray(tau_path)[np.asarray(active)],
                               np.asarray(tau_path_ref)[np.asarray(active)],
                               rtol=2e-4, atol=1e-5)
    lum_pre = jnp.where(active, 1.0, 0.0)
    dtau_sub, enc_sub = ml.sweep_dtau(tabs, pos, dirn, opt.sigma_ext.T,
                                      active, want_sub=True)
    np.testing.assert_allclose(np.asarray(jnp.sum(dtau_sub, axis=1)),
                               np.asarray(dtau_slab), rtol=1e-5, atol=0)
    deltas, s_int, icell, found = ml.sweep_deposit(
        tabs, pos, dirn, active, dtau_sub, enc_sub, lum_pre, tau_int,
        tb_slab, 1.0)
    rf_state = ml.init_rf(tabs, 1)
    rf_state = tuple(r + d for r, d in zip(rf_state, deltas))
    rf_ml = ml.finalize_rf(tabs, rf_state, grid.ncells)

    a = np.asarray(active)
    np.testing.assert_array_equal(np.asarray(found)[a],
                                  np.asarray(found_r)[a])
    hit = a & np.asarray(found_r)
    # interaction cells agree (positions may sit on faces; compare cells)
    np.testing.assert_array_equal(np.asarray(icell)[hit],
                                  np.asarray(icell_r)[hit])
    # per-cell RF deposits agree
    tot_ref = float(np.asarray(rf_ref).sum())
    np.testing.assert_allclose(np.asarray(rf_ml)[:, 0], np.asarray(rf_ref)[:, 0],
                               rtol=3e-3, atol=3e-6 * tot_ref)


def test_octree_simulation_end_to_end_sweep_vs_scan():
    """Full Simulation on the octree: multi-level sweep vs scan march agree
    on the radiation field and instrument SED within f32 tolerance (same
    RNG streams — identical histories)."""
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource

    grid, med = _problem()
    inst = dinst.DistantInstrumentCfg(
        name="i", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=4)

    def build():
        return Simulation(grid=grid, medium=med,
                          sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                          instruments=[inst], options=opts,
                          rf_borders=np.array([0.5e-6, 0.6e-6]),
                          num_packets=1024, batch_size=512, seed=4)

    sim = build()
    assert isinstance(sim._sweep_tabs, ml.MLTables)
    rf_s, accs_s = sim.run_primary(verbose=False)

    sim2 = build()
    sim2._sweep_tabs = None         # force the scan march
    sim2.grid = grid                # tree-descent locate
    rf_r, accs_r = sim2.run_primary(verbose=False)

    np.testing.assert_allclose(np.asarray(accs_s[0]["sed"]),
                               np.asarray(accs_r[0]["sed"]), rtol=3e-3,
                               atol=1e-8)
    tot = float(np.asarray(rf_r).sum())
    np.testing.assert_allclose(np.asarray(rf_s), np.asarray(rf_r),
                               rtol=5e-3, atol=1e-5 * tot)


def test_tree_raster_xl_engine_matches_scan(monkeypatch):
    """Trees past the multi-level sweep's encoding cap rasterize EXACTLY
    onto their fine voxel grid and run the streamed XL engine there
    (sweepxl.build_tree_tables): tau, interactions (mapped back to leaf
    cells), RF (voxel accumulators finalized per segment) and the SED
    must match the scan march. The cap is forced low to exercise the
    route on a small octree."""
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import sweepxl as xsw

    monkeypatch.setenv("SKIRT9_TPU_ML_ENC_CAP", "1")
    grid, med = _problem()
    inst = dinst.DistantInstrumentCfg(
        name="i", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=4)

    def build():
        return Simulation(grid=grid, medium=med,
                          sources=[PointSource(luminosity=1.0,
                                               lam0=0.55e-6)],
                          instruments=[inst], options=opts,
                          rf_borders=np.array([0.5e-6, 0.6e-6]),
                          num_packets=1024, batch_size=1024, seed=4)

    sim = build()
    assert isinstance(sim._sweep_tabs, xsw.XLTables)
    assert sim._sweep_tabs.cellmap is not None
    rf_s, accs_s = sim.run_primary(verbose=False)
    assert rf_s.shape[0] == grid.ncells   # finalized to leaf cells

    sim2 = build()
    sim2._sweep_tabs = None         # force the scan march
    sim2.grid = grid
    rf_r, accs_r = sim2.run_primary(verbose=False)

    np.testing.assert_allclose(np.asarray(accs_s[0]["sed"]),
                               np.asarray(accs_r[0]["sed"]), rtol=3e-3,
                               atol=1e-8)
    tot = float(np.asarray(rf_r).sum())
    np.testing.assert_allclose(np.asarray(rf_s), np.asarray(rf_r),
                               rtol=5e-3, atol=1e-5 * tot)


def test_two_pass_deposit_enc_over_128():
    """Encoding rows > 128 (refinement-everywhere trees; supports() admits
    up to 256) split the one-hot deposit into two MXU passes. A
    single-level 128x128x8 table forces enc = 144 with modest cost; tau,
    deposits, and the interaction point must still match the scan march."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.transport import raster as ra
    from skirt9_tpu.transport.sweep import slab_prefix

    n = (128, 128, 8)
    lo = (-PC, -PC, -PC / 8)
    hi = (PC, PC, PC / 8)
    grid = make_cartesian(tuple(zip(lo, hi)), n)
    rs = np.random.default_rng(7)
    nd = (rs.uniform(0.2, 1.0, grid.ncells) / (SIG * PC)).astype(np.float32)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.full((1, 2), SIG),
                           albedo=np.full((1, 2), 0.5),
                           g=np.full((1, 2), 0.3))

    # single-level MLTables over the SAME cells (raster-style build with
    # an identity owner map)
    import skirt9_tpu.transport.raster as _ra

    class _FakeVor:
        box_lo, box_hi = lo, hi
        ncells = grid.ncells
        sites = None

    owner = np.arange(grid.ncells, dtype=np.int32)
    orig = _ra._owner_map
    _ra._owner_map = lambda g_, centers: owner
    try:
        tabs = ra.build_tables(_FakeVor(), med, resolution=n)
    finally:
        _ra._owner_map = orig
    assert tabs.enc > 128, tabs.enc

    B = 256
    rs2 = np.random.default_rng(5)
    glo = np.asarray(lo) + 0.05 * (np.asarray(hi) - np.asarray(lo))
    ghi = np.asarray(hi) - 0.05 * (np.asarray(hi) - np.asarray(lo))
    pos = jnp.asarray(rs2.uniform(glo, ghi, (B, 3)), jnp.float32)
    d_ = rs2.normal(size=(B, 3))
    dirn = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True),
                       jnp.float32)
    lam = jnp.full((B,), 0.55e-6)
    opt = msys.optics_at(med, lam)
    cell = grid.locate(pos)
    active = cell >= 0

    cells, ds, dtau = lc.march_record(grid, med, opt, pos, dirn, cell,
                                      grid.max_steps(), active)
    tau_before = jnp.cumsum(dtau, axis=0) - dtau
    tau_path_ref = tau_before[-1] + dtau[-1]
    rf_ref = lc.deposit_rf(jnp.zeros((grid.ncells, 1), jnp.float32),
                           cells, ds, dtau, tau_before,
                           jnp.ones((B,), jnp.float32),
                           jnp.zeros((B,), jnp.int32), active, 1.0)

    dtau_sub, enc_sub = ml.sweep_dtau(tabs, pos, dirn, opt.sigma_ext.T,
                                      active, want_sub=True)
    dtau_slab = jnp.sum(dtau_sub, axis=1)
    grp = jnp.argmax(jnp.abs(dirn) / jnp.asarray(tabs.h), axis=-1)
    dmaj = jnp.take_along_axis(dirn, grp[:, None], 1)[:, 0]
    tb_slab, tau_path = slab_prefix(dtau_slab, dmaj > 0)
    a = np.asarray(active)
    np.testing.assert_allclose(np.asarray(tau_path)[a],
                               np.asarray(tau_path_ref)[a],
                               rtol=2e-4, atol=1e-5)
    tau_int = 0.6 * tau_path_ref
    deltas, s_int, icell, found = ml.sweep_deposit(
        tabs, pos, dirn, active, dtau_sub, enc_sub,
        jnp.where(active, 1.0, 0.0), tau_int, tb_slab, 1.0)
    rf_state = tuple(r + d for r, d in zip(ml.init_rf(tabs, 1), deltas))
    rf_ml = ml.finalize_rf(tabs, rf_state, grid.ncells)
    tot = float(np.asarray(rf_ref).sum())
    np.testing.assert_allclose(np.asarray(rf_ml)[:, 0],
                               np.asarray(rf_ref)[:, 0],
                               rtol=3e-3, atol=3e-6 * tot)
    ipos_r, icell_r, found_r, _, _ = lc.interaction_point(
        pos, dirn, cells, ds, dtau, tau_before, tau_int, active)
    hit = a & np.asarray(found_r)
    np.testing.assert_array_equal(np.asarray(found)[a],
                                  np.asarray(found_r)[a])
    np.testing.assert_array_equal(np.asarray(icell)[hit],
                                  np.asarray(icell_r)[hit])


def test_sitelist_clustered_tree_sweep_vs_scan():
    """Site-list refinement-everywhere trees (clumpy ISM boxes, ref:
    SiteListTreePolicy.hpp) exceed the single-bbox table budget; per-level
    sub-box clustering (_cluster_levels) shrinks the resident tables to
    the occupied volume and the deposit loops one matmul pass per 128
    encoding rows — enc > 256 now rides the fast engine (round-5 verdict
    item 4). Sweep vs scan march must agree draw for draw."""
    from skirt9_tpu.grids.octree import build_octree, site_list_refine_fn
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource

    rs = np.random.default_rng(9)
    cc = rs.uniform(-0.85, 0.85, size=(46, 3)) * PC
    sites = np.concatenate(
        [c + rs.normal(scale=0.04 * PC, size=(26, 3)) for c in cc])
    ext = ((-PC, PC),) * 3
    grid = build_octree(ext, lambda p: np.ones(len(p)), max_level=7,
                        min_level=2,
                        refine_fn=site_list_refine_fn(sites, 1))
    meta = ml._analyze(grid)
    enc = sum(la.rows for lv in meta["levels"] for la in lv.ax)
    assert enc > 256, f"want a refinement-everywhere regime, enc={enc}"
    assert len(meta["levels"]) > 4      # clustering actually triggered

    nd = (0.5 / (SIG * PC)) * np.ones(grid.ncells, np.float32)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.full((1, 2), SIG),
                           albedo=np.full((1, 2), 0.5),
                           g=np.full((1, 2), 0.3))
    inst = dinst.DistantInstrumentCfg(
        name="i", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2)

    def build():
        return Simulation(grid=grid, medium=med,
                          sources=[PointSource(luminosity=1.0,
                                               lam0=0.55e-6)],
                          instruments=[inst], options=opts,
                          rf_borders=np.array([0.5e-6, 0.6e-6]),
                          num_packets=256, batch_size=256, seed=6)

    sim = build()
    assert isinstance(sim._sweep_tabs, ml.MLTables)
    rf_s, accs_s = sim.run_primary(verbose=False)

    sim2 = build()
    sim2._sweep_tabs = None
    rf_r, accs_r = sim2.run_primary(verbose=False)

    np.testing.assert_allclose(np.asarray(accs_s[0]["sed"]),
                               np.asarray(accs_r[0]["sed"]), rtol=3e-3,
                               atol=1e-8)
    tot = float(np.asarray(rf_r).sum())
    np.testing.assert_allclose(np.asarray(sim._rf_finalize(rf_s)
                                          if isinstance(rf_s, tuple)
                                          else rf_s),
                               np.asarray(rf_r), rtol=5e-3,
                               atol=1e-5 * tot)
