"""Large-grid streamed sweep engine (transport/sweepxl.py) vs the scan
march and the resident-table sweep, in interpret mode on a small grid."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys
from skirt9_tpu.transport import lifecycle as lc
from skirt9_tpu.transport import sweep as sw
from skirt9_tpu.transport import sweepxl as xl

PC = 3.0857e16


@pytest.fixture(scope="module")
def setup():
    grid = make_cartesian(((-1.2 * PC, 1.2 * PC),) * 3, (16,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 2.0, sigma, PC)
    pert = 1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(3), nd.shape)
    nd = np.asarray(nd * pert)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.7),
                           g=np.full((1, 2), 0.3))
    tabs = xl.build_tables(grid, med)
    B = 1024
    rs = np.random.default_rng(8)
    pos = jnp.asarray(rs.uniform(-1.1 * PC, 1.1 * PC, (B, 3)),
                      jnp.float32)
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    cell = grid.locate(pos)
    active = cell >= 0
    sig_lane = jnp.full((B,), sigma, jnp.float32)
    return grid, med, tabs, pos, d, cell, active, sig_lane, sigma


def test_xl_dtau_matches_march(setup):
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    opt = msys.optics_at(med, jnp.full((pos.shape[0],), 0.55e-6))
    cells, ds, dtau = lc.march_record(grid, med, opt, pos, d, cell,
                                      grid.max_steps(), active)
    tau_ref = np.asarray(jnp.sum(dtau, axis=0))
    dsub = xl.sweep_dtau(tabs, pos, d, sig_lane, active, want_sub=True)
    assert dsub.shape == (tabs.nmax, 3, pos.shape[0])
    tau_xl = np.asarray(jnp.sum(dsub, axis=(0, 1)))
    m = tau_ref > 1e-6
    err = np.abs(tau_xl[m] - tau_ref[m]) / tau_ref[m]
    assert err.max() < 1e-3
    # the summed form agrees with want_sub=False
    tau2 = np.asarray(jnp.sum(xl.sweep_dtau(tabs, pos, d, sig_lane,
                                            active), axis=0))
    np.testing.assert_allclose(tau2, tau_xl, rtol=1e-5)


def test_xl_deposit_conserves_and_matches_sweep(setup):
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    B = pos.shape[0]
    dsub = xl.sweep_dtau(tabs, pos, d, sig_lane, active, want_sub=True)
    dtau_slab = jnp.sum(dsub, axis=1)
    grp = sw.dominant_axis(tabs, d)
    dmaj = jnp.take_along_axis(d, grp[:, None], 1)[:, 0]
    tb_slab, tau_path = sw.slab_prefix(dtau_slab, dmaj > 0)
    lum = jnp.asarray(np.random.default_rng(1).uniform(0.5, 2.0, B),
                      jnp.float32) * active
    scale_slab = lum[None, :] * jnp.exp(-tb_slab)
    rf = xl.sweep_deposit(tabs, pos, d, active, dsub, scale_slab)
    assert rf.shape == (1, grid.ncells)
    # opacity-weighted total telescopes to sum L (1 - e^-tau_path)
    k_cell = sigma * np.asarray(med.nd)[:, 0]
    total = float((np.asarray(rf)[0] * k_cell).sum())
    expect = float(jnp.sum(lum * -jnp.expm1(-tau_path)))
    assert total == pytest.approx(expect, rel=2e-3)
    # and matches the resident-table sweep engine's deposits per cell
    stabs = sw.build_tables(grid, med)
    rel_slab = 1e30 - tb_slab  # no interaction: pure deposit comparison
    rf2, _, _, _ = sw.sweep_deposit(stabs, pos, d, sig_lane, active,
                                    scale_slab, rel_slab)
    np.testing.assert_allclose(np.asarray(rf)[0], np.asarray(rf2)[0],
                               rtol=2e-3, atol=1e-8 * float(
                                   np.asarray(rf2).max()))


def test_xl_interaction_matches_sweep(setup):
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    B = pos.shape[0]
    dsub = xl.sweep_dtau(tabs, pos, d, sig_lane, active, want_sub=True)
    dtau_slab = jnp.sum(dsub, axis=1)
    grp = sw.dominant_axis(tabs, d)
    dmaj = jnp.take_along_axis(d, grp[:, None], 1)[:, 0]
    tb_slab, tau_path = sw.slab_prefix(dtau_slab, dmaj > 0)
    tau_int = 0.63 * tau_path
    s_int, icell, found = xl.resolve_interaction(tabs, pos, d, active,
                                                 dsub, tb_slab, tau_int)
    stabs = sw.build_tables(grid, med)
    scale_slab = jnp.ones((tabs.nmax, B), jnp.float32)
    rel_slab = tau_int[None, :] - tb_slab
    _, s2, ic2, f2 = sw.sweep_deposit(stabs, pos, d, sig_lane, active,
                                      scale_slab, rel_slab)
    f2 = np.asarray(f2) & np.asarray(active)
    fx = np.asarray(found)
    assert (fx == f2).mean() > 0.999
    both = fx & f2
    np.testing.assert_allclose(np.asarray(s_int)[both],
                               np.asarray(s2)[both], rtol=1e-3,
                               atol=1e-4 * PC)
    assert (np.asarray(icell)[both] == np.asarray(ic2)[both]).mean() > 0.99


def test_xl_lifecycle_end_to_end(setup):
    """Full life cycle through the XL engine matches the resident-table
    sweep engine (identical RNG streams, same grid)."""
    grid, med, tabs, *_ = setup
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource

    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
        npx=8, npy=8, fovx=4 * PC, fovy=4 * PC)

    def build(xl_tabs):
        os.environ["SKIRT9_TPU_FORCE_SWEEP"] = "1"
        try:
            opts = lc.TransportOptions(max_steps=grid.max_steps(),
                                       max_events=8)
            sim = Simulation(grid=grid, medium=med,
                             sources=[PointSource(luminosity=1.0,
                                                  lam0=0.55e-6)],
                             instruments=[inst], options=opts,
                             rf_borders=np.array([0.5e-6, 0.6e-6]),
                             num_packets=2048, batch_size=2048, seed=0)
            if xl_tabs:
                sim._sweep_tabs = tabs
                sim._seg_cache = {}
        finally:
            os.environ.pop("SKIRT9_TPU_FORCE_SWEEP", None)
        return sim

    sim_sw = build(False)
    assert isinstance(sim_sw._sweep_tabs, sw.SweepTables)
    rf_s, accs_s = sim_sw.run_primary(verbose=False)
    sim_xl = build(True)
    rf_x, accs_x = sim_xl.run_primary(verbose=False)
    np.testing.assert_allclose(np.asarray(accs_x[0]["sed"]),
                               np.asarray(accs_s[0]["sed"]), rtol=5e-3,
                               atol=1e-10)
    rs_, rx_ = np.asarray(rf_s).ravel(), np.asarray(rf_x).ravel()
    m = rs_ > 1e-3 * rs_.max()
    np.testing.assert_allclose(rx_[m], rs_[m], rtol=1e-2)


def test_xl_quant_gate_and_fallback(setup):
    """The int8 row-quantized planes engage for bounded-contrast media
    (the fixture's perturbed sphere) and fall back to bf16 hi/lo beyond
    the gate; both representations reproduce the march within their
    documented error bounds (int8: |err| <= 3.1e-5 rowmax per cell)."""
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    assert tabs.quant and tabs.rho_hi.dtype == jnp.int8
    assert tabs.rs.shape == (med.ncomp, 3, tabs.nmax, tabs.U)
    # a 1e4 density contrast rejects the quantization
    nd2 = np.asarray(med.nd).copy()
    nz = nd2[:, 0] > 0
    idx = np.flatnonzero(nz)
    # scatter the boost over random cells so in-ROW contrast is created
    # (a half-space boost keeps every (slab, u) row uniform)
    boost = np.random.default_rng(4).choice(idx, len(idx) // 2,
                                            replace=False)
    nd2[boost, :] *= 1e4
    med2 = msys.make_medium(
        grid, nd2, np.array([0.4e-6, 0.7e-6]),
        sigma_ext=np.array([[sigma, sigma]]),
        albedo=np.full((1, 2), 0.7), g=np.full((1, 2), 0.3))
    tabs2 = xl.build_tables(grid, med2)
    assert not tabs2.quant and tabs2.rho_hi.dtype == jnp.bfloat16
    # the bf16 fallback still matches the march on the contrasted medium
    opt = msys.optics_at(med2, jnp.full((pos.shape[0],), 0.55e-6))
    cells, ds, dtau = lc.march_record(grid, med2, opt, pos, d, cell,
                                      grid.max_steps(), active)
    tau_ref = np.asarray(jnp.sum(dtau, axis=0))
    tau_xl = np.asarray(jnp.sum(xl.sweep_dtau(tabs2, pos, d, sig_lane,
                                              active), axis=0))
    m = tau_ref > 1e-6
    err = np.abs(tau_xl[m] - tau_ref[m]) / tau_ref[m]
    assert err.max() < 2e-3
