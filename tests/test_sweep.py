"""Slab-sweep engine vs the scan-based march (transport/sweep.py).

Runs the Pallas kernels in interpreter mode on CPU (SKIRT9_TPU_FORCE_SWEEP);
on a real TPU backend the same code path compiles via Mosaic.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys
from skirt9_tpu.transport import lifecycle as lc
from skirt9_tpu.transport import sweep as sw

PC = 3.0857e16


@pytest.fixture(scope="module")
def setup():
    grid = make_cartesian(((-1.2 * PC, 1.2 * PC),) * 3, (8,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, PC)
    pert = 1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(7), nd.shape)
    nd = np.asarray(nd * pert)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), 0.6), g=np.full((1, 2), 0.5))
    tabs = sw.build_tables(grid, med)
    B = 128
    pos = jax.random.uniform(jax.random.PRNGKey(1), (B, 3),
                             minval=-1.1 * PC, maxval=1.1 * PC)
    d = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cell = grid.locate(pos)
    active = cell >= 0
    sig_lane = jnp.full((B,), sigma, jnp.float32)
    return grid, med, tabs, pos, d, cell, active, sig_lane, sigma


def test_supports(setup, monkeypatch):
    grid, med = setup[0], setup[1]
    monkeypatch.setenv("SKIRT9_TPU_FORCE_SWEEP", "1")
    assert sw.supports_sweep(grid, med)
    monkeypatch.delenv("SKIRT9_TPU_FORCE_SWEEP")
    assert not sw.supports_sweep(grid, med)  # CPU backend: scan-march path


def test_dtau_matches_march(setup):
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    opt = msys.optics_at(med, jnp.full((pos.shape[0],), 0.55e-6))
    S = grid.max_steps()
    cells, ds, dtau = lc.march_record(grid, med, opt, pos, d, cell, S, active)
    tau_ref = jnp.sum(dtau, axis=0)
    dtau_slab = sw.sweep_dtau(tabs, pos, d, sig_lane, active)
    tau_sw = jnp.sum(dtau_slab, axis=0)
    err = np.abs(np.asarray(tau_sw - tau_ref)) / np.maximum(np.asarray(tau_ref), 1e-9)
    assert err.max() < 1e-3


def test_deposit_and_interaction(setup):
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    B = pos.shape[0]
    opt = msys.optics_at(med, jnp.full((B,), 0.55e-6))
    S = grid.max_steps()
    cells, ds, dtau = lc.march_record(grid, med, opt, pos, d, cell, S, active)
    tau_ref = jnp.sum(dtau, axis=0)
    dtau_slab = sw.sweep_dtau(tabs, pos, d, sig_lane, active)
    grp = jnp.argmax(jnp.abs(d), axis=-1)
    dmaj = jnp.take_along_axis(d, grp[:, None], 1)[:, 0]
    tb_slab, tau_path = sw.slab_prefix(dtau_slab, dmaj > 0)
    tau_int = 0.7 * tau_ref
    lum = jnp.ones((B,), jnp.float32)
    rf_delta, s_int, icell, found = sw.sweep_deposit(
        tabs, pos, d, sig_lane, active,
        lum[None, :] * jnp.exp(-tb_slab), tau_int[None, :] - tb_slab)

    tb = jnp.cumsum(dtau, axis=0) - dtau
    ipos_r, icell_r, found_r, _, _ = lc.interaction_point(
        pos, d, cells, ds, dtau, tb, tau_int, active & (tau_ref > 1e-6))
    assert int(jnp.sum(found == found_r)) == B
    both = np.asarray(found & found_r)
    assert (np.asarray(icell)[both] == np.asarray(icell_r)[both]).all()
    ipos_sw = pos + s_int[:, None] * d
    perr = np.linalg.norm(np.asarray(ipos_sw - ipos_r), axis=-1) / (0.3 * PC)
    assert perr[both].max() < 1e-3

    rf0 = jnp.zeros((grid.ncells, 1), jnp.float32)
    rf_ref = np.asarray(lc.deposit_rf(rf0, cells, ds, dtau, tb, lum,
                                      jnp.zeros((B,), jnp.int32), active,
                                      1.0))[:, 0]
    rfd = np.asarray(rf_delta)[0]
    assert abs(rfd.sum() / max(rf_ref.sum(), 1e-30) - 1.0) < 1e-2
    scale = rf_ref.max()
    assert np.abs(rfd - rf_ref).max() / scale < 2e-2


def test_dtau_multicomponent(setup):
    """Multi-component media: dtau sums nd_c * sigma_c over components."""
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    B = pos.shape[0]
    # second component: different spatial distribution and cross section
    nd2 = np.stack([np.asarray(med.nd[:, 0]),
                    np.asarray(med.nd[:, 0])[::-1] * 0.5], axis=1)
    med2 = msys.make_medium(grid, nd2, np.array([0.4e-6, 0.7e-6]),
                            sigma_ext=np.array([[sigma, sigma],
                                                [3 * sigma, 3 * sigma]]),
                            albedo=np.full((2, 2), 0.6),
                            g=np.full((2, 2), 0.5))
    tabs2 = sw.build_tables(grid, med2)
    assert tabs2.ncomp == 2
    opt = msys.optics_at(med2, jnp.full((B,), 0.55e-6))
    S = grid.max_steps()
    cells, ds, dtau = lc.march_record(grid, med2, opt, pos, d, cell, S, active)
    tau_ref = jnp.sum(dtau, axis=0)
    dtau_slab = sw.sweep_dtau(tabs2, pos, d, opt.sigma_ext.T, active)
    tau_sw = jnp.sum(dtau_slab, axis=0)
    err = np.abs(np.asarray(tau_sw - tau_ref)) / np.maximum(
        np.asarray(tau_ref), 1e-9)
    assert err[np.asarray(active)].max() < 2e-3


def test_deposit_bin_groups(setup):
    """Bin-pure lane groups deposit into separate RF slabs whose sum equals
    the ungrouped deposit."""
    grid, med, tabs, pos, d, cell, active, sig_lane, sigma = setup
    # 4 groups need >= 4 lane-rows of 128: tile the fixture batch
    pos = jnp.concatenate([pos, pos[::-1], pos, pos[::-1]])
    d = jnp.concatenate([d, d[::-1], -d, -d[::-1]])
    active = jnp.concatenate([active, active[::-1], active, active[::-1]])
    sig_lane = jnp.concatenate([sig_lane] * 4)
    B = pos.shape[0]
    dtau_slab = sw.sweep_dtau(tabs, pos, d, sig_lane, active)
    grp = jnp.argmax(jnp.abs(d), axis=-1)
    dmaj = jnp.take_along_axis(d, grp[:, None], 1)[:, 0]
    tb_slab, tau_path = sw.slab_prefix(dtau_slab, dmaj > 0)
    tau_int = jnp.full((B,), 1e30, jnp.float32)  # no interaction: pure deposit
    lum = jnp.ones((B,), jnp.float32)
    scale = lum[None, :] * jnp.exp(-tb_slab)
    rel = tau_int[None, :] - tb_slab
    rf_all, _, _, _ = sw.sweep_deposit(tabs, pos, d, sig_lane, active,
                                       scale, rel, n_groups=1)
    # same batch split into 4 lane groups of B/4 (the stratified layout)
    rf_g, _, _, _ = sw.sweep_deposit(tabs, pos, d, sig_lane, active,
                                     scale, rel, n_groups=4)
    assert rf_g.shape == (4, grid.ncells)
    tot = np.asarray(rf_g).sum(axis=0)
    ref = np.asarray(rf_all)[0]
    assert np.abs(tot - ref).max() <= 1e-5 * max(ref.max(), 1e-30)
    # each group's deposit equals the deposit of only-its-lanes
    for gi in range(4):
        m = np.zeros(B, bool)
        m[gi * (B // 4):(gi + 1) * (B // 4)] = True
        rf_one, _, _, _ = sw.sweep_deposit(tabs, pos, d, sig_lane,
                                           active & jnp.asarray(m),
                                           scale * jnp.asarray(m)[None, :],
                                           rel, n_groups=1)
        assert np.abs(np.asarray(rf_g)[gi] - np.asarray(rf_one)[0]).max() \
            <= 1e-5 * max(ref.max(), 1e-30)
