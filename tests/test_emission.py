"""Tests for equilibrium dust emission and the secondary-source machinery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.emission import equilibrium as eq
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys
from skirt9_tpu.ops import planck
from skirt9_tpu.sources import secondary as sec


PC = 3.0857e16


def make_medium(n=8, albedo=0.0):
    box = PC
    grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.8 * PC)
    lam_t = np.geomspace(0.05e-6, 1000e-6, 40)
    # grey dust: constant sigma
    med = msys.make_medium(grid, nd, lam_t,
                           sigma_ext=np.full((1, 40), sigma),
                           albedo=np.full((1, 40), albedo),
                           g=np.zeros((1, 40)))
    return grid, med


def test_planck_integral():
    """pi * integral B_lambda dlam = sigma T^4."""
    lam = np.geomspace(1e-8, 1e-2, 4000)
    for T in [10.0, 100.0, 1000.0]:
        integ = np.pi * np.trapezoid(planck.b_lambda_np(lam, T), lam)
        assert integ == pytest.approx(planck.SIGMA_SB * T**4, rel=1e-3)


def test_equilibrium_temperature_grey_dust():
    """For grey dust, equilibrium T satisfies P_abs = 4 sigma_geo sigma_SB T^4
    — verify the table inversion against the analytic solution."""
    grid, med = make_medium()
    rfb = np.geomspace(0.05e-6, 10e-6, 11)
    emsb = np.geomspace(1e-6, 1000e-6, 31)
    tabs = eq.build_emission_tables(med, rfb, emsb)
    sigma = 1e-24
    # pick a target temperature, compute the power it should emit
    T_target = 50.0
    P = 4 * np.pi * sigma * planck.SIGMA_SB * T_target**4 / np.pi
    p_abs = jnp.full((grid.ncells, 1), P, jnp.float32)
    T = np.asarray(eq.equilibrium_temperature(tabs, p_abs))
    np.testing.assert_allclose(T, T_target, rtol=2e-2)


def test_dust_luminosity_matches_absorbed():
    """dust_luminosities must equal sum over bins of k_abs * rf."""
    grid, med = make_medium()
    rfb = np.geomspace(0.05e-6, 10e-6, 5)
    emsb = np.geomspace(1e-6, 1000e-6, 11)
    tabs = eq.build_emission_tables(med, rfb, emsb)
    rng_ = np.random.default_rng(0)
    rf = jnp.asarray(rng_.uniform(0, 1e10, (grid.ncells, 4)).astype(np.float32))
    L = np.asarray(eq.dust_luminosities(med, tabs, rf))
    nd = np.asarray(med.nd)[:, 0]
    expect = (np.asarray(rf) @ np.asarray(tabs.sigma_abs_rf)[0]) * nd
    np.testing.assert_allclose(L, expect, rtol=1e-5)


def test_secondary_source_sampling():
    """Packets launch from luminous cells with correct weighting and sample
    wavelengths from the per-cell spectra."""
    grid, med = make_medium()
    ncells = grid.ncells
    L_cell = np.zeros(ncells)
    L_cell[10] = 3.0
    L_cell[100] = 1.0
    emsb = np.geomspace(1e-6, 100e-6, 21)
    emsc = np.sqrt(emsb[1:] * emsb[:-1])
    eps = np.tile(planck.b_lambda_np(emsc, 100.0), (ncells, 1))
    src2 = sec.prepare(grid, jnp.asarray(L_cell), jnp.asarray(eps), emsb,
                       spatial_bias=0.5)
    assert src2.luminosity == pytest.approx(4.0)

    from skirt9_tpu.ops import rng as rngmod
    keys = rngmod.history_keys(jax.random.PRNGKey(0), jnp.arange(20000))
    f = src2.launch(src2.tables(), keys, 20000)
    cells_hit = np.asarray(grid.locate(f["pos"]))
    # all packets launch from the two luminous cells
    assert set(np.unique(cells_hit)) <= {10, 100}
    # weighted luminosity sums to the total (unbiased estimator)
    total = float(np.sum(np.asarray(f["lum"])))
    assert total == pytest.approx(4.0, rel=0.02)
    # wavelengths concentrated near the 100 K Planck peak (~29 um + sigma_abs
    # weighting; just check they are in the far-IR part of the grid)
    lam = np.asarray(f["lam"])
    assert np.median(lam) > 5e-6
    assert (lam >= emsb[0]).all() and (lam <= emsb[-1]).all()


def test_dust_emission_end_to_end():
    """Full loop: primary heats grey dust, secondary emission reaches the
    instrument; energy accounting is consistent."""
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    grid, med = make_medium(n=8)
    rfb = np.geomspace(0.05e-6, 10e-6, 9)
    emsb = np.geomspace(1e-6, 1000e-6, 25)
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=tuple(np.geomspace(0.3e-6, 1000e-6, 17)),
        distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8)
    L_star = 100.0 * 3.839e26
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=L_star, lam0=0.55e-6)],
                     instruments=[inst], options=opts,
                     rf_borders=rfb, ems_borders=emsb,
                     num_packets=4096, batch_size=2048, seed=1,
                     max_iterations=3)
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    # absorbed fraction of a tau=1 uniform sphere ~ 1-e^-1 (not exact: grid)
    assert info["L_dust"] > 0.3 * L_star
    assert info["L_dust"] < 0.9 * L_star
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    assert sed["secondarydirect"].sum() > 0
    # secondary flux appears at long wavelengths only
    w = np.asarray(sed["wavelength"])
    sec_flux = np.asarray(sed["secondarydirect"])
    assert sec_flux[w < 1e-6].sum() == pytest.approx(0.0, abs=1e-30)
