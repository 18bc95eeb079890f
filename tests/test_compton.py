"""Compton scattering: KN cross sections, angle sampling, energy shifts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.ops import compton as co
from skirt9_tpu.utils import constants as c

PC = 3.0857e16


def test_kn_ratio_limits():
    assert float(co.sigma_kn_ratio(jnp.float32(1e-6))) == pytest.approx(1.0, abs=1e-4)
    assert float(co.sigma_kn_ratio(jnp.float32(1.0))) == pytest.approx(0.4310, rel=2e-3)
    # high-energy falloff
    assert float(co.sigma_kn_ratio(jnp.float32(10.0))) < 0.15


def test_thomson_limit_sampling():
    u = jnp.asarray(np.random.default_rng(0).uniform(
        size=100_000).astype(np.float32))
    mu = np.asarray(co.sample_costheta(u, jnp.full((100_000,), 1e-5)))
    assert mu.mean() == pytest.approx(0.0, abs=5e-3)
    assert (mu**2).mean() == pytest.approx(0.4, abs=5e-3)


def test_compton_shift_and_forward_peaking():
    u = jnp.asarray(np.random.default_rng(1).uniform(
        size=100_000).astype(np.float32))
    x = jnp.full((100_000,), 1.0)
    mu = co.sample_costheta(u, x)
    assert float(jnp.mean(mu)) > 0.2  # forward peaked at x=1
    lam0 = co.X_OF_LAM / 1.0  # wavelength with x=1
    lam1 = co.shifted_wavelength(jnp.full((100_000,), lam0), x, mu)
    # energy always decreases (lam increases) except exactly forward
    assert float(jnp.min(lam1)) >= lam0 * (1 - 1e-6)
    # mean fractional shift = x <1-mu>
    expect = 1.0 * (1.0 - float(jnp.mean(mu)))
    got = float(jnp.mean(lam1 / lam0 - 1.0))
    assert got == pytest.approx(expect, rel=1e-3)


def test_compton_transport_downshifts_photons():
    """X-ray photons through an electron cloud: scattered photons arrive at
    longer wavelengths (lower energies) than the injected line."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    lam0 = co.X_OF_LAM / 0.5  # x = 0.5 (~256 keV)
    grid = make_cartesian(((-PC, PC),) * 3, (8,) * 3)
    sigma = c.SIGMA_THOMSON * 0.6
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.8 * PC)
    lam_t = np.geomspace(lam0 / 10, lam0 * 30, 60)
    med = msys.make_medium(grid, nd, lam_t, np.full((1, 60), sigma),
                           np.ones((1, 60)), np.zeros((1, 60)))
    borders = np.geomspace(lam0 * 0.5, lam0 * 20, 31)
    inst = dinst.DistantInstrumentCfg(name="i", wave_borders=tuple(borders),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=10,
                               compton=True, store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=lam0)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=8192, batch_size=4096, seed=3)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    w = sed["wavelength"]
    scat = np.asarray(sed["primaryscattered"])
    assert scat.sum() > 0
    # flux-weighted mean scattered wavelength is redward of the line
    mean_lam = np.sum(w * scat) / scat.sum()
    assert mean_lam > lam0 * 1.2
    # nothing blueward of the injection line
    assert scat[w < lam0 * 0.95].sum() == 0
