"""All-sky (Mollweide) instrument: interior observer sky maps."""

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import allsky as asky
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16


def test_allsky_point_source_direction_and_flux():
    grid = make_cartesian(((-PC, PC),) * 3, (8,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells, np.float32),
                           np.array([1e-7, 1e-5]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    d_obs = 0.5 * PC
    inst = asky.AllSkyInstrumentCfg(name="sky", wave_borders=(0.5e-6, 0.6e-6),
                                    position=(d_obs, 0.0, 0.0), npx=64)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2,
                               store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=2048, batch_size=2048, seed=0)
    _, accs = sim.run_primary(verbose=False)
    sky = np.asarray(jax.device_get(accs[0]["sky"]), np.float64)
    direct = sky[dinst.KIND_PRIMARY_DIRECT, 0]
    assert direct.sum() > 0
    # all direct flux lands in one pixel: direction observer->source is -x,
    # lon = pi (or -pi edge), lat = 0 -> near the horizontal edge, middle row
    iy, ix = np.unravel_index(np.argmax(direct), direct.shape)
    assert abs(iy - direct.shape[0] // 2) <= 1
    assert ix <= 2 or ix >= direct.shape[1] - 3
    # total equals L/(4 pi d^2)
    expect = 1.0 / (4 * np.pi * d_obs**2)
    assert direct.sum() == pytest.approx(expect, rel=1e-3)


def test_allsky_scattered_sky_with_medium(tmp_path):
    """With a scattering sphere, the sky map gains diffuse scattered light
    spread over many pixels; output file writes."""
    grid = make_cartesian(((-PC, PC),) * 3, (12,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.8 * PC)
    med = msys.make_medium(grid, nd, np.array([1e-7, 1e-5]),
                           np.array([[sigma, sigma]]),
                           np.full((1, 2), 0.7), np.zeros((1, 2)))
    inst = asky.AllSkyInstrumentCfg(name="sky", wave_borders=(0.5e-6, 0.6e-6),
                                    position=(0.5 * PC, 0.0, 0.0), npx=64)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8,
                               store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=4096, batch_size=4096, seed=1)
    _, accs = sim.run_primary(verbose=False)
    sky = np.asarray(jax.device_get(accs[0]["sky"]), np.float64)
    scat = sky[dinst.KIND_PRIMARY_SCATTERED, 0]
    assert (scat > 0).sum() > 100  # diffuse over many pixels
    paths = sim.write_outputs(accs, "t", str(tmp_path))
    from skirt9_tpu.utils.fits import read_fits
    cube, hdr = read_fits(paths[0])
    assert cube.shape == (1, 32, 64)
    assert np.isfinite(cube).all()
