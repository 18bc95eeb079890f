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


# ------------------------------------------------------------------ HEALPix

def test_healpix_pixelization_is_equal_area():
    """Uniform directions fill all 12*Nside^2 HEALPix pixels with equal
    counts (the defining property of the tessellation; ref:
    HEALPixSkyInstrument.cpp:136 RING loc2pix)."""
    import jax.numpy as jnp
    from skirt9_tpu.instruments.allsky import _healpix_ring_ij
    order = 3
    nside = 1 << order
    rs = np.random.default_rng(0)
    n = 400_000
    v = rs.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    theta = np.arccos(np.clip(v[:, 2], -1, 1))
    phi = np.mod(np.arctan2(v[:, 1], v[:, 0]), 2 * np.pi)
    i, j = _healpix_ring_ij(jnp.asarray(theta, jnp.float32),
                            jnp.asarray(phi, jnp.float32), nside)
    i = np.asarray(i)
    j = np.asarray(j)
    nx, ny = 4 * nside, 4 * nside - 1
    assert (i >= 0).all() and (i < nx).all()
    assert (j >= 0).all() and (j < ny).all()
    counts = np.bincount(j * nx + i, minlength=nx * ny)
    used = counts > 0
    assert used.sum() == 12 * nside * nside
    mean = n / (12 * nside * nside)
    # equal-area: per-pixel counts Poisson around the mean
    assert abs(counts[used].mean() - mean) < 0.02 * mean
    assert counts[used].std() < 4 * np.sqrt(mean)
    # ring index tracks colatitude
    north = theta < 0.3
    south = theta > np.pi - 0.3
    assert j[north].mean() < j[south].mean()


def test_healpix_instrument_end_to_end():
    """A central isotropic source observed by an off-center HEALPix
    all-sky observer: total recorded power matches Mollweide's."""
    grid = make_cartesian(((-PC, PC),) * 3, (8,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells, np.float32),
                           np.array([1e-7, 1e-5]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    cfg_h = asky.AllSkyInstrumentCfg(
        name="hp", wave_borders=(0.5e-6, 0.6e-6), position=(0.5 * PC, 0, 0),
        projection="healpix", order=3, crosshair=(0.0, 0.0, 0.0))
    cfg_m = asky.AllSkyInstrumentCfg(
        name="mw", wave_borders=(0.5e-6, 0.6e-6), position=(0.5 * PC, 0, 0),
        npx=64, crosshair=(0.0, 0.0, 0.0))
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2,
                               store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[cfg_h, cfg_m], options=opts,
                     rf_borders=None, num_packets=2048, batch_size=2048,
                     seed=0)
    _, accs = sim.run_primary(verbose=False)
    sky_h = np.asarray(accs[0]["sky"], np.float64)
    sky_m = np.asarray(accs[1]["sky"], np.float64)
    assert sky_h.sum() > 0
    np.testing.assert_allclose(sky_h.sum(), sky_m.sum(), rtol=1e-5)
    # calibration returns finite surface brightness
    img = asky.calibrate(cfg_h, jax.device_get(accs[0]))
    assert np.isfinite(img).all()
