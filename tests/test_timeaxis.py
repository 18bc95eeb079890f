"""Time-lag instruments: light curves and spectral-time maps.

A central pulse + thin scattering shell of radius R gives an exactly
uniform scattered lag distribution on [0, 2R/c] (single scattering off a
sphere: lag = (R - k_obs . r)/c with r uniform on the shell), and all
direct light at lag zero. (ref: TimeInstrument, TimeGrid, PhotonPacket
distance bookkeeping)
"""

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16
C = 2.99792458e8


def run_shell(nt=20, tau=0.3):
    R = PC
    box = 1.3 * PC
    grid = make_cartesian(((-box, box),) * 3, (24,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    r = np.linalg.norm(centers, axis=-1)
    shell = (r > 0.9 * R) & (r < 1.1 * R)
    sigma = 1e-24
    nd = np.where(shell, tau / (sigma * 0.2 * R), 0.0).astype(np.float32)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           np.array([[sigma, sigma]]),
                           np.full((1, 2), 0.9), np.zeros((1, 2)))
    t_max = 2.4 * R / C
    # first border slightly negative: lag-zero direct photons carry f32
    # rounding of order (path length) * 1e-7 / c
    inst = dinst.DistantInstrumentCfg(
        name="lc", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
        time_borders=tuple(np.linspace(-0.02 * t_max, t_max, nt + 1)))
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=3,
                               store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=30000, batch_size=1 << 14, seed=0)
    _, accs = sim.run_primary(verbose=False)
    return sim, inst, jax.device_get(accs[0]), R, t_max


def test_direct_at_zero_lag_scattered_uniform():
    sim, cfg, acc, R, t_max = run_shell()
    tc = np.asarray(acc["timecube"], np.float64)[0]      # (nt,)
    sed = np.asarray(acc["sed"], np.float64)
    # total time-binned power equals the SED total (every contribution has
    # a valid lag inside the grid)
    tot_sed = sed[dinst.KIND_PRIMARY_DIRECT].sum() \
        + sed[dinst.KIND_PRIMARY_SCATTERED].sum()
    # a small multiple-scattering tail can exceed the time grid
    assert tc.sum() == pytest.approx(tot_sed, rel=0.02)
    # direct flux dominates bin 0 (lag ~ 0)
    direct = sed[dinst.KIND_PRIMARY_DIRECT].sum()
    assert tc[0] >= direct
    # scattered tail: uniform over [0, 2R/c] -> compare occupied bins
    nt = len(tc)
    borders = np.asarray(cfg.time_borders)
    mids = 0.5 * (borders[1:] + borders[:-1])
    in_range = (mids > 0.15 * 2 * R / C) & (mids < 0.85 * 2 * R / C)
    vals = tc[in_range]
    assert vals.min() > 0
    # the geometric lag distribution is uniform; detected flux declines
    # mildly with lag because far-side scatterings exit through an extra
    # shell crossing (exp(-tau) with tau=0.3) -> bounded ratio
    assert vals.max() / vals.min() < 1.0 / np.exp(-2.2 * 0.3)
    # nothing beyond 2R/c (single scattering; tiny multiple-scatter tail)
    beyond = tc[mids > 1.05 * 2 * R / C].sum()
    assert beyond < 0.02 * tc.sum()


def test_lightcurve_outputs(tmp_path):
    sim, cfg, acc, R, t_max = run_shell(nt=10)
    paths = sim.write_outputs([acc], "t", str(tmp_path))
    lcp = [p for p in paths if p.endswith("_lc.dat")]
    stm = [p for p in paths if p.endswith("_stm.fits")]
    assert lcp and stm
    lcd = np.loadtxt(lcp[0])
    assert lcd.shape == (10, 2)
    assert (lcd[:, 1] >= 0).all() and lcd[:, 1].sum() > 0


def test_aperture_masks_outer_flux():
    """An aperture smaller than the shell removes the scattered halo from
    the SED but keeps the central direct source."""
    R = PC
    box = 1.3 * PC
    grid = make_cartesian(((-box, box),) * 3, (24,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    r = np.linalg.norm(centers, axis=-1)
    shell = (r > 0.9 * R) & (r < 1.1 * R)
    sigma = 1e-24
    nd = np.where(shell, 0.3 / (sigma * 0.2 * R), 0.0).astype(np.float32)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           np.array([[sigma, sigma]]),
                           np.full((1, 2), 0.9), np.zeros((1, 2)))
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=3,
                               store_rf=False)

    def run(aperture):
        inst = dinst.DistantInstrumentCfg(
            name="a", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
            aperture=aperture)
        sim = Simulation(grid=grid, medium=med,
                         sources=[PointSource(luminosity=1.0,
                                              lam0=0.55e-6)],
                         instruments=[inst], options=opts, rf_borders=None,
                         num_packets=20000, batch_size=1 << 14, seed=0)
        _, accs = sim.run_primary(verbose=False)
        return np.asarray(jax.device_get(accs[0])["sed"], np.float64)

    full = run(0.0)
    masked = run(0.5 * R)
    k_d, k_s = dinst.KIND_PRIMARY_DIRECT, dinst.KIND_PRIMARY_SCATTERED
    # direct flux from the central point source is untouched
    assert masked[k_d].sum() == pytest.approx(full[k_d].sum(), rel=1e-6)
    # the shell's scattered flux is mostly outside the aperture
    assert masked[k_s].sum() < 0.25 * full[k_s].sum()
