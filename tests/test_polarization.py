"""Polarized (Mueller/Stokes) scattering against analytic Thomson results.

Single dipole (Thomson) scattering of unpolarized light produces linear
polarization P = (1-cos^2 t)/(1+cos^2 t): 100% at 90 degrees, 1/3 at 60
degrees... exact values below. Geometry: unpolarized point source at the
origin, a small optically thin electron blob displaced along +x, observer
along a chosen inclination so the scattering angle is controlled.
(ref benchmark: Peest & Hoang 2017 test cases used by the reference's
polarization mode.)
"""

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.ops import stokes as stk
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16


def run_blob(inclination, n=24, npackets=30_000):
    """Electron blob at (+d, 0, 0); observer direction at `inclination` in
    the x-z plane (azimuth 0) -> scattering angle = angle between +x
    (source->blob) and k_obs."""
    box = 2 * PC
    grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    d_blob = 1.0 * PC
    r = np.linalg.norm(centers - np.array([d_blob, 0, 0]), axis=-1)
    blob_r = 0.25 * PC
    sigma = 6.65e-29
    # optically thin: tau through blob ~ 0.05
    nd = np.where(r < blob_r, 0.05 / (sigma * 2 * blob_r), 0.0)
    lam_t = np.array([0.4e-6, 0.7e-6])
    med = msys.make_medium(grid, nd.astype(np.float32), lam_t,
                           sigma_ext=np.full((1, 2), sigma),
                           albedo=np.ones((1, 2)), g=np.zeros((1, 2)))
    inst = dinst.DistantInstrumentCfg(
        name="i", wave_borders=(0.5e-6, 0.6e-6), inclination=inclination,
        azimuth=0.0, distance=1000 * PC, record_polarization=True)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=3,
                               polarization=True, store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=npackets, batch_size=1 << 13, seed=2,
                     mueller=stk.electron_mueller())
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    I = sed["primaryscattered"][0]
    Q, U, V = sed["Q"][0], sed["U"][0], sed["V"][0]
    return I, Q, U, V


def dipole_P(theta):
    c = np.cos(theta)
    return (1 - c**2) / (1 + c**2)


def test_ninety_degree_scattering_fully_polarized():
    # observer at inclination 90deg: k_obs = +x ... wait, inclination is from
    # +z; scattering direction source->blob is +x, so inclination 0 gives a
    # 90-degree scattering angle toward +z.
    I, Q, U, V = run_blob(inclination=0.0)
    assert I > 0
    P = np.hypot(Q, U) / I
    assert P == pytest.approx(1.0, abs=0.05)
    assert abs(V) / I < 0.02
    # U should vanish: polarization aligned with a principal axis
    assert abs(U) / I < 0.05


def test_partial_polarization_at_oblique_angle():
    # observer at inclination 60deg from +z in the x-z plane: angle between
    # +x and k_obs = 90-60 = 30 deg... compute directly:
    inc = np.deg2rad(60.0)
    kobs = np.array([np.sin(inc), 0, np.cos(inc)])
    theta = np.arccos(kobs @ np.array([1.0, 0, 0]))
    I, Q, U, V = run_blob(inclination=inc)
    P = np.hypot(Q, U) / I
    assert P == pytest.approx(dipole_P(theta), abs=0.06)


def test_unpolarized_mode_records_no_stokes():
    """Polarization off -> no stokes accumulator key."""
    from skirt9_tpu.instruments.distant import init_accumulators, DistantInstrumentCfg
    cfg = DistantInstrumentCfg(name="x", wave_borders=(1e-7, 1e-6))
    assert "stokes" not in init_accumulators(cfg)
