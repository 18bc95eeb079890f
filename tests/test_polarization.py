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


def test_polarized_point_source_emission():
    """SineSquare-polarized point source: detected Q/I equals
    Pmax sin^2(theta_obs) with the Q/U split following the polarization
    angle (ref: SineSquarePolarizationProfile.cpp, PointSource.hpp:44)."""
    import jax
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import (PointSource,
                                         SineSquarePolarizationProfile)
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    grid = make_cartesian(((-PC, PC),) * 3, (2,) * 3)
    med = msys.make_medium(grid, np.zeros(8, np.float32),
                           np.array([1e-7, 1e-5]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))

    def run(incl_deg, gamma=0.0, pmax=0.6):
        prof = SineSquarePolarizationProfile(symmetry=(0, 0, 1),
                                             max_polarization=pmax,
                                             angle=gamma)
        src = PointSource(luminosity=1.0, lam0=0.55e-6, polarization=prof)
        inst = dinst.DistantInstrumentCfg(
            name="i", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC,
            inclination=np.deg2rad(incl_deg), record_polarization=True)
        sim = Simulation(grid=grid, medium=med, sources=[src],
                         instruments=[inst],
                         options=lc.TransportOptions(max_steps=8,
                                                     max_events=1),
                         num_packets=1024, batch_size=1024, seed=0)
        _, accs = sim.run_primary(verbose=False)
        return dinst.calibrate_sed(inst, jax.device_get(accs[0]))

    # edge-on: theta = 90 deg -> P = Pmax, all in Q for gamma=0
    sed = run(90.0)
    P = float(sed["Q"][0]) / float(sed["total"][0])
    assert abs(P) == pytest.approx(0.6, rel=0.02)
    assert abs(float(sed["U"][0]) / float(sed["total"][0])) < 0.02
    # 45-degree polarization angle moves Q into U
    sed45 = run(90.0, gamma=np.pi / 4)
    assert abs(float(sed45["U"][0]) / float(sed45["total"][0])) \
        == pytest.approx(0.6, rel=0.05)
    # inclination 30 deg from the pole: sin^2(30)=0.25... theta measured
    # from the symmetry axis == inclination for a z-axis profile
    sed30 = run(30.0)
    P30 = abs(float(sed30["Q"][0])) / float(sed30["total"][0])
    assert P30 == pytest.approx(0.6 * np.sin(np.deg2rad(30)) ** 2, rel=0.05)
    # pole-on: unpolarized
    sed0 = run(0.5)
    assert abs(float(sed0["Q"][0])) / float(sed0["total"][0]) < 0.01


def test_polarized_source_from_ski():
    import xml.etree.ElementTree as ET
    from skirt9_tpu.config.ski import build_source
    from skirt9_tpu.sources.base import SineSquarePolarizationProfile
    el = ET.fromstring("""
      <PointSource positionX="0 m" positionY="0 m" positionZ="0 m">
       <sed type="SED"><BlackBodySED temperature="5000 K"/></sed>
       <normalization type="LuminosityNormalization">
        <IntegratedLuminosityNormalization wavelengthRange="Source"
            integratedLuminosity="1 Lsun"/>
       </normalization>
       <polarizationProfile type="PolarizationProfile">
        <SineSquarePolarizationProfile symmetryX="0" symmetryY="0"
            symmetryZ="1" maxPolarizationDegree="0.3"
            polarizationAngle="20 deg"/>
       </polarizationProfile>
      </PointSource>""")
    src = build_source(el, lrange=(2e-7, 3e-6))
    assert isinstance(src.polarization, SineSquarePolarizationProfile)
    assert src.polarization.max_polarization == 0.3
    assert src.polarization.angle == pytest.approx(np.deg2rad(20))
