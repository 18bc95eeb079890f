"""X-ray physics IN the transport engine (round-3: VERDICT missing #3).

Fluorescence and Compton scattering as wavelength-changing scattering
channels during transport (ref: XRayAtomicGasMix.hpp:288 performScattering,
peeloffScattering channel loop): an Fe-bearing gas slab illuminated by a
hard X-ray continuum must show (a) the Fe K absorption edge at 7.112 keV in
the transmitted flux and (b) the Fe K-alpha fluorescence line at 6.40 keV
in the scattered flux.
"""

import os
import textwrap

import jax
import numpy as np
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.media import xray as xr
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource, TabulatedSED
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16
KEV = 1000.0 * xr.EV / (6.62607015e-34 * 2.99792458e8) ** 0  # eV per keV
E_KEV = lambda lam_m: xr.HC_EV / lam_m / 1000.0
LAM_OF_KEV = lambda E: xr.HC_EV / (E * 1000.0)


def _xray_problem(NH=2e26, n=8):
    """Uniform Fe-enriched H gas sphere, column density NH [m^-2]."""
    lam_grid = np.geomspace(LAM_OF_KEV(30.0), LAM_OF_KEV(0.5), 256)
    # boost Fe so the fluorescence is prominent in a small test
    ab = np.zeros(30)
    ab[0] = 1.0
    ab[25] = 3e-3
    shells = list(xr.BUILTIN_SHELLS) + [xr.FE_K_SHELL]
    tabs = xr.build_xray_tables(lam_grid, abundances=ab, shells=shells,
                                lines=xr.FE_K_LINES, scatter="Free")
    mix = xr.as_mix_tables(tabs)

    R = PC
    grid = make_cartesian(((-1.2 * R, 1.2 * R),) * 3, (n,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    r = np.linalg.norm(centers, axis=-1)
    nH = NH / (2 * R)
    nd = np.where(r < R, nH, 0.0).astype(np.float32)
    med = msys.make_medium(grid, nd, np.asarray(mix.lam),
                           sigma_ext=np.asarray(mix.sigma_ext)[None, :],
                           albedo=np.asarray(mix.albedo)[None, :],
                           g=np.zeros((1, len(mix.lam)), np.float32))
    return grid, med, tabs


def test_channel_cross_sections():
    """sigma splits: absorbed vs fluorescing vs scattered; Fe edge there."""
    lam = np.geomspace(LAM_OF_KEV(30.0), LAM_OF_KEV(0.5), 512)
    ab = np.zeros(30)
    ab[0] = 1.0
    ab[25] = 3.2e-5
    shells = list(xr.BUILTIN_SHELLS) + [xr.FE_K_SHELL]
    tabs = xr.build_xray_tables(lam, abundances=ab, shells=shells,
                                lines=xr.FE_K_LINES)
    E = xr.HC_EV / tabs.lam / 1000.0  # keV
    below = (E > 6.5) & (E < 7.0)
    above = (E > 7.2) & (E < 8.0)
    # photo-absorption jumps across the K edge
    assert tabs.sigma_abs[above].mean() > 3 * tabs.sigma_abs[below].mean()
    # fluorescence channel only above the edge, fraction = yield
    assert tabs.sigma_fluor[below].max() == 0.0
    assert tabs.sigma_fluor[above].max() > 0.0
    # line cdf selects K-alpha ~88% of the time (0.34 / (0.34+0.045))
    k = np.argmin(np.abs(E - 8.0))
    assert tabs.line_cdf[k, 0] == pytest.approx(0.34 / 0.385, rel=1e-3)


def test_fe_kalpha_appears_in_engine():
    grid, med, tabs = _xray_problem()
    # flat continuum 2..20 keV
    lam_sed = np.geomspace(LAM_OF_KEV(20.0), LAM_OF_KEV(2.0), 128)
    sed = TabulatedSED(lam=lam_sed, s=np.ones_like(lam_sed))
    # fine instrument bins around the line and the edge
    wb = LAM_OF_KEV(np.linspace(20.0, 2.0, 181))
    inst = dinst.DistantInstrumentCfg(name="x", wave_borders=tuple(wb),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=4,
                               xray=True, store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, sed=sed)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=60_000, batch_size=8192, seed=7,
                     xray_tabs=xr.device_tables(tabs))
    _, accs = sim.run_primary(verbose=False)
    out = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    lam_c = np.asarray(out["wavelength"])
    E_c = xr.HC_EV / lam_c / 1000.0
    direct = np.asarray(out["primarydirect"])
    transp = np.asarray(out["transparent"])
    scat = np.asarray(out["primaryscattered"])

    # (a) absorption edge: transmission drops across 7.112 keV
    t_below = direct[(E_c > 6.3) & (E_c < 7.0)].sum() \
        / transp[(E_c > 6.3) & (E_c < 7.0)].sum()
    t_above = direct[(E_c > 7.2) & (E_c < 8.2)].sum() \
        / transp[(E_c > 7.2) & (E_c < 8.2)].sum()
    assert t_above < 0.75 * t_below, (t_above, t_below)

    # (b) Fe K-alpha line at 6.40 keV in the scattered spectrum: the line
    # bin towers above the neighboring continuum-scatter bins
    line_bin = np.argmin(np.abs(E_c - 6.40))
    neighbors = np.concatenate([scat[line_bin - 5:line_bin - 1],
                                scat[line_bin + 2:line_bin + 6]])
    assert scat[line_bin] > 5 * max(neighbors.mean(), 1e-30), \
        (scat[line_bin], neighbors.mean())
    # line flux is a few percent of the transmitted continuum (yield x
    # absorbed fraction), not a numerical artifact
    assert scat[line_bin] > 0


def test_xray_ski_end_to_end(tmp_path):
    """The Fe-Kalpha demo through the .ski surface (XRayAtomicGasMix)."""
    lam_sed = np.geomspace(LAM_OF_KEV(20.0), LAM_OF_KEV(2.0), 64)
    sedfile = tmp_path / "flat_xray_sed.txt"
    np.savetxt(sedfile, np.column_stack([lam_sed * 1e6,
                                         np.ones_like(lam_sed)]))
    ski = textwrap.dedent(f"""\
    <?xml version='1.0' encoding='UTF-8'?>
    <skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
      <MonteCarloSimulation userLevel="Expert" simulationMode="ExtinctionOnly" numPackets="20000">
        <random type="Random"><Random seed="0"/></random>
        <units type="Units"><SIUnits/></units>
        <sourceSystem type="SourceSystem">
          <SourceSystem minWavelength="{LAM_OF_KEV(20.0)} m" maxWavelength="{LAM_OF_KEV(2.0)} m" sourceBias="0.5">
            <sources type="Source">
              <PointSource positionX="0 m" positionY="0 m" positionZ="0 m" sourceWeight="1" wavelengthBias="0.5">
                <sed type="SED"><FileSED filename="{sedfile}"/></sed>
                <normalization type="LuminosityNormalization">
                  <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1 W"/>
                </normalization>
              </PointSource>
            </sources>
          </SourceSystem>
        </sourceSystem>
        <mediumSystem type="MediumSystem">
          <MediumSystem>
            <media type="Medium">
              <GeometricMedium velocityMagnitude="0 m/s">
                <geometry type="Geometry">
                  <UniformSphereGeometry maxRadius="{PC} m"/>
                </geometry>
                <materialMix type="MaterialMix">
                  <XRayAtomicGasMix abundancies="1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0.003" scatterBoundElectrons="Free"/>
                </materialMix>
                <normalization type="MaterialNormalization">
                  <NumberColumnMaterialNormalization axis="Z" numberColumnDensity="2e26 1/m2"/>
                </normalization>
              </GeometricMedium>
            </media>
            <grid type="SpatialGrid">
              <CartesianSpatialGrid minX="{-1.2*PC} m" maxX="{1.2*PC} m" minY="{-1.2*PC} m" maxY="{1.2*PC} m" minZ="{-1.2*PC} m" maxZ="{1.2*PC} m">
                <meshX type="Mesh"><LinMesh numBins="8"/></meshX>
                <meshY type="Mesh"><LinMesh numBins="8"/></meshY>
                <meshZ type="Mesh"><LinMesh numBins="8"/></meshZ>
              </CartesianSpatialGrid>
            </grid>
          </MediumSystem>
        </mediumSystem>
        <instrumentSystem type="InstrumentSystem">
          <InstrumentSystem>
            <defaultWavelengthGrid type="WavelengthGrid">
              <LogWavelengthGrid minWavelength="{LAM_OF_KEV(20.0)} m" maxWavelength="{LAM_OF_KEV(2.0)} m" numWavelengths="120"/>
            </defaultWavelengthGrid>
            <instruments type="Instrument">
              <SEDInstrument instrumentName="x0" distance="3.086e18 m" inclination="0 deg" azimuth="0 deg" roll="0 deg"/>
            </instruments>
          </InstrumentSystem>
        </instrumentSystem>
      </MonteCarloSimulation>
    </skirt-simulation-hierarchy>
    """)
    p = tmp_path / "xray.ski"
    p.write_text(ski)
    from skirt9_tpu.config.ski import load_ski
    sim = load_ski(str(p), batch_size=8192, max_events=4)
    assert sim.options.xray and sim.xray_tabs is not None
    _, accs = sim.run_primary(verbose=False)
    out = dinst.calibrate_sed(sim.instruments[0], jax.device_get(accs[0]))
    lam_c = np.asarray(out["wavelength"])
    E_c = xr.HC_EV / lam_c / 1000.0
    scat = np.asarray(out["primaryscattered"])
    line_bin = np.argmin(np.abs(E_c - 6.40))
    around = np.concatenate([scat[line_bin - 5:line_bin - 1],
                             scat[line_bin + 2:line_bin + 6]])
    assert scat[line_bin] > 3 * max(around.mean(), 1e-30)
