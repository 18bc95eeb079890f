"""Output unit systems and cosmological redshift.

(ref: Units.hpp:29 / SkirtUnitDef.cpp output unit tables;
Cosmology.hpp:16, FlatUniverseCosmology, FluxRecorder.cpp:310,:503)
"""

import numpy as np
import pytest

from skirt9_tpu.utils.unitsystem import UnitSystem
from skirt9_tpu.utils import cosmology as cosmo

C = 2.99792458e8


def test_unit_system_wavelength_and_flux_styles():
    us = UnitSystem("ExtragalacticUnits", "Wavelength")
    assert us.unit("wavelength") == "micron"
    assert us.out_wavelength(1e-6) == pytest.approx(1.0)
    # F_lambda: W/m2/m -> W/m2/micron
    assert us.out_flux(1e6, 1e-6) == pytest.approx(1.0)

    us_nu = UnitSystem("ExtragalacticUnits", "Frequency")
    # F_nu = F_lambda lam^2/c in Jy
    f_nu = us_nu.out_flux(1e6, 1e-6)
    assert f_nu == pytest.approx(1e6 * 1e-12 / C / 1e-26)

    us_n = UnitSystem("SIUnits", "Neutral")
    assert us_n.out_flux(1e6, 1e-6) == pytest.approx(1.0)  # lam*F_lambda


def test_flat_universe_distances():
    """Sanity against well-known LCDM values: at z=1 (h=0.7, Om=0.3) the
    luminosity distance is ~6600 Mpc, d_A = d_L/(1+z)^2."""
    c1 = cosmo.FlatUniverseCosmology(redshift=1.0, h=0.7, omega_m=0.3)
    MPC = 3.08567758149e22
    dl = c1.luminosity_distance() / MPC
    assert dl == pytest.approx(6600, rel=0.03)
    assert c1.angular_diameter_distance() == pytest.approx(
        c1.luminosity_distance() / (1 + 1.0) ** 2, rel=1e-12)
    # monotonic in z
    c2 = cosmo.FlatUniverseCosmology(redshift=2.0, h=0.7, omega_m=0.3)
    assert c2.luminosity_distance() > c1.luminosity_distance()


def test_redshifted_ski_detection(tmp_path):
    """A model at redshift z: detected wavelengths stretch by (1+z) and
    fluxes calibrate with the luminosity distance."""
    import jax
    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.instruments import distant as dinst

    def ski(cos):
        return f"""<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation simulationMode="OligoExtinctionOnly" numPackets="1e4">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits/></units>
    <cosmology type="Cosmology">{cos}</cosmology>
    <sourceSystem type="SourceSystem">
      <SourceSystem wavelengths="0.55 micron" sourceBias="0.5">
        <sources type="Source">
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc">
            <sed type="SED"><BlackBodySED temperature="5778 K"/></sed>
            <normalization type="LuminosityNormalization">
              <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1e12 Lsun"/>
            </normalization>
          </PointSource>
        </sources>
      </SourceSystem>
    </sourceSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <defaultWavelengthGrid type="WavelengthGrid">
          <LogWavelengthGrid minWavelength="0.3 micron" maxWavelength="3 micron" numWavelengths="20"/>
        </defaultWavelengthGrid>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="10 Mpc" inclination="0 deg" azimuth="0 deg" roll="0 deg" radius="0 pc"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""
    p0 = tmp_path / "local.ski"
    p0.write_text(ski("<LocalUniverseCosmology/>"))
    p1 = tmp_path / "z1.ski"
    p1.write_text(ski('<FlatUniverseCosmology redshift="1"'
                      ' reducedHubbleConstant="0.7"'
                      ' matterDensityFraction="0.3"/>'))
    sim0 = load_ski(str(p0), num_packets=5000)
    sim1 = load_ski(str(p1), num_packets=5000)
    assert sim1.instruments[0].redshift == 1.0
    MPC = 3.08567758149e22
    assert sim1.instruments[0].distance == pytest.approx(6600 * MPC,
                                                         rel=0.03)
    _, a0 = sim0.run_primary(verbose=False)
    _, a1 = sim1.run_primary(verbose=False)
    s0 = np.asarray(a0[0]["sed"]).sum(axis=0)
    s1 = np.asarray(a1[0]["sed"]).sum(axis=0)
    wb = np.asarray(sim0.instruments[0].wave_borders)
    mids = np.sqrt(wb[1:] * wb[:-1])
    # local model: photons land at 0.55 um; z=1: at 1.10 um
    assert mids[np.argmax(s0)] == pytest.approx(0.55e-6, rel=0.1)
    assert mids[np.argmax(s1)] == pytest.approx(1.10e-6, rel=0.1)
    # calibrated flux scales with the luminosity distance
    sed1 = dinst.calibrate_sed(sim1.instruments[0], jax.device_get(a1[0]))
    sed0 = dinst.calibrate_sed(sim0.instruments[0], jax.device_get(a0[0]))
    f0 = np.asarray(sed0["total"]).max()
    f1 = np.asarray(sed1["total"]).max()
    assert f1 < f0 * 1e-4  # ~ (10 Mpc / 6600 Mpc)^2
