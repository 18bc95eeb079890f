"""Imported ParticleSource with SED families through the ski loader.

(ref: ParticleSource.hpp + ImportedSource.hpp:104 sedFamily;
FileSSPSEDFamily.hpp column conventions)
"""

import os

import numpy as np
import pytest

from skirt9_tpu.config.ski import load_ski
from skirt9_tpu.utils.storedtable import write_stored_table

SKI = """<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation simulationMode="ExtinctionOnly" numPackets="1e4">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits/></units>
    <sourceSystem type="SourceSystem">
      <SourceSystem minWavelength="0.2 micron" maxWavelength="5 micron" sourceBias="0.5">
        <sources type="Source">
          <ParticleSource filename="{pfile}" importVelocity="{vel}" sourceWeight="1" wavelengthBias="0.5">
            <smoothingKernel type="SmoothingKernel"><CubicSplineSmoothingKernel/></smoothingKernel>
            <sedFamily type="SEDFamily">{family}</sedFamily>
          </ParticleSource>
        </sources>
      </SourceSystem>
    </sourceSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <defaultWavelengthGrid type="WavelengthGrid">
          <LogWavelengthGrid minWavelength="0.2 micron" maxWavelength="5 micron" numWavelengths="20"/>
        </defaultWavelengthGrid>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="10 Mpc" inclination="0 deg" azimuth="0 deg" roll="0 deg" radius="0 pc" recordComponents="false" recordPolarization="false" recordStatistics="false"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


def write_ssp(path):
    lam = np.geomspace(1e-8, 1e-4, 128)
    Z = np.array([0.008, 0.02])
    t = np.array([1e7, 1e9])
    L = np.zeros((2, 2, 128, 1))
    # BC03-like magnitude: ~1e15 W/m per Msun at the optical peak
    shape = np.exp(-0.5 * ((np.log(lam / 8e-7)) / 0.6) ** 2)
    for i in range(2):
        for j in range(2):
            L[i, j, :, 0] = (1 + i + 2 * j) * 1e15 * shape
    write_stored_table(
        str(path),
        axes=[("lambda", "m", "log", lam), ("Z", "1", "lin", Z),
              ("t", "yr", "log", t)],
        quantities=[("Llambda", "W/m", "log")],
        values=L)


def test_ssp_particle_source_end_to_end(tmp_path):
    write_ssp(tmp_path / "ssp.stab")
    # 3 particles: x y z h Minit Z t
    np.savetxt(tmp_path / "stars.txt", np.array([
        [0.0, 0.0, 0.0, 0.1, 1e6, 0.02, 5e8],
        [0.5, 0.2, -0.1, 0.2, 2e6, 0.008, 1e7],
        [-0.4, 0.1, 0.3, 0.15, 5e5, 0.014, 1e9],
    ]))
    ski = tmp_path / "model.ski"
    ski.write_text(SKI.format(
        pfile="stars.txt", vel="false",
        family='<FileSSPSEDFamily filename="ssp.stab"/>'))
    sim = load_ski(str(ski), num_packets=20000)
    src = sim.sources[0]
    assert src.luminosity > 0
    _, accs = sim.run_primary(verbose=False)
    sed = np.asarray(accs[0]["sed"])
    assert sed.sum() > 0
    # transparent power equals the source luminosity (no medium); the raw
    # accumulator stores per-steradian contributions L/(4 pi)
    from skirt9_tpu.instruments.distant import KIND_NAMES
    k = KIND_NAMES.index("transparent")
    got = 4 * np.pi * float(sed[k].sum())
    assert got == pytest.approx(src.luminosity, rel=0.05)


def test_blackbody_family_particle_source(tmp_path):
    # x y z h R(km) T(K)
    np.savetxt(tmp_path / "bb.txt", np.array([
        [0.0, 0.0, 0.0, 0.1, 7e5, 5800.0],
        [1.0, 0.0, 0.0, 0.1, 7e5, 10000.0],
    ]))
    ski = tmp_path / "model.ski"
    ski.write_text(SKI.format(pfile="bb.txt", vel="false",
                              family="<BlackBodySEDFamily/>"))
    sim = load_ski(str(ski), num_packets=10000)
    src = sim.sources[0]
    # L over the clipped range must be below sigma T^4 total but positive
    import skirt9_tpu.utils.constants as c
    sb = 5.670374419e-8
    L_bol = sum(4 * np.pi * (7e8) ** 2 * sb * T ** 4
                for T in (5800.0, 10000.0))
    assert 0 < src.luminosity < L_bol
    # and a decent fraction of the bolometric power is in 0.2-5 um
    assert src.luminosity > 0.3 * L_bol
    _, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0


def test_family_source_velocity_shift(tmp_path):
    """importVelocity Doppler-shifts emitted wavelengths to first order."""
    write_ssp(tmp_path / "ssp.stab")
    v = 3000.0  # km/s, receding from a +z observer
    np.savetxt(tmp_path / "stars.txt", np.array([
        [0.0, 0.0, 0.0, 0.1, 0.0, 0.0, -v, 1e6, 0.02, 5e8],
    ]))
    ski = tmp_path / "model.ski"
    ski.write_text(SKI.format(
        pfile="stars.txt", vel="true",
        family='<FileSSPSEDFamily filename="ssp.stab"/>'))
    sim = load_ski(str(ski), num_packets=20000)
    _, accs = sim.run_primary(verbose=False)
    sed = np.asarray(accs[0]["sed"])  # observer at inclination 0 -> +z
    # blue-shifted: compare mean wavelength against the static run
    ski2 = tmp_path / "model2.ski"
    np.savetxt(tmp_path / "stars2.txt",
               np.array([[0.0, 0.0, 0.0, 0.1, 1e6, 0.02, 5e8]]))
    ski2.write_text(SKI.format(
        pfile="stars2.txt", vel="false",
        family='<FileSSPSEDFamily filename="ssp.stab"/>'))
    sim2 = load_ski(str(ski2), num_packets=20000)
    _, accs2 = sim2.run_primary(verbose=False)
    sed2 = np.asarray(accs2[0]["sed"])
    borders = np.asarray(sim.instruments[0].wave_borders)
    mid = np.sqrt(borders[1:] * borders[:-1])
    k = 1  # transparent kind row exists even for SEDInstrument
    w1 = (sed.sum(0) * mid).sum() / max(sed.sum(), 1e-300)
    w2 = (sed2.sum(0) * mid).sum() / max(sed2.sum(), 1e-300)
    # receding source -> mean observed wavelength moves red... the source
    # moves with vz=-3000 km/s (away from the +z observer) -> redshift
    assert w1 > w2 * (1 + 0.5 * (v * 1e3) / 3e8)
