"""Extended medium state: metallicity, temperature, magnetic field imports
+ their probes.

(ref: MediumState.hpp magneticField/metallicity; ImportedMedium.cpp:18-24
column order: position, density, [Z], [T], [velocity], [B])
"""

import os

import numpy as np
import pytest


def _voronoi_ski(tmp_path, columns, attrs):
    rs = np.random.default_rng(0)
    N = 60
    sites = rs.uniform(-0.9, 0.9, (N, 3))
    rows = np.column_stack([sites] + columns)
    np.savetxt(tmp_path / "gas.txt", rows)
    ski = f"""<?xml version="1.0"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
 <MonteCarloSimulation userLevel="Regular" simulationMode="ExtinctionOnly"
     numPackets="1000">
  <random type="Random"><Random seed="0"/></random>
  <units type="Units"><ExtragalacticUnits/></units>
  <sourceSystem type="SourceSystem">
   <SourceSystem minWavelength="0.4 micron" maxWavelength="0.7 micron"
       wavelengths="0.55 micron" sourceBias="0.5">
    <sources type="Source">
     <PointSource positionX="0 m" positionY="0 m" positionZ="0 m">
      <sed type="SED"><BlackBodySED temperature="5000 K"/></sed>
      <normalization type="LuminosityNormalization">
       <IntegratedLuminosityNormalization wavelengthRange="Source"
           integratedLuminosity="1 Lsun"/>
      </normalization>
     </PointSource>
    </sources>
   </SourceSystem>
  </sourceSystem>
  <mediumSystem type="MediumSystem">
   <MediumSystem>
    <media type="Medium">
     <VoronoiMeshMedium filename="gas.txt" minX="-1 pc" maxX="1 pc"
         minY="-1 pc" maxY="1 pc" minZ="-1 pc" maxZ="1 pc"
         massType="MassDensity" massFraction="1" {attrs}>
      <materialMix type="MaterialMix"><MeanInterstellarDustMix/></materialMix>
     </VoronoiMeshMedium>
    </media>
    <grid type="SpatialGrid">
     <VoronoiMeshSpatialGrid minX="-1 pc" maxX="1 pc" minY="-1 pc"
         maxY="1 pc" minZ="-1 pc" maxZ="1 pc" policy="ImportedMesh"
         numSites="0"/>
    </grid>
   </MediumSystem>
  </mediumSystem>
  <instrumentSystem type="InstrumentSystem"><InstrumentSystem/>
  </instrumentSystem>
  <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
 </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""
    p = tmp_path / "v.ski"
    p.write_text(ski)
    from skirt9_tpu.config.ski import load_ski
    return load_ski(str(p), num_packets=512, batch_size=256)


def test_voronoi_full_state_import(tmp_path):
    """Columns in the reference order: rho, Z, T, v, B all land in the
    medium tables with correct units."""
    N = 60
    rho = np.full((N, 1), 10.0)      # Msun/pc3
    Z = np.full((N, 1), 0.02)
    T = np.full((N, 1), 8000.0)
    v = np.tile([[10.0, -20.0, 30.0]], (N, 1))   # km/s
    B = np.tile([[1.0, 2.0, -3.0]], (N, 1))      # uG
    sim = _voronoi_ski(
        tmp_path, [rho, Z, T, v, B],
        'importMetallicity="true" importTemperature="true" '
        'importVelocity="true" importMagneticField="true"')
    med = sim.medium
    np.testing.assert_allclose(np.asarray(med.temperature), 8000.0)
    np.testing.assert_allclose(np.asarray(med.bulk_v),
                               np.tile([[1e4, -2e4, 3e4]], (med.nd.shape[0],
                                                            1)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(med.magnetic_field),
                               np.tile([[1e-10, 2e-10, -3e-10]],
                                       (med.nd.shape[0], 1)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(med.metallicity), 0.02,
                               rtol=1e-5)
    # metallicity scales the density: nd = rho*Z/mu
    MSUN, PC = 1.98892e30, 3.0857e16
    mix = sim.medium_components[0][1]
    expect = 10.0 * MSUN / PC**3 * 0.02 / mix.mu
    np.testing.assert_allclose(np.asarray(med.nd)[:, 0], expect, rtol=1e-4)


def test_voronoi_density_only_unchanged(tmp_path):
    N = 60
    rho = np.full((N, 1), 10.0)
    sim = _voronoi_ski(tmp_path, [rho], 'importVelocity="false"')
    assert not np.any(np.asarray(sim.medium.magnetic_field))
    assert not np.any(np.asarray(sim.medium.metallicity))


def test_state_probes(tmp_path):
    N = 60
    rho = np.full((N, 1), 10.0)
    Z = np.full((N, 1), 0.013)
    T = np.full((N, 1), 7500.0)
    v = np.zeros((N, 3))
    B = np.tile([[0.0, 0.0, 5.0]], (N, 1))
    sim = _voronoi_ski(
        tmp_path, [rho, Z, T, v, B],
        'importMetallicity="true" importTemperature="true" '
        'importVelocity="true" importMagneticField="true"')
    import skirt9_tpu.probes.probes as pr
    out = str(tmp_path)
    for kind, fname in [("magneticfield", "x_p_B.dat"),
                        ("metallicity", "x_p_Z.dat"),
                        ("gastemperature", "x_p_gasT.dat")]:
        paths = pr.ProbeSpec(kind, "p").run(sim, "x", out)
        assert paths and os.path.exists(paths[0]), kind
    d = np.loadtxt(os.path.join(out, "x_p_B.dat"))
    np.testing.assert_allclose(d[:, 5], 5e-10, rtol=1e-5)
