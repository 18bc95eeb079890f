"""ClumpySphericalSpatialGrid: structured sphere + clump spheres
(ref: ClumpySphericalSpatialGrid.hpp:67)."""

import jax.numpy as jnp
import numpy as np

from skirt9_tpu.grids.clumpy import make_clumpy_spherical

PC = 3.0857e16


def _march(grid, pos, dirn, smax):
    """Collect (cell, ds) segments until the ray leaves the domain."""
    p, c, _ = grid.move_inside(jnp.asarray([pos], jnp.float32),
                               jnp.asarray([dirn], jnp.float32))
    segs = []
    total = 0.0
    for _ in range(grid.max_steps()):
        if int(c[0]) < 0 or total > smax:
            break
        ds, cn, pn = grid.step(p, jnp.asarray([dirn], jnp.float32), c)
        segs.append((int(c[0]), float(ds[0])))
        total += float(ds[0])
        p, c = pn, cn
    return segs


def test_clumpy_build_and_locate():
    cen = np.array([[0.5, 0.0, 0.0], [-0.4, 0.3, 0.0],
                    [0.52, 0.05, 0.0],   # overlaps clump 0 -> dropped
                    [0.0, 0.0, 0.99]]) * PC   # pokes out of r_max -> dropped
    rad = np.array([0.1, 0.08, 0.05, 0.05]) * PC
    g = make_clumpy_spherical(PC, 8, 6, 8, cen, rad)
    assert g.n_clumps == 2
    assert g.ncells == 2 + 8 * 6 * 8
    # clump-first indexing (ref: cellIndex doc: clumps are 0..Nc-1)
    c = np.asarray(g.locate(jnp.asarray(
        [[0.5 * PC, 0, 0], [-0.4 * PC, 0.3 * PC, 0],
         [0, 0.8 * PC, 0], [2 * PC, 0, 0]], jnp.float32)))
    assert c[0] == 0 and c[1] == 1
    assert c[2] >= 2 and c[3] == -1
    # volumes: clump volumes exact; total preserved within MC tolerance
    v = g.volumes()
    np.testing.assert_allclose(v[0], 4 / 3 * np.pi * (0.1 * PC) ** 3,
                               rtol=1e-6)
    np.testing.assert_allclose(v.sum(), 4 / 3 * np.pi * PC ** 3, rtol=5e-3)
    assert np.all(v >= 0)


def test_clumpy_traversal_chords():
    cen = np.array([[0.5, 0.0, 0.0]]) * PC
    rad = np.array([0.2]) * PC
    g = make_clumpy_spherical(PC, 8, 6, 8, cen, rad)
    # x-axis ray through the clump: clump chord = 2 * rad, total = 2 R
    segs = _march(g, np.array([-2 * PC, 1e-4 * PC, 1e-4 * PC]),
                  np.array([1.0, 0.0, 0.0]), 10 * PC)
    ds_clump = sum(ds for c, ds in segs if c == 0)
    ds_total = sum(ds for c, ds in segs)
    np.testing.assert_allclose(ds_clump, 2 * 0.2 * PC, rtol=1e-3)
    np.testing.assert_allclose(ds_total, 2 * PC, rtol=1e-3)
    # ray missing the clump never reports cell 0
    segs2 = _march(g, np.array([-2 * PC, -0.5 * PC, 1e-4 * PC]),
                   np.array([1.0, 0.0, 0.0]), 10 * PC)
    assert all(c != 0 for c, _ in segs2)
    np.testing.assert_allclose(sum(ds for _, ds in segs2),
                               2 * np.sqrt(1 - 0.25) * PC, rtol=1e-3)


def test_clumpy_ski(tmp_path):
    import os
    import textwrap

    from skirt9_tpu.config.ski import load_ski

    d = str(tmp_path)
    with open(os.path.join(d, "clumps.txt"), "w") as f:
        f.write("0.5 0 0 0.15\n-0.4 0.2 0 0.1\n")
    ski = os.path.join(d, "cl.ski")
    with open(ski, "w") as f:
        f.write(textwrap.dedent("""\
<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation userLevel="Expert" simulationMode="OligoExtinctionOnly" numPackets="2048">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits fluxOutputStyle="Wavelength"/></units>
    <cosmology type="Cosmology"><LocalUniverseCosmology/></cosmology>
    <sourceSystem type="SourceSystem">
      <SourceSystem wavelengths="0.55 micron" sourceBias="0.5">
        <sources type="Source">
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc" sourceWeight="1" wavelengthBias="0.5">
            <sed type="SED"><BlackBodySED temperature="5778 K"/></sed>
            <normalization type="LuminosityNormalization">
              <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1 Lsun"/>
            </normalization>
          </PointSource>
        </sources>
      </SourceSystem>
    </sourceSystem>
    <mediumSystem type="MediumSystem">
      <MediumSystem>
        <media type="Medium">
          <GeometricMedium velocityMagnitude="0 km/s">
            <geometry type="Geometry">
              <UniformSphereGeometry maxRadius="1 pc"/>
            </geometry>
            <materialMix type="MaterialMix">
              <TrivialGasMix absorptionCrossSection="4e-25 m2" scatteringCrossSection="6e-25 m2" asymmetryParameter="0.5"/>
            </materialMix>
            <normalization type="MaterialNormalization">
              <OpticalDepthMaterialNormalization axis="Z" wavelength="0.55 micron" opticalDepth="1.0"/>
            </normalization>
          </GeometricMedium>
        </media>
        <grid type="SpatialGrid">
          <ClumpySphericalSpatialGrid minRadius="0 pc" maxRadius="1.2 pc" filename="clumps.txt">
            <meshRadial type="Mesh"><LinMesh numBins="8"/></meshRadial>
            <meshPolar type="Mesh"><LinMesh numBins="6"/></meshPolar>
            <meshAzimuthal type="Mesh"><LinMesh numBins="8"/></meshAzimuthal>
          </ClumpySphericalSpatialGrid>
        </grid>
      </MediumSystem>
    </mediumSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="100 pc" inclination="0 deg" azimuth="0 deg" roll="0 deg" radius="0 pc" recordComponents="false" numScatteringLevels="0" recordPolarization="false" recordStatistics="false">
            <wavelengthGrid type="WavelengthGrid">
              <LogWavelengthGrid minWavelength="0.5 micron" maxWavelength="0.6 micron" numWavelengths="3"/>
            </wavelengthGrid>
          </SEDInstrument>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""))
    sim = load_ski(ski, num_packets=2048, batch_size=2048, max_events=4)
    sim.seed = 0
    from skirt9_tpu.grids.clumpy import ClumpySphericalGrid
    assert isinstance(sim.grid, ClumpySphericalGrid)
    assert sim.grid.n_clumps == 2
    rf, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0
