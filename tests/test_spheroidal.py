"""Spheroidal aligned-grain polarized dust emission.

Mechanism coverage for the reference's SpheroidalPolarization mode
(ref: SpheroidalSilicateGrainComposition.hpp OneTable/TwoTables custom
tables, MultiGrainDustMix.cpp:186-317 size integration,
DustSecondarySource.cpp:440-583 polarised launch/peel): synthetic CosTuuM
-layout stored tables drive the size integration, the angular emission
CDF around the cell's magnetic field, the launch Stokes state, and a
full ski run end to end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skirt9_tpu.media import grains as gr
from skirt9_tpu.ops import rng
from skirt9_tpu.utils.storedtable import write_stored_table

PC = 3.0857e16


def _synthetic_stab(path, qabs_fn, qpol_fn,
                    lam=None, theta=None, a=None):
    a = np.asarray(a if a is not None else [5e-9, 250e-9])
    lam = np.asarray(lam if lam is not None
                     else np.geomspace(0.09e-6, 2000e-6, 16))
    theta = np.asarray(theta if theta is not None
                       else np.linspace(0.0, np.pi, 9))
    vals = np.zeros((len(theta), len(lam), len(a), 2))
    for t, th in enumerate(theta):
        vals[t, :, :, 0] = qabs_fn(th)
        vals[t, :, :, 1] = qpol_fn(th)
    write_stored_table(
        str(path),
        axes=[("a", "m", "log", a), ("lambda", "m", "log", lam),
              ("theta", "rad", "lin", theta)],
        quantities=[("Qabs", "1", "log"), ("Qabspol", "1", "lin")],
        values=vals)
    return str(path)


QABS = lambda th: 1.0 + np.cos(th) ** 2
QPOL = lambda th: 0.3 * np.sin(th) ** 2


@pytest.fixture()
def sph_tables(tmp_path):
    p = _synthetic_stab(tmp_path / "sph.stab", QABS, QPOL)
    pop = gr.GrainPopulation(gr.silicate_composition(),
                             gr.power_law_sizes(), 4, 1e-29)
    spec = gr.SpheroidalEmissionSpec(table1=p)
    return gr.build_spheroidal_emission([pop], [spec])


def test_size_integration_shape(sph_tables):
    se = sph_tables
    th = se.theta
    # size-independent Q: the angular shape must survive integration
    # exactly, and sigma_abspol / sigma_abs must equal Qabspol / Qabs
    ratio = se.sabs[0] / se.sabs[0, 0]
    np.testing.assert_allclose(ratio, QABS(th) / QABS(th[0]), rtol=1e-10)
    np.testing.assert_allclose(
        se.sabspol[3], se.sabs[3] * QPOL(th) / QABS(th), rtol=1e-10)
    # spherical population adds a theta-INDEPENDENT term
    pop = gr.GrainPopulation(gr.silicate_composition(),
                             gr.power_law_sizes(), 4, 1e-29)
    spec = gr.SpheroidalEmissionSpec(
        table1=_synthetic_stab_obj())
    se2 = gr.build_spheroidal_emission([pop, pop], [spec, None])
    extra = se2.sabs - _rescale(se2, spec)
    assert np.allclose(extra, extra[:, :1], rtol=1e-6)


def _synthetic_stab_obj():
    import tempfile
    d = tempfile.mkdtemp()
    return _synthetic_stab(os.path.join(d, "t.stab"), QABS, QPOL)


def _rescale(se2, spec):
    # the spheroidal population's own contribution (recompute single-pop)
    pop = gr.GrainPopulation(gr.silicate_composition(),
                             gr.power_law_sizes(), 4, 1e-29)
    return gr.build_spheroidal_emission([pop], [spec]).sabs


def test_alignment_interpolation(tmp_path):
    p1 = _synthetic_stab(tmp_path / "non.stab", lambda th: 1.0,
                         lambda th: 0.0)
    p2 = _synthetic_stab(tmp_path / "ali.stab", QABS, QPOL)
    pop = gr.GrainPopulation(gr.silicate_composition(),
                             gr.power_law_sizes(), 4, 1e-29)
    se_non = gr.build_spheroidal_emission(
        [pop], [gr.SpheroidalEmissionSpec(p1)])
    se_ali = gr.build_spheroidal_emission(
        [pop], [gr.SpheroidalEmissionSpec(p1, p2, fraction=1.0)])
    se_half = gr.build_spheroidal_emission(
        [pop], [gr.SpheroidalEmissionSpec(p1, p2, fraction=0.5)])
    np.testing.assert_allclose(se_half.sabs,
                               0.5 * (se_non.sabs + se_ali.sabs), rtol=1e-12)
    np.testing.assert_allclose(se_half.sabspol, 0.5 * se_ali.sabspol,
                               rtol=1e-12)


def _profile(sph, ncells=1, bvec=(0.0, 0.0, 1.0)):
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.sources import secondary as sec
    from skirt9_tpu.grids.cartesian import make_cartesian

    grid = make_cartesian(((-PC, PC),) * 3, (1, 1, 1))
    med = msys.make_medium(
        grid, np.ones(ncells), np.array([0.4e-6, 0.7e-6]),
        sigma_ext=np.full((1, 2), 1e-24), albedo=np.full((1, 2), 0.5),
        g=np.zeros((1, 2)),
        magnetic_field=np.tile(np.asarray(bvec, np.float64) * 1e-10,
                               (ncells, 1)))
    return sec.build_spheroidal_profile(sph, med)


def test_direction_distribution_and_stokes(sph_tables):
    prof = _profile(sph_tables)
    B = 8192
    keys = rng.history_keys(jax.random.PRNGKey(0),
                            jnp.arange(B, dtype=jnp.int32))
    lam = jnp.full((B,), 100e-6, jnp.float32)
    cell = jnp.zeros((B,), jnp.int32)
    k = prof.sample_direction(keys, lam, cell)
    assert np.allclose(np.linalg.norm(np.asarray(k), axis=-1), 1.0,
                       atol=1e-5)
    # pdf ~ (1 + cos^2) sin theta around z: E[cos^2 theta] = 2/5
    c2 = float(jnp.mean(k[:, 2] ** 2))
    assert abs(c2 - 0.4) < 0.02, c2
    # Stokes at theta = 90 deg: Q/I = Qabspol/Qabs = 0.3
    kx = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (4, 1))
    st, n = prof.stokes_for(kx, jnp.full((4,), 100e-6),
                            jnp.zeros((4,), jnp.int32))
    np.testing.assert_allclose(np.asarray(st[:, 1]), 0.3 / 1.0, rtol=1e-3)
    # reference normal k x B = -y
    np.testing.assert_allclose(np.asarray(n), [[0.0, -1.0, 0.0]] * 4,
                               atol=1e-6)
    # emission phase normalizes to 1 over the sphere
    th = np.linspace(0, np.pi, 201)
    ph = []
    for t in th:
        ko = jnp.asarray([np.sin(t), 0.0, np.cos(t)], jnp.float32)
        ph.append(float(prof.emission_phase(
            ko, None, jnp.full((1,), 100e-6), jnp.zeros((1,), jnp.int32))[0]))
    total = 2 * np.pi * np.trapezoid(np.asarray(ph) * np.sin(th), th)
    np.testing.assert_allclose(total, 1.0, rtol=2e-3)


def test_no_field_is_isotropic_unpolarized(sph_tables):
    prof = _profile(sph_tables, bvec=(0.0, 0.0, 0.0))
    B = 4096
    keys = rng.history_keys(jax.random.PRNGKey(1),
                            jnp.arange(B, dtype=jnp.int32))
    lam = jnp.full((B,), 100e-6, jnp.float32)
    cell = jnp.zeros((B,), jnp.int32)
    k = prof.sample_direction(keys, lam, cell)
    c2 = float(jnp.mean(k[:, 2] ** 2))
    assert abs(c2 - 1.0 / 3.0) < 0.025, c2
    st, _ = prof.stokes_for(k, lam, cell)
    assert float(jnp.max(jnp.abs(st[:, 1]))) == 0.0
    ko = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    ph = prof.emission_phase(ko, None, lam[:4], cell[:4])
    np.testing.assert_allclose(np.asarray(ph), 1.0 / (4 * np.pi), rtol=1e-6)


SKI_SPH = """<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation userLevel="Expert" simulationMode="DustEmission" numPackets="1e4">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits fluxOutputStyle="Wavelength"/></units>
    <sourceSystem type="SourceSystem">
      <SourceSystem minWavelength="0.09 micron" maxWavelength="100 micron" sourceBias="0.5">
        <sources type="Source">
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc" sourceWeight="1" wavelengthBias="0.5">
            <sed type="SED"><BlackBodySED temperature="5778 K"/></sed>
            <normalization type="LuminosityNormalization">
              <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1e5 Lsun"/>
            </normalization>
          </PointSource>
        </sources>
      </SourceSystem>
    </sourceSystem>
    <mediumSystem type="MediumSystem">
      <MediumSystem>
        <radiationFieldOptions type="RadiationFieldOptions">
          <RadiationFieldOptions storeRadiationField="true">
            <radiationFieldWLG type="DisjointWavelengthGrid">
              <LogWavelengthGrid minWavelength="0.09 micron" maxWavelength="100 micron" numWavelengths="12"/>
            </radiationFieldWLG>
          </RadiationFieldOptions>
        </radiationFieldOptions>
        <dustEmissionOptions type="DustEmissionOptions">
          <DustEmissionOptions dustEmissionType="Equilibrium" sourceWeight="1" wavelengthBias="0.5">
            <dustEmissionWLG type="DisjointWavelengthGrid">
              <LogWavelengthGrid minWavelength="1 micron" maxWavelength="2000 micron" numWavelengths="20"/>
            </dustEmissionWLG>
          </DustEmissionOptions>
        </dustEmissionOptions>
        <media type="Medium">
          <GeometricMedium magneticFieldStrength="1 uG">
            <geometry type="Geometry">
              <ShellGeometry minRadius="1e-6 pc" maxRadius="1 pc" exponent="0"/>
            </geometry>
            <magneticFieldDistribution type="VectorField">
              <UnidirectionalVectorField fieldX="0" fieldY="0" fieldZ="1"/>
            </magneticFieldDistribution>
            <materialMix type="MaterialMix">
              <ConfigurableDustMix scatteringType="SpheroidalPolarization">
                <populations type="GrainPopulation">
                  <GrainPopulation numSizes="3" dustMassPerHydrogenAtom="1e-29 kg">
                    <composition type="GrainComposition">
                      <SpheroidalSilicateGrainComposition tableType="OneTable" emissionTable="sph.stab" alignmentFraction="1"/>
                    </composition>
                    <sizeDistribution type="GrainSizeDistribution">
                      <PowerLawGrainSizeDistribution minSize="0.005 micron" maxSize="0.25 micron" exponent="3.5"/>
                    </sizeDistribution>
                  </GrainPopulation>
                </populations>
              </ConfigurableDustMix>
            </materialMix>
            <normalization type="MaterialNormalization">
              <OpticalDepthMaterialNormalization axis="Z" wavelength="0.55 micron" opticalDepth="1.0"/>
            </normalization>
          </GeometricMedium>
        </media>
        <grid type="SpatialGrid">
          <CartesianSpatialGrid minX="-1.2 pc" maxX="1.2 pc" minY="-1.2 pc" maxY="1.2 pc" minZ="-1.2 pc" maxZ="1.2 pc">
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
          <LogWavelengthGrid minWavelength="0.2 micron" maxWavelength="1000 micron" numWavelengths="15"/>
        </defaultWavelengthGrid>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="100 pc" inclination="90 deg" azimuth="0 deg" roll="0 deg" radius="0 pc" recordComponents="true" numScatteringLevels="0" recordPolarization="true" recordStatistics="false"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


def test_ski_spheroidal_end_to_end(tmp_path):
    from skirt9_tpu.config.ski import load_ski

    _synthetic_stab(tmp_path / "sph.stab", QABS, QPOL)
    ski = tmp_path / "sph.ski"
    ski.write_text(SKI_SPH)
    sim = load_ski(str(ski), batch_size=2048, max_events=8,
                   num_packets=4096)
    assert sim.spheroidal is not None
    assert sim.mueller is not None     # spherical-polarization scattering
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    sed = np.asarray(accs[0]["sed"])
    assert np.isfinite(sed).all()
    # far-IR: secondary-direct dominated; the edge-on observer sees
    # theta = 90 deg emission with linear polarization degree
    # Qabspol/Qabs = 0.3 (the instrument-frame rotation moves it between
    # Q and U but preserves the degree)
    sim.write_outputs(accs, "sph", str(tmp_path))
    d = np.loadtxt(tmp_path / "sph_i0_sed.dat")
    lam_um = d[:, 0]
    far = lam_um > 100.0
    tot = d[far, 1]
    Q = d[far, 7]
    U = d[far, 8]
    sel = tot > 0
    assert sel.any()
    deg = np.sqrt(Q[sel] ** 2 + U[sel] ** 2) / tot[sel]
    assert (deg > 0.2).all() and (deg < 0.35).all(), deg
