"""Imported geometries (ref: ImportedGeometry.hpp:19 family) and mesh
imported sources (ref: VoronoiMeshSource.hpp:47, AdaptiveMeshSource.hpp:46):
snapshot data as normalized Geometry objects + entity sources."""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from skirt9_tpu.geometries import imported as ig
from skirt9_tpu.imports import snapshots as snap
from skirt9_tpu.ops import rng

PC = 3.0857e16


def _keys(n, seed=3):
    import jax
    seed_key = jax.random.PRNGKey(seed)
    return rng.history_keys(seed_key, jnp.arange(n, dtype=jnp.int32))


def test_particle_geometry_density_and_sampling():
    pos = np.array([[0.0, 0, 0], [2.0, 0, 0]]) * PC
    ss = snap.ParticleSnapshot(positions=pos, h=np.array([0.5, 0.5]) * PC,
                               mass=np.array([1.0, 3.0]))
    geo = ig.ParticleGeometry(snapshot=ss)
    # density normalizes to total mass 1: kernel integral per particle = 1
    # -> MC integral of density_np over the union of supports ~ 1
    rs = np.random.default_rng(5)
    box = 3.0 * PC
    pts = rs.uniform([-1, -1, -1], [3, 1, 1], size=(40000, 3)) * box / 3 \
        * np.array([3, 1, 1]) / np.array([3, 1, 1])
    pts = rs.uniform([-1 * PC, -1 * PC, -1 * PC],
                     [3 * PC, 1 * PC, 1 * PC], size=(40000, 3))
    vol = (4 * PC) * (2 * PC) * (2 * PC)
    integral = geo.density_np(pts).mean() * vol
    assert abs(integral - 1.0) < 0.05
    # samples: each within h of its particle; mass split 1:3
    xs = np.asarray(geo.sample(_keys(4096)))
    d0 = np.linalg.norm(xs - pos[0], axis=-1)
    d1 = np.linalg.norm(xs - pos[1], axis=-1)
    assert np.all(np.minimum(d0, d1) <= 0.5 * PC * (1 + 1e-5))
    frac1 = np.mean(d1 < d0)
    assert abs(frac1 - 0.75) < 0.03


def test_cell_geometry_density_and_sampling():
    lo = np.array([[0.0, 0, 0], [1.0, 0, 0]]) * PC
    hi = np.array([[1.0, 1, 1], [2.0, 1, 1]]) * PC
    geo = ig.CellGeometry(snapshot=snap.CellSnapshot(
        lo=lo, hi=hi, mass=np.array([1.0, 3.0])))
    # normalized density: rho_i = m_i / (V_i * M) -> integral = 1
    rho = geo.density_np(np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]]) * PC)
    np.testing.assert_allclose(rho[1] / rho[0], 3.0, rtol=1e-12)
    # integral over both boxes: (rho1 + rho2) * V_box = 1
    np.testing.assert_allclose(rho.sum() * (PC ** 3), 1.0, rtol=1e-6)
    xs = np.asarray(geo.sample(_keys(4096)))
    in2 = xs[:, 0] > PC
    assert abs(np.mean(in2) - 0.75) < 0.03
    assert np.all((xs >= lo[0] - 1e-3) & (xs <= hi[1] + 1e-3))


def test_cylindrical_and_spherical_cell_geometry():
    # one full cylindrical shell; uniform density within
    lo = np.array([[0.5 * PC, 0.0, -PC]])
    hi = np.array([[1.0 * PC, 2 * np.pi, PC]])
    geo = ig.CylindricalCellGeometry(snapshot=snap.CylindricalCellSnapshot(
        lo=lo, hi=hi, mass=np.array([2.0])))
    xs = np.asarray(geo.sample(_keys(8192)))
    R = np.hypot(xs[:, 0], xs[:, 1])
    assert np.all((R >= 0.5 * PC * (1 - 1e-5)) & (R <= PC * (1 + 1e-5)))
    assert np.all(np.abs(xs[:, 2]) <= PC * (1 + 1e-5))
    # uniform in R^2: mean of R^2 = (Rmin^2 + Rmax^2)/2
    np.testing.assert_allclose(np.mean((R / PC) ** 2), (0.25 + 1.0) / 2,
                               rtol=0.02)
    vol = np.pi * (PC ** 2 - (0.5 * PC) ** 2) * 2 * PC
    rho = geo.density_np(np.array([[0.7 * PC, 0, 0]]))
    np.testing.assert_allclose(rho[0], 1.0 / vol, rtol=1e-6)

    los = np.array([[0.2 * PC, 0.0, 0.0]])
    his = np.array([[1.0 * PC, np.pi, 2 * np.pi]])
    geos = ig.SphericalCellGeometry(snapshot=snap.SphericalCellSnapshot(
        lo=los, hi=his, mass=np.array([1.0])))
    xs = np.asarray(geos.sample(_keys(8192)))
    r = np.linalg.norm(xs, axis=-1)
    assert np.all((r >= 0.2 * PC * (1 - 1e-4)) & (r <= PC * (1 + 1e-4)))
    # uniform in r^3
    np.testing.assert_allclose(np.mean((r / PC) ** 3),
                               (0.2 ** 3 + 1.0) / 2, rtol=0.03)
    vol = 4 * np.pi / 3 * (PC ** 3 - (0.2 * PC) ** 3)
    rho = geos.density_np(np.array([[0, 0, 0.5 * PC]]))
    np.testing.assert_allclose(rho[0], 1.0 / vol, rtol=1e-6)


def test_voronoi_mesh_geometry():
    rs = np.random.default_rng(11)
    sites = rs.uniform(-PC, PC, size=(64, 3))
    mass = rs.uniform(0.5, 2.0, size=64)
    ext = ((-PC, PC),) * 3
    geo = ig.VoronoiMeshGeometry(sites=sites, mass=mass, extent=ext)
    # density parity vs the tessellation: rho(site_i) = m_i / (V_i M)
    vols = geo._grid.volumes()
    rho = geo.density_np(sites)
    np.testing.assert_allclose(rho, mass / (vols * mass.sum()), rtol=1e-5)
    # sampled positions: nearest site == the mass-cdf-selected cell, and
    # the per-cell sample frequency tracks the mass fractions
    xs = np.asarray(geo.sample(_keys(16384)))
    from scipy.spatial import cKDTree
    _, owner = cKDTree(sites).query(xs)
    freq = np.bincount(owner, minlength=64) / len(xs)
    expect = mass / mass.sum()
    # ~256 samples/cell -> ~6% MC noise per cell on a ~2x density contrast
    assert np.corrcoef(freq, expect)[0, 1] > 0.95
    assert np.all(np.abs(xs) <= PC)


def test_adaptive_mesh_geometry(tmp_path):
    p = tmp_path / "amr.txt"
    # root 2x1x1: left leaf, right subdivides 2x1x1 into two leaves
    p.write_text("! 2 1 1\n4.0\n! 2 1 1\n1.0\n3.0\n")
    from skirt9_tpu.grids.amr import build_amr
    ext = ((-PC, PC), (-PC, PC), (-PC, PC))
    grid, leaf = build_amr(str(p), ext)
    geo = ig.AdaptiveMeshGeometry(grid=grid, mass=leaf[:, 0])
    assert geo.total_mass == 8.0
    # density: left half rho = 4 / (V_left * 8); quarter cells 1,3
    V = (2 * PC) ** 3
    rho = geo.density_np(np.array([[-0.5 * PC, 0, 0],
                                   [0.25 * PC, 0, 0],
                                   [0.75 * PC, 0, 0]]))
    np.testing.assert_allclose(
        rho, [4.0 / (V / 2) / 8, 1.0 / (V / 4) / 8, 3.0 / (V / 4) / 8],
        rtol=1e-5)
    xs = np.asarray(geo.sample(_keys(8192)))
    left = np.mean(xs[:, 0] < 0)
    assert abs(left - 0.5) < 0.03


# --------------------------------------------------------------- ski wiring

def _write(p, name, text):
    f = os.path.join(p, name)
    with open(f, "w") as fh:
        fh.write(textwrap.dedent(text))
    return f


_SKI_TMPL = """\
<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation userLevel="Expert" simulationMode="ExtinctionOnly" numPackets="1024">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits fluxOutputStyle="Wavelength"/></units>
    <cosmology type="Cosmology"><LocalUniverseCosmology/></cosmology>
    <sourceSystem type="SourceSystem">
      <SourceSystem minWavelength="0.4 micron" maxWavelength="0.8 micron" sourceBias="0.5">
        <sources type="Source">
{SOURCE}
        </sources>
      </SourceSystem>
    </sourceSystem>
    <mediumSystem type="MediumSystem">
      <MediumSystem>
        <media type="Medium">
{MEDIUM}
        </media>
        <grid type="SpatialGrid">
          <CartesianSpatialGrid minX="-2 pc" maxX="2 pc" minY="-2 pc" maxY="2 pc" minZ="-2 pc" maxZ="2 pc">
            <meshX type="Mesh"><LinMesh numBins="8"/></meshX>
            <meshY type="Mesh"><LinMesh numBins="8"/></meshY>
            <meshZ type="Mesh"><LinMesh numBins="8"/></meshZ>
          </CartesianSpatialGrid>
        </grid>
      </MediumSystem>
    </mediumSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="100 pc" inclination="0 deg" azimuth="0 deg" roll="0 deg" radius="0 pc" recordComponents="false" numScatteringLevels="0" recordPolarization="false" recordStatistics="false">
            <wavelengthGrid type="WavelengthGrid">
              <LogWavelengthGrid minWavelength="0.4 micron" maxWavelength="0.8 micron" numWavelengths="5"/>
            </wavelengthGrid>
          </SEDInstrument>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""

_TRIVIAL_MEDIUM = """\
          <GeometricMedium velocityMagnitude="0 km/s">
            <geometry type="Geometry">
              <UniformSphereGeometry maxRadius="1.5 pc"/>
            </geometry>
            <materialMix type="MaterialMix">
              <TrivialGasMix absorptionCrossSection="1e-26 m2" scatteringCrossSection="1e-26 m2" asymmetryParameter="0.0"/>
            </materialMix>
            <normalization type="MaterialNormalization">
              <OpticalDepthMaterialNormalization axis="Z" wavelength="0.55 micron" opticalDepth="0.5"/>
            </normalization>
          </GeometricMedium>
"""


def test_ski_particle_geometry_source(tmp_path):
    """ParticleGeometry drives a GeometricSource from a ski file; launch
    positions reproduce the snapshot's kernel clouds (round-5 verdict
    missing #1 done-criterion)."""
    from skirt9_tpu.config.ski import load_ski

    d = str(tmp_path)
    _write(d, "parts.txt", """\
        # x y z h M  (pc, Msun)
        -1 0 0 0.3 1.0
         1 0 0 0.3 3.0
    """)
    src = """\
          <GeometricSource velocityMagnitude="0 km/s" sourceWeight="1" wavelengthBias="0.5">
            <geometry type="Geometry">
              <ParticleGeometry filename="parts.txt" importMetallicity="false" importTemperature="false">
                <smoothingKernel type="SmoothingKernel"><CubicSplineSmoothingKernel/></smoothingKernel>
              </ParticleGeometry>
            </geometry>
            <sed type="SED"><BlackBodySED temperature="5778 K"/></sed>
            <normalization type="LuminosityNormalization">
              <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1 Lsun"/>
            </normalization>
          </GeometricSource>
"""
    ski = _write(d, "pg.ski", _SKI_TMPL.format(SOURCE=src,
                                               MEDIUM=_TRIVIAL_MEDIUM))
    sim = load_ski(ski, num_packets=1024, batch_size=1024, max_events=4)
    sim.seed = 0
    rf, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0
    # position parity vs the snapshot: the source geometry's samples
    geo = sim.sources[0].geometry
    xs = np.asarray(geo.sample(_keys(2048)))
    d0 = np.linalg.norm(xs - np.array([-PC, 0, 0]), axis=-1)
    d1 = np.linalg.norm(xs - np.array([PC, 0, 0]), axis=-1)
    assert np.all(np.minimum(d0, d1) <= 0.3 * PC * (1 + 1e-4))
    assert abs(np.mean(d1 < d0) - 0.75) < 0.05


def test_ski_voronoi_geometry_medium(tmp_path):
    """VoronoiMeshGeometry as a GeometricMedium's density profile: the
    gridded medium densities track the snapshot's cell densities."""
    from skirt9_tpu.config.ski import load_ski

    d = str(tmp_path)
    rs = np.random.default_rng(7)
    sites = rs.uniform(-1.5, 1.5, size=(32, 3))
    rho = rs.uniform(0.5, 2.0, size=32)
    rows = "\n".join(f"{s[0]} {s[1]} {s[2]} {r}"
                     for s, r in zip(sites, rho))
    _write(d, "vsites.txt", "# x y z rho (pc, Msun/pc3)\n" + rows + "\n")
    src = """\
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc" sourceWeight="1" wavelengthBias="0.5">
            <sed type="SED"><BlackBodySED temperature="5778 K"/></sed>
            <normalization type="LuminosityNormalization">
              <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1 Lsun"/>
            </normalization>
          </PointSource>
"""
    med = """\
          <GeometricMedium velocityMagnitude="0 km/s">
            <geometry type="Geometry">
              <VoronoiMeshGeometry filename="vsites.txt" minX="-2 pc" maxX="2 pc" minY="-2 pc" maxY="2 pc" minZ="-2 pc" maxZ="2 pc" massType="MassDensity"/>
            </geometry>
            <materialMix type="MaterialMix">
              <TrivialGasMix absorptionCrossSection="1e-26 m2" scatteringCrossSection="1e-26 m2" asymmetryParameter="0.0"/>
            </materialMix>
            <normalization type="MaterialNormalization">
              <OpticalDepthMaterialNormalization axis="Z" wavelength="0.55 micron" opticalDepth="0.5"/>
            </normalization>
          </GeometricMedium>
"""
    ski = _write(d, "vg.ski", _SKI_TMPL.format(SOURCE=src, MEDIUM=med))
    sim = load_ski(ski, num_packets=1024, batch_size=1024, max_events=4)
    sim.seed = 0
    rf, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0
    # density parity: grid-cell densities correlate with the snapshot's
    # nearest-site densities (quadrature smears cell boundaries)
    nd = np.asarray(sim.medium.nd[:, 0])
    centers = np.asarray(sim.grid.cell_centers())
    from scipy.spatial import cKDTree
    _, owner = cKDTree(sites * PC).query(centers)
    expect = rho[owner]
    m = nd > 0
    assert np.corrcoef(nd[m], expect[m])[0, 1] > 0.85


def test_ski_voronoi_mesh_source(tmp_path):
    """VoronoiMeshSource: per-cell SED-family entities launching from
    within their Voronoi cells (round-5 verdict missing #2)."""
    from skirt9_tpu.config.ski import load_ski

    d = str(tmp_path)
    rs = np.random.default_rng(13)
    sites = rs.uniform(-1.5, 1.5, size=(24, 3))
    R_km = rs.uniform(5e5, 2e6, size=24)
    T = rs.uniform(4000.0, 9000.0, size=24)
    rows = "\n".join(f"{s[0]} {s[1]} {s[2]} {r} {t}"
                     for s, r, t in zip(sites, R_km, T))
    _write(d, "vsrc.txt", "# x y z R T (pc, km, K)\n" + rows + "\n")
    src = """\
          <VoronoiMeshSource filename="vsrc.txt" minX="-2 pc" maxX="2 pc" minY="-2 pc" maxY="2 pc" minZ="-2 pc" maxZ="2 pc" importVelocity="false" sourceWeight="1" wavelengthBias="0.5">
            <sedFamily type="SEDFamily"><BlackBodySEDFamily/></sedFamily>
          </VoronoiMeshSource>
"""
    ski = _write(d, "vs.ski", _SKI_TMPL.format(SOURCE=src,
                                               MEDIUM=_TRIVIAL_MEDIUM))
    sim = load_ski(ski, num_packets=2048, batch_size=2048, max_events=4)
    sim.seed = 0
    rf, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0
    # luminosity parity: band-limited blackbody integral over the source
    # range (the family normalizes over [0.4, 0.8] um, not bolometric)
    h, c_, kB = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    lam = np.linspace(0.4e-6, 0.8e-6, 2001)
    B = (2 * h * c_ ** 2 / lam[None] ** 5
         / np.expm1(h * c_ / (lam[None] * kB * T[:, None])))
    L_exp = float(np.sum(4 * np.pi ** 2 * (R_km * 1e3) ** 2
                         * np.trapezoid(B, lam, axis=-1)))
    assert abs(sim.sources[0].luminosity / L_exp - 1) < 0.1
    # launch-position parity: source samples live in their own cells
    src_obj = sim.sources[0]
    tabs = {k: v for k, v in src_obj.tables().items()}
    out = src_obj.launch(tabs, _keys(2048), 2048)
    xs = np.asarray(out["pos"])
    from scipy.spatial import cKDTree
    _, owner = cKDTree(sites * PC).query(xs)
    # owners should span many cells, weighted by entity luminosity
    assert len(np.unique(owner)) > 12


def test_ski_adaptive_mesh_source(tmp_path):
    """AdaptiveMeshSource: AMR leaf cells as SED-family entities."""
    from skirt9_tpu.config.ski import load_ski

    d = str(tmp_path)
    # 2 leaves: R[km] T[K] per leaf
    _write(d, "asrc.txt", "! 2 1 1\n7e5 6000\n7e5 4000\n")
    src = """\
          <AdaptiveMeshSource filename="asrc.txt" minX="-2 pc" maxX="2 pc" minY="-2 pc" maxY="2 pc" minZ="-2 pc" maxZ="2 pc" importVelocity="false" sourceWeight="1" wavelengthBias="0.5">
            <sedFamily type="SEDFamily"><BlackBodySEDFamily/></sedFamily>
          </AdaptiveMeshSource>
"""
    ski = _write(d, "as.ski", _SKI_TMPL.format(SOURCE=src,
                                               MEDIUM=_TRIVIAL_MEDIUM))
    sim = load_ski(ski, num_packets=1024, batch_size=1024, max_events=4)
    sim.seed = 0
    rf, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0
    out = sim.sources[0].launch(sim.sources[0].tables(), _keys(2048), 2048)
    xs = np.asarray(out["pos"])
    assert np.all(np.abs(xs) <= 2 * PC * (1 + 1e-5))
    # the hotter left leaf carries most of the luminosity
    left = np.mean(xs[:, 0] < 0)
    assert left > 0.6
