"""Dynamic medium state recipes + primary-emission iterations.

(ref: DynamicStateRecipe.hpp:67, ClearDensityRecipe.cpp:20-35,
LinearDustDestructionRecipe.cpp:21-31, MonteCarloSimulation.cpp:266)
"""

import numpy as np
import pytest

from skirt9_tpu.media import dynamic as dyn

PC = 3.0857e16


def make_sim(recipes, nd_scale=1.0, num_packets=20_000):
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    R, box = PC, 1.2 * PC
    sigma = 1e-24
    grid = make_cartesian(((-box, box),) * 3, (12,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    r = np.linalg.norm(centers, axis=-1)
    nd = np.where(r <= R, nd_scale / (sigma * R), 0.0).astype(np.float32)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           np.array([[sigma, sigma]]),
                           np.full((1, 2), 0.4), np.full((1, 2), 0.3))
    inst = dinst.DistantInstrumentCfg(name="i",
                                      wave_borders=(0.5e-6, 0.6e-6),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=40, max_events=10)
    L = 100 * 3.846e26  # strong source -> nontrivial field strengths
    return Simulation(grid=grid, medium=med,
                      sources=[PointSource(luminosity=L, lam0=0.55e-6)],
                      instruments=[inst], options=opts,
                      rf_borders=np.array([0.45e-6, 0.65e-6]),
                      num_packets=num_packets, batch_size=1 << 13, seed=5,
                      dynamic_recipes=recipes, iterate_primary=True,
                      max_primary_iterations=6)


def test_field_strength_scaling():
    """U scales linearly with the raw rf table and inversely with volume."""
    rf = np.ones((4, 3))
    vols = np.full(4, 2.0)
    U = dyn.field_strength(rf, vols, rf_scale=dyn.JTOT_MW * 8 * np.pi)
    np.testing.assert_allclose(U, 3.0, rtol=1e-12)


def test_clear_density_recipe_clears_inner_cells():
    sim = make_sim([dyn.ClearDensityRecipe(field_strength_threshold=1.0)])
    grid = sim.grid
    nd0 = np.asarray(sim.medium.nd, np.float64).copy()
    # pick a threshold that clears SOME cells: compute U after one primary
    rf, _ = sim.run_primary(verbose=False)
    U = dyn.field_strength(rf, grid.volumes(), sim.rf_scale)
    has = nd0.sum(axis=1) > 0
    assert U[has].max() > 1.0 > U[has].min(), \
        "test geometry should straddle the threshold"

    info = sim.run_primary_iterations(verbose=False)
    assert info["iterations"] >= 1
    assert info["converged"]
    nd1 = np.asarray(sim.medium.nd, np.float64)
    cleared = has & (nd1.sum(axis=1) == 0)
    kept = has & (nd1.sum(axis=1) > 0)
    assert cleared.sum() > 0 and kept.sum() > 0
    # cleared cells are the high-field (inner) ones
    centers = np.asarray(grid.cell_centers(), np.float64)
    r = np.linalg.norm(centers, axis=-1)
    assert r[cleared].mean() < r[kept].mean()


def test_clear_density_no_recipes_noop():
    sim = make_sim([])
    sim.iterate_primary = False
    info = sim.run_primary_iterations(verbose=False)
    assert info == {"iterations": 0, "converged": True}


def _mini_grain_tables():
    from skirt9_tpu.media import grains as gr
    pops = [gr.GrainPopulation(composition=gr.silicate_composition(),
                               sizes=gr.power_law_sizes(), num_bins=3,
                               mass_per_h=1e-29),
            gr.GrainPopulation(composition=gr.graphite_composition(),
                               sizes=gr.power_law_sizes(), num_bins=3,
                               mass_per_h=5e-30)]
    return gr.build_multi_grain(pops)


def test_destruction_fraction_profile():
    """f = 1 below Tmin, 0 above Tmax, linear between; graphite bins use
    the graphite thresholds."""
    mg = _mini_grain_tables()
    N = 7
    nd = np.ones((N, 1))
    nd0 = nd.copy()
    # synthetic radiation fields spanning weak -> extreme
    vols = np.ones(N)
    rf = np.geomspace(1e-22, 1e2, N)[:, None]
    probe = dyn.LinearDustDestructionRecipe(
        grain_tables=mg, rf_borders=np.array([0.4e-6, 0.6e-6]), component=0)
    assert probe._graphite.sum() == 3 and (~probe._graphite).sum() == 3
    T = probe.bin_temperatures(rf, vols, 1e20)
    # temperatures increase with field strength
    assert np.all(np.diff(T, axis=0) >= -1e-9)
    # pick thresholds straddled by the synthetic temperature range
    Tmin = float(np.quantile(T, 0.3))
    Tmax = float(np.quantile(T, 0.7))
    rec = dyn.LinearDustDestructionRecipe(
        grain_tables=mg, rf_borders=np.array([0.4e-6, 0.6e-6]),
        component=0, min_silicate_temperature=Tmin,
        max_silicate_temperature=Tmax, min_graphite_temperature=Tmin,
        max_graphite_temperature=Tmax)
    ctx = {"nd0": nd0}
    res = rec.update(nd, rf, vols, rf_scale=1e20, context=ctx)
    f = res.nd[:, 0]
    # monotone non-increasing with field strength; cold cells keep all
    # dust, the hottest cell loses everything
    assert f[0] == pytest.approx(1.0)
    assert np.all(np.diff(f) <= 1e-12)
    assert f[-1] == pytest.approx(0.0, abs=1e-12)


def test_destruction_converges_in_sim():
    mg = _mini_grain_tables()
    rec = dyn.LinearDustDestructionRecipe(
        grain_tables=mg, rf_borders=np.array([0.45e-6, 0.65e-6]),
        component=0, min_silicate_temperature=30.0,
        max_silicate_temperature=60.0, min_graphite_temperature=30.0,
        max_graphite_temperature=60.0)
    sim = make_sim([rec])
    nd0 = np.asarray(sim.medium.nd, np.float64).copy()
    info = sim.run_primary_iterations(verbose=False)
    assert info["converged"]
    nd1 = np.asarray(sim.medium.nd, np.float64)
    has = nd0[:, 0] > 0
    # some destruction happened but distant cells survive
    assert (nd1[has, 0] < nd0[has, 0] - 1e-12).any()
    assert nd1[has, 0].max() > 0


def test_ski_dynamic_state_parsing(tmp_path):
    """A ski file with dynamicStateOptions + iteratePrimaryEmission."""
    ski = """<?xml version="1.0"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
 <MonteCarloSimulation userLevel="Regular" simulationMode="ExtinctionOnly"
     iteratePrimaryEmission="true" numPackets="1000">
  <random type="Random"><Random seed="0"/></random>
  <units type="Units"><SIUnits/></units>
  <sourceSystem type="SourceSystem">
   <SourceSystem minWavelength="0.4 micron" maxWavelength="0.7 micron"
       wavelengths="0.55 micron" sourceBias="0.5">
    <sources type="Source">
     <PointSource positionX="0 m" positionY="0 m" positionZ="0 m">
      <sed type="SED"><BlackBodySED temperature="5000 K"/></sed>
      <normalization type="LuminosityNormalization">
       <IntegratedLuminosityNormalization wavelengthRange="Source"
           integratedLuminosity="100 Lsun"/>
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
       <LogWavelengthGrid minWavelength="0.4 micron"
           maxWavelength="0.7 micron" numWavelengths="3"/>
      </radiationFieldWLG>
     </RadiationFieldOptions>
    </radiationFieldOptions>
    <dynamicStateOptions type="DynamicStateOptions">
     <DynamicStateOptions hasDynamicState="true">
      <recipes type="DynamicStateRecipe">
       <ClearDensityRecipe fieldStrengthThreshold="10"/>
      </recipes>
     </DynamicStateOptions>
    </dynamicStateOptions>
    <iterationOptions type="IterationOptions">
     <IterationOptions minPrimaryIterations="2" maxPrimaryIterations="5"/>
    </iterationOptions>
    <media type="Medium">
     <GeometricMedium velocityMagnitude="0 m/s">
      <geometry type="Geometry">
       <UniformSphereGeometry maxRadius="1 pc"/>
      </geometry>
      <materialMix type="MaterialMix">
       <MeanInterstellarDustMix/>
      </materialMix>
      <normalization type="MaterialNormalization">
       <OpticalDepthMaterialNormalization axis="Z" wavelength="0.55 micron"
           opticalDepth="1"/>
      </normalization>
     </GeometricMedium>
    </media>
    <grid type="SpatialGrid">
     <CartesianSpatialGrid minX="-1.2 pc" maxX="1.2 pc" minY="-1.2 pc"
         maxY="1.2 pc" minZ="-1.2 pc" maxZ="1.2 pc">
      <meshX type="Mesh"><LinMesh numBins="8"/></meshX>
      <meshY type="Mesh"><LinMesh numBins="8"/></meshY>
      <meshZ type="Mesh"><LinMesh numBins="8"/></meshZ>
     </CartesianSpatialGrid>
    </grid>
   </MediumSystem>
  </mediumSystem>
  <instrumentSystem type="InstrumentSystem"><InstrumentSystem/>
  </instrumentSystem>
  <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
 </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""
    p = tmp_path / "dyn.ski"
    p.write_text(ski)
    from skirt9_tpu.config.ski import load_ski
    sim = load_ski(str(p), num_packets=2000, batch_size=1024)
    assert sim.iterate_primary
    assert len(sim.dynamic_recipes) == 1
    assert sim.min_primary_iterations == 2
    assert sim.max_primary_iterations == 5
    rec = sim.dynamic_recipes[0]
    assert isinstance(rec, dyn.ClearDensityRecipe)
    assert rec.field_strength_threshold == 10.0
    info = sim.run_primary_iterations(verbose=False)
    assert info["iterations"] >= 2


def test_merged_iterations_match_plain_emission():
    """Without dynamic recipes, merged iterations converge to the same
    dust-emission answer as the standard self-absorption flow
    (ref: MonteCarloSimulation.cpp:407)."""
    import jax
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    def build(include_primary):
        box = PC
        grid = make_cartesian(((-box, box),) * 3, (8,) * 3)
        sigma = 1e-24
        nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.8 * PC)
        lam_t = np.geomspace(0.05e-6, 1000e-6, 40)
        med = msys.make_medium(grid, nd, lam_t,
                               sigma_ext=np.full((1, 40), sigma),
                               albedo=np.zeros((1, 40)), g=np.zeros((1, 40)))
        inst = dinst.DistantInstrumentCfg(
            name="i0", wave_borders=tuple(np.geomspace(0.3e-6, 1000e-6, 9)),
            distance=100 * PC)
        opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8)
        return Simulation(
            grid=grid, medium=med,
            sources=[PointSource(luminosity=100 * 3.839e26, lam0=0.55e-6)],
            instruments=[inst], options=opts,
            rf_borders=np.geomspace(0.05e-6, 10e-6, 9),
            ems_borders=np.geomspace(1e-6, 1000e-6, 25),
            num_packets=4096, batch_size=2048, seed=1,
            iterate_secondary=True, include_primary=include_primary,
            max_iterations=4)

    s0 = build(False)
    _, accs0, info0 = s0.run_with_dust_emission(verbose=False)
    s1 = build(True)
    rf1, accs1, info1 = s1.run_with_dust_emission(verbose=False)
    assert info1["iterations"] >= 1
    assert info1["L_dust"] == pytest.approx(info0["L_dust"], rel=0.05)
    sed0 = dinst.calibrate_sed(s0.instruments[0], jax.device_get(accs0[0]))
    sed1 = dinst.calibrate_sed(s1.instruments[0], jax.device_get(accs1[0]))
    a, b = np.asarray(sed0["total"]), np.asarray(sed1["total"])
    sel = a > a.max() * 1e-4
    np.testing.assert_allclose(b[sel], a[sel], rtol=0.25)


def test_merged_iterations_with_destruction():
    """Dust destruction inside merged iterations reduces the dust mass and
    converges."""
    mg = _mini_grain_tables()
    rec = dyn.LinearDustDestructionRecipe(
        grain_tables=mg, rf_borders=np.array([0.45e-6, 0.65e-6]),
        component=0, min_silicate_temperature=30.0,
        max_silicate_temperature=60.0, min_graphite_temperature=30.0,
        max_graphite_temperature=60.0)
    sim = make_sim([rec])
    sim.iterate_secondary = True
    sim.include_primary = True
    sim.max_iterations = 4
    sim.ems_borders = np.geomspace(1e-6, 1000e-6, 17)
    nd0 = np.asarray(sim.medium.nd, np.float64).copy()
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    nd1 = np.asarray(sim.medium.nd, np.float64)
    has = nd0[:, 0] > 0
    assert (nd1[has, 0] < nd0[has, 0] - 1e-12).any()
    assert info["L_dust"] >= 0
