"""DiffuseIonizedGasMix mechanism (ref: DiffuseIonizedGasMix.hpp:153):
5-bin ionizing-RF characterization, table/fixed temperature, inline H
ionization balance, nebular gas emission (media/dig.py)."""

import os
import textwrap

import numpy as np

from skirt9_tpu.media import dig

PC = 3.0857e16


def test_characterize_and_balance():
    # one cell, J_lambda flat over the ionizing range
    rb = np.array([10e-9, 50e-9, 91.2e-9, 200e-9])
    vol = np.array([1.0e48])  # m^3
    rf_scale = 1.0
    J = 1e-9  # W/m^2/sr/m
    dlam = np.diff(rb)
    rf = (J * 4 * np.pi * vol[:, None] * dlam[None, :])
    n_g, Gamma, R = dig.characterize_rf(rf, rb, vol, rf_scale)
    # photon density: 4 pi J / (h c / lam) integrated over 1-6 Ryd, / c
    lam_e = dig.RYD_LAM / np.array([1.0, 1.8, 2.58, 3.52, 4.0, 6.0])
    lam_c = np.sqrt(lam_e[:-1] * lam_e[1:])
    width = lam_e[:-1] - lam_e[1:]
    nphot = 4 * np.pi * J * width * lam_c / (dig.H_PLANCK * dig.C_LIGHT)
    np.testing.assert_allclose(n_g[0], nphot.sum() / dig.C_LIGHT, rtol=1e-6)
    assert Gamma[0] > 0
    assert R.shape == (1, 4) and np.all(R[0] > 0)

    # balance limits: strong field -> fully ionized; none -> neutral
    x_hi = dig.ionization_balance(np.array([1e-3]), np.array([1e6]),
                                  np.array([1e4]))
    x_lo = dig.ionization_balance(np.array([0.0]), np.array([1e6]),
                                  np.array([1e4]))
    assert x_hi[0] > 0.999 and x_lo[0] == 0.0
    # equilibrium identity: Gamma (1-x) = alpha_B x^2 nH
    G, nH, T = 1e-12, np.array([1e8]), np.array([8e3])
    x = dig.ionization_balance(np.array([G]), nH, T)
    lhs = G * (1 - x[0])
    rhs = dig.alpha_B(T)[0] * (x[0] ** 2) * nH[0]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6)


def test_dig_recipe_temperature_table_and_convergence():
    rb = np.array([10e-9, 91.2e-9, 200e-9])
    nH = np.array([1e8, 1e8])
    r = dig.DIGRecipe(nH=nH, Z=np.full(2, 0.02), rf_borders=rb,
                      T_logU=(np.array([-6.0, 0.0]),
                              np.array([5e3, 15e3])))
    vol = np.full(2, 1.0)
    # scale rf to land logU at -3 and -1 (n_gamma is linear in rf)
    n_g0, _, _ = dig.characterize_rf(np.array([[1.0, 0.0]]), rb,
                                     np.ones(1), 1.0)
    rf = np.array([[1e-3 * 1e8 / n_g0[0], 0.0],
                   [1e-1 * 1e8 / n_g0[0], 0.0]])
    T, logU, x, ne = r.state(rf, vol, 1.0)
    np.testing.assert_allclose(logU, [-3.0, -1.0], atol=1e-6)
    assert T[1] > T[0]               # harder field -> hotter table entry
    assert x[1] > x[0]
    ctx = {}
    nd = np.zeros((2, 1))
    res1 = r.update(nd, rf, vol, 1.0, context=ctx)
    assert res1.n_not_converged == 2  # first pass: no previous state
    res2 = r.update(nd, rf, vol, 1.0, context=ctx)
    assert res2.n_not_converged == 0  # identical field -> converged


def test_dig_ski_end_to_end(tmp_path):
    """A hot star inside a DIG slab: the ski loads, the recipe attaches,
    and the gas emitter contributes Balmer-line luminosity."""
    from skirt9_tpu.config.ski import load_ski

    d = str(tmp_path)
    ski = os.path.join(d, "dig.ski")
    with open(ski, "w") as f:
        f.write(textwrap.dedent("""\
<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation userLevel="Expert" simulationMode="DustEmission" numPackets="4096">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits fluxOutputStyle="Wavelength"/></units>
    <cosmology type="Cosmology"><LocalUniverseCosmology/></cosmology>
    <sourceSystem type="SourceSystem">
      <SourceSystem minWavelength="0.02 micron" maxWavelength="0.09 micron" sourceBias="0.5">
        <sources type="Source">
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc" sourceWeight="1" wavelengthBias="0.5">
            <sed type="SED"><BlackBodySED temperature="45000 K"/></sed>
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
              <LogWavelengthGrid minWavelength="0.02 micron" maxWavelength="0.09 micron" numWavelengths="8"/>
            </radiationFieldWLG>
          </RadiationFieldOptions>
        </radiationFieldOptions>
        <dustEmissionOptions type="DustEmissionOptions">
          <DustEmissionOptions dustEmissionType="Equilibrium" maxFractionOfPrimary="0.01" maxFractionOfPrevious="0.03">
            <dustEmissionWLG type="DisjointWavelengthGrid">
              <LogWavelengthGrid minWavelength="0.3 micron" maxWavelength="1 micron" numWavelengths="64"/>
            </dustEmissionWLG>
          </DustEmissionOptions>
        </dustEmissionOptions>
        <media type="Medium">
          <GeometricMedium velocityMagnitude="0 km/s">
            <geometry type="Geometry">
              <UniformSphereGeometry maxRadius="0.5 pc"/>
            </geometry>
            <materialMix type="MaterialMix">
              <DiffuseIonizedGasMix defaultMetallicity="0.02" defaultTemperature="9000 K" useCloudyTemperature="false"/>
            </materialMix>
            <normalization type="MaterialNormalization">
              <NumberMaterialNormalization number="1e56"/>
            </normalization>
          </GeometricMedium>
        </media>
        <grid type="SpatialGrid">
          <CartesianSpatialGrid minX="-1 pc" maxX="1 pc" minY="-1 pc" maxY="1 pc" minZ="-1 pc" maxZ="1 pc">
            <meshX type="Mesh"><LinMesh numBins="6"/></meshX>
            <meshY type="Mesh"><LinMesh numBins="6"/></meshY>
            <meshZ type="Mesh"><LinMesh numBins="6"/></meshZ>
          </CartesianSpatialGrid>
        </grid>
      </MediumSystem>
    </mediumSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="100 pc" inclination="0 deg" azimuth="0 deg" roll="0 deg" radius="0 pc" recordComponents="true" numScatteringLevels="0" recordPolarization="false" recordStatistics="false">
            <wavelengthGrid type="WavelengthGrid">
              <LogWavelengthGrid minWavelength="0.3 micron" maxWavelength="1 micron" numWavelengths="64"/>
            </wavelengthGrid>
          </SEDInstrument>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""))
    sim = load_ski(ski, num_packets=4096, batch_size=4096, max_events=4)
    sim.seed = 0
    assert len(sim.gas_emitters) == 1
    assert len(sim.dynamic_recipes) == 1
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    assert info["L_gas0"] > 0          # the DIG emitted
    assert info["L_dust"] == 0         # no dust in this model
    # the recipe's state: cells near the star are ionized
    recipe = sim.dynamic_recipes[0]
    T, logU, x, ne = recipe.state(np.asarray(rf), sim.grid.volumes(),
                                  sim.rf_scale)
    assert x.max() > 0.5
    assert np.all(T == 9000.0)         # fixed-temperature mode
