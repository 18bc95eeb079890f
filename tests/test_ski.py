"""ski-file importer: parse a SKIRT 9 parameter file and run it."""

import textwrap

import numpy as np
import pytest

from skirt9_tpu.config.ski import load_ski

SKI = textwrap.dedent("""\
    <?xml version='1.0' encoding='UTF-8'?>
    <skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
      <MonteCarloSimulation userLevel="Regular" simulationMode="ExtinctionOnly" numPackets="2000">
        <random type="Random"><Random seed="0"/></random>
        <units type="Units"><ExtragalacticUnits/></units>
        <sourceSystem type="SourceSystem">
          <SourceSystem minWavelength="0.1 micron" maxWavelength="10 micron" sourceBias="0.5">
            <sources type="Source">
              <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc" sourceWeight="1" wavelengthBias="0.5">
                <sed type="SED"><BlackBodySED temperature="5000"/></sed>
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
                  <ShellGeometry minRadius="0.1 pc" maxRadius="1 pc" exponent="0"/>
                </geometry>
                <materialMix type="MaterialMix">
                  <MeanIvezicBenchmarkDustMix/>
                </materialMix>
                <normalization type="MaterialNormalization">
                  <OpticalDepthMaterialNormalization axis="Z" wavelength="0.55 micron" opticalDepth="1.0"/>
                </normalization>
              </GeometricMedium>
            </media>
            <grid type="SpatialGrid">
              <CartesianSpatialGrid minX="-1.2 pc" maxX="1.2 pc" minY="-1.2 pc" maxY="1.2 pc" minZ="-1.2 pc" maxZ="1.2 pc">
                <meshX type="Mesh"><LinMesh numBins="12"/></meshX>
                <meshY type="Mesh"><LinMesh numBins="12"/></meshY>
                <meshZ type="Mesh"><LinMesh numBins="12"/></meshZ>
              </CartesianSpatialGrid>
            </grid>
          </MediumSystem>
        </mediumSystem>
        <instrumentSystem type="InstrumentSystem">
          <InstrumentSystem>
            <defaultWavelengthGrid type="WavelengthGrid">
              <LogWavelengthGrid minWavelength="0.1 micron" maxWavelength="10 micron" numWavelengths="10"/>
            </defaultWavelengthGrid>
            <instruments type="Instrument">
              <SEDInstrument instrumentName="sed0" distance="10 Mpc" inclination="0 deg" azimuth="0 deg" roll="0 deg"/>
            </instruments>
          </InstrumentSystem>
        </instrumentSystem>
      </MonteCarloSimulation>
    </skirt-simulation-hierarchy>
""")


def test_load_and_run_ski(tmp_path):
    p = tmp_path / "model.ski"
    p.write_text(SKI)
    sim = load_ski(str(p), batch_size=1024, max_events=8)
    assert sim.num_packets == 2000
    assert len(sim.sources) == 1
    assert len(sim.instruments) == 1
    assert sim.instruments[0].name == "sed0"
    assert sim.instruments[0].nbins == 10
    # medium got normalized to tau=1 along z at 0.55um: verify column
    nd = np.asarray(sim.medium.nd, np.float64)[:, 0]
    # run a few packets end to end
    rf, accs = sim.run_primary(verbose=False)
    import jax
    from skirt9_tpu.instruments import distant as dinst
    sed = dinst.calibrate_sed(sim.instruments[0], jax.device_get(accs[0]))
    assert sed["total"].sum() > 0
    # optical-depth normalization is along the FULL axis (ref:
    # AxisMaterialNormalization::geometryColumnDensity -> Geometry::SigmaZ);
    # the observer at +z sees the one-sided (discretized) column
    import jax.numpy as jnp
    PC = 3.0857e16
    se = np.asarray(sim.medium.sigma_ext[0], np.float64)
    lam_t = np.asarray(sim.medium.lam_t, np.float64)
    s055 = np.exp(np.interp(np.log(0.55e-6), np.log(lam_t), np.log(se)))
    zs = np.linspace(1e10, 1.19 * PC, 20000)
    pos = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1)
    cells = np.asarray(sim.grid.locate(jnp.asarray(pos, jnp.float32)))
    kz = np.where(cells >= 0, nd[np.maximum(cells, 0)] * s055, 0.0)
    tau_obs = np.trapezoid(kz, zs)
    assert tau_obs == pytest.approx(0.5, rel=0.15)  # half of full-axis tau=1
    b = np.argmin(np.abs(sed["wavelength"] - 0.55e-6))
    with np.errstate(invalid="ignore", divide="ignore"):
        att = sed["primarydirect"][b] / sed["transparent"][b]
    assert att == pytest.approx(np.exp(-tau_obs), rel=5e-3)


def test_ski_missing_type_raises(tmp_path):
    bad = SKI.replace("ShellGeometry", "FancyUnknownGeometry")
    p = tmp_path / "bad.ski"
    p.write_text(bad)
    with pytest.raises(NotImplementedError):
        load_ski(str(p))
