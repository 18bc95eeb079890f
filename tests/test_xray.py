"""X-ray atomic gas: Verner photo-absorption, fluorescence, KN scattering.

(ref: XRayAtomicGasMix.hpp:288, Verner et al. 1996 analytic fits)
"""

import numpy as np
import pytest

from skirt9_tpu.media import xray as xr


def test_verner_hydrogen_threshold():
    """Published H I threshold cross section: 6.30 Mb at 13.6 eV."""
    p = xr.BUILTIN_SHELLS[0]
    sig = xr.verner_sigma(np.array([13.5984]), p)[0]
    assert sig == pytest.approx(6.30e-22, rel=0.01)
    # below threshold: zero
    assert xr.verner_sigma(np.array([13.0]), p)[0] == 0.0
    # near-threshold scaling ~ E^-3
    r = xr.verner_sigma(np.array([27.2]), p)[0] / sig
    assert r == pytest.approx(0.125, rel=0.25)


def test_verner_helium_threshold():
    """Published He I threshold cross section: 7.40 Mb at 24.59 eV."""
    p = xr.BUILTIN_SHELLS[1]
    sig = xr.verner_sigma(np.array([24.5874]), p)[0]
    assert sig == pytest.approx(7.40e-22, rel=0.01)


def test_pa_file_roundtrip(tmp_path):
    f = tmp_path / "XRay_PA.txt"
    rows = [[s.Z, s.n, s.l, s.Eth, s.Emax, s.E0, s.sigma0, s.ya, s.P,
             s.yw, s.y0, s.y1] for s in xr.BUILTIN_SHELLS]
    np.savetxt(f, rows)
    shells = xr.load_pa_file(str(f))
    assert len(shells) == 2
    sig = xr.verner_sigma(np.array([13.5984]), shells[0])[0]
    assert sig == pytest.approx(6.30e-22, rel=0.01)


def test_tables_combine_abundances_and_kn():
    lam = np.geomspace(2e-11, 5e-7, 256)
    ab = np.zeros(30)
    ab[0] = 1.0    # H only
    t_h = xr.build_xray_tables(lam, abundances=ab, scatter="None")
    ab2 = ab.copy()
    ab2[1] = 0.1   # add He
    t_he = xr.build_xray_tables(lam, abundances=ab2, scatter="None")
    E = xr.HC_EV / lam
    m = (E > 24.6) & (E < 5e4)
    assert (t_he.sigma_abs[m] > t_h.sigma_abs[m]).all()
    # KN scattering approaches Thomson at low energy, per electron count
    t_kn = xr.build_xray_tables(lam, abundances=ab2, scatter="Free")
    i = np.argmax(lam)  # lowest energy
    n_e = 1.0 + 0.1 * 2
    assert t_kn.sigma_sca[i] == pytest.approx(n_e * xr.SIGMA_T, rel=0.01)
    # and falls below Thomson at ~60 keV (KN total ~ 0.81 sigma_T there)
    j = np.argmin(lam)
    assert t_kn.sigma_sca[j] == pytest.approx(0.815 * n_e * xr.SIGMA_T,
                                              rel=0.03)


def test_fluorescence_channel_sampling():
    """A synthetic K-shell + Kalpha line: the fluorescing fraction equals
    the yield, and sampled wavelengths land on the line."""
    lam = np.geomspace(2e-11, 5e-9, 128)
    shell = xr.ShellParams(26, 1, 0, 7112.0, 5e5, 500.0, 100.0, 10.0,
                           2.5, 0.0, 0.0, 0.0)
    line = xr.FluorescenceLine(26, 1, 0, 0.34, 6404.0)
    ab = np.zeros(30)
    ab[0] = 1.0
    ab[25] = 3.2e-5
    tabs = xr.build_xray_tables(lam, abundances=ab,
                                shells=xr.BUILTIN_SHELLS + [shell],
                                lines=[line], scatter="None")
    E = xr.HC_EV / lam
    m = E > 8000.0
    # above the edge the fluorescing fraction of Fe absorption = yield
    fe = ab[25] * xr.verner_sigma(E[m], shell)
    np.testing.assert_allclose(tabs.sigma_fluor[m], 0.34 * fe, rtol=1e-10)
    # sampling returns the Kalpha wavelength
    lam_in = np.full(16, xr.HC_EV / 9000.0)
    out = xr.sample_fluorescence(tabs, lam_in, np.random.rand(16))
    np.testing.assert_allclose(out, xr.HC_EV / 6404.0, rtol=1e-12)


def test_xray_ski_attenuation(tmp_path):
    """Oligochromatic X-ray demo: transmission through a uniform H+He
    sphere equals exp(-N sigma(E)) at the source energy."""
    E_keV = 0.03  # 30 eV: H+He both absorb
    lam_um = xr.HC_EV / (E_keV * 1e3) * 1e6
    ski = f"""<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation simulationMode="OligoExtinctionOnly" numPackets="2e4">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits/></units>
    <sourceSystem type="SourceSystem">
      <SourceSystem wavelengths="{lam_um:.8e} micron" sourceBias="0.5">
        <sources type="Source">
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc">
            <sed type="SED"><BlackBodySED temperature="1e6 K"/></sed>
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
              <XRayAtomicGasMix abundancies="1,0.1,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0" temperature="1e4 K" scatterBoundElectrons="Free"/>
            </materialMix>
            <normalization type="MaterialNormalization">
              <NumberMaterialNormalization number="1e55"/>
            </normalization>
          </GeometricMedium>
        </media>
        <grid type="SpatialGrid">
          <CartesianSpatialGrid minX="-1.2 pc" maxX="1.2 pc" minY="-1.2 pc" maxY="1.2 pc" minZ="-1.2 pc" maxZ="1.2 pc">
            <meshX type="Mesh"><LinMesh numBins="24"/></meshX>
            <meshY type="Mesh"><LinMesh numBins="24"/></meshY>
            <meshZ type="Mesh"><LinMesh numBins="24"/></meshZ>
          </CartesianSpatialGrid>
        </grid>
      </MediumSystem>
    </mediumSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="i0" distance="100 pc" inclination="0 deg" azimuth="0 deg" roll="0 deg" radius="0 pc"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""
    p = tmp_path / "x.ski"
    p.write_text(ski)
    import jax
    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.instruments import distant as dinst
    sim = load_ski(str(p), num_packets=20000)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(sim.instruments[0], jax.device_get(accs[0]))
    att = sed["primarydirect"][0] / sed["transparent"][0]
    # expected: tau = (N / (4/3 pi R^3)) * sigma_ext(E) * R (central chord
    # = R from center to edge for the observer direction)
    PC = 3.0857e16
    mix = None
    for _, m, _ in [(None, None, None)]:
        pass
    lam_g = np.geomspace(2e-11, 5e-7, 512)
    ab = np.zeros(30)
    ab[0], ab[1] = 1.0, 0.1
    tabs = xr.build_xray_tables(lam_g, abundances=ab, scatter="Free")
    sig = np.interp(xr.HC_EV / 30.0, lam_g, tabs.sigma_ext)
    nd = 1e55 / (4.0 / 3.0 * np.pi * PC ** 3)
    tau = nd * sig * PC
    assert 0.3 < tau < 5.0  # configuration sanity
    assert att == pytest.approx(np.exp(-tau), rel=0.1)
