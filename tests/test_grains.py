"""Multi-grain dust machinery + stochastic heating tests
(ref: MultiGrainDustMix.hpp:108, StochasticDustEmissionCalculator.hpp:87)."""

import numpy as np
import pytest

from skirt9_tpu.emission import stochastic
from skirt9_tpu.media import grains
from skirt9_tpu.ops import planck


def test_mie_rayleigh_limit():
    m = 1.5 + 0.01j
    x = 0.05
    qe, qs, g = grains.mie_q(m, np.array([x]))
    ray = 8.0 / 3.0 * x**4 * abs((m * m - 1) / (m * m + 2)) ** 2
    assert qs[0] == pytest.approx(ray, rel=0.02)
    assert abs(g[0]) < 0.01  # Rayleigh scattering is near-isotropic


def test_mie_known_values():
    # Bohren & Huffman classic: m=1.5, x=10 -> Qext = 2.8820
    qe, qs, g = grains.mie_q(1.5 + 0.0j, np.array([10.0]))
    assert qe[0] == pytest.approx(2.8820, abs=0.002)
    assert qs[0] == pytest.approx(qe[0])  # no absorption
    # geometric-optics limit: Qext -> 2
    qe2, _, _ = grains.mie_q(1.5 + 0.1j, np.array([300.0]))
    assert qe2[0] == pytest.approx(2.0, abs=0.15)


def test_mie_mixed_sizes_match_individual():
    # batching lanes with very different x must not cross-contaminate
    m = 1.7 + 0.05j
    xs = np.array([0.1, 1.0, 50.0])
    qe_b, qs_b, g_b = grains.mie_q(m, xs)
    for i, x in enumerate(xs):
        qe_i, qs_i, g_i = grains.mie_q(m, np.array([x]))
        assert qe_b[i] == pytest.approx(qe_i[0], rel=1e-10)
        assert g_b[i] == pytest.approx(g_i[0], rel=1e-8, abs=1e-10)


def test_size_distributions():
    sd = grains.power_law_sizes(5e-9, 250e-9, 3.5)
    a = np.geomspace(sd.a_min, sd.a_max, 50)
    v = sd.dnda(a)
    # slope check in log-log
    slope = np.polyfit(np.log(a), np.log(v), 1)[0]
    assert slope == pytest.approx(-3.5, abs=0.01)
    ln = grains.log_normal_sizes(5e-9, 1e-6, 100e-9, 0.4)
    av = np.geomspace(5e-9, 1e-6, 200)
    w = ln.dnda(av) * av
    peak = av[np.argmax(w)]
    assert peak == pytest.approx(100e-9, rel=0.1)


def test_multi_grain_mix_tables():
    mg = grains.mrn_mix(nbins=4)
    mix = mg.mix
    assert np.all(np.isfinite(mix.sigma_ext))
    assert np.all(mix.sigma_ext > 0)
    assert np.all((mix.albedo >= 0) & (mix.albedo <= 1))
    assert np.all(np.abs(mix.g) < 1)
    # extinction declines toward the far-IR
    i_v = np.argmin(abs(mix.lam - 0.55e-6))
    i_fir = np.argmin(abs(mix.lam - 300e-6))
    assert mix.sigma_ext[i_v] > 30 * mix.sigma_ext[i_fir]
    # per-bin absorption sums to the total within scattering
    total_abs = mg.sigma_abs_bin.sum(axis=0)
    assert np.allclose(total_abs, mix.sigma_abs, rtol=1e-6)
    # sensible MW-like kappa_V per unit dust mass: O(10^3..10^4) m^2/kg
    kappa_v = mix.sigma_ext[i_v] / mix.mu
    assert 500 < kappa_v < 5e4


def test_enthalpy_monotone_and_dulong_petit():
    natoms = 1e4
    T = np.geomspace(2.0, 2000.0, 64)
    for fn in (grains.enthalpy_graphite, grains.enthalpy_silicate):
        U = fn(T, natoms)
        assert np.all(np.diff(U) > 0)
        # high-T specific heat approaches the Dulong-Petit 3Nk within 50%
        C = (U[-1] - U[-2]) / (T[-1] - T[-2])
        assert 0.3 < C / (3 * natoms * 1.380649e-23) < 1.1


def _isrf(rf_c, scale):
    shape = planck.b_lambda_np(rf_c, 6000.0) / planck.b_lambda_np(0.55e-6, 6000.0)
    return scale * shape


def test_stochastic_distribution_physics():
    mg = grains.mrn_mix(nbins=4)
    rfb = np.geomspace(0.09e-6, 10e-6, 25)
    emb = np.geomspace(1e-6, 1000e-6, 41)
    tabs = stochastic.build_stochastic_tables(mg, rfb, emb, nT=30)
    rf_c = np.sqrt(rfb[1:] * rfb[:-1])
    u = np.tile(_isrf(rf_c, 1e-6), (2, 1))
    # small grains: broad P(T); large grains: near-delta (equilibrium)
    P_small = stochastic.state_distribution(tabs, 0, u)
    P_big = stochastic.state_distribution(tabs, 3, u)
    assert np.allclose(P_small.sum(1), 1.0)
    assert np.allclose(P_big.sum(1), 1.0)
    occ_small = (P_small[0] > 1e-6).sum()
    occ_big = (P_big[0] > 1e-6).sum()
    assert occ_small > occ_big
    assert occ_small >= 5


def test_stochastic_spectra_scale_with_field():
    mg = grains.mrn_mix(nbins=3)
    rfb = np.geomspace(0.09e-6, 10e-6, 21)
    emb = np.geomspace(1e-6, 1000e-6, 31)
    tabs = stochastic.build_stochastic_tables(mg, rfb, emb, nT=24)
    rf_c = np.sqrt(rfb[1:] * rfb[:-1])
    nd = np.ones(2)
    eps_lo = stochastic.cell_emission_spectra(tabs, nd,
                                              np.tile(_isrf(rf_c, 1e-7), (2, 1)))
    eps_hi = stochastic.cell_emission_spectra(tabs, nd,
                                              np.tile(_isrf(rf_c, 1e-4), (2, 1)))
    assert np.all(np.isfinite(eps_lo)) and np.all(np.isfinite(eps_hi))
    # stronger field -> more emitted power and a bluer peak
    assert eps_hi.sum() > 100 * eps_lo.sum()
    lam_pk_lo = tabs.lam_ems[np.argmax(eps_lo[0])]
    lam_pk_hi = tabs.lam_ems[np.argmax(eps_hi[0])]
    assert lam_pk_hi < lam_pk_lo


def test_stochastic_energy_balance():
    """Emitted power must equal absorbed power (detailed balance of the
    transition matrix, within discretization error)."""
    mg = grains.mrn_mix(nbins=3)
    rfb = np.geomspace(0.05e-6, 20e-6, 41)
    emb = np.geomspace(0.2e-6, 2000e-6, 121)
    tabs = stochastic.build_stochastic_tables(mg, rfb, emb, nT=48)
    rf_c = np.sqrt(rfb[1:] * rfb[:-1])
    u = np.tile(_isrf(rf_c, 1e-5), (1, 1))
    eps = stochastic.cell_emission_spectra(tabs, np.ones(1), u)
    P_em = np.trapezoid(eps[0], tabs.lam_ems)
    # absorbed power per H: sum_b int sigma_abs_b c u dlam
    C = 2.99792458e8
    dl = np.diff(rfb)
    sab = np.stack([np.exp(np.interp(np.log(rf_c), np.log(mg.lam),
                                     np.log(np.maximum(mg.sigma_abs_bin[b],
                                                       1e-300))))
                    for b in range(mg.sigma_abs_bin.shape[0])]).sum(0)
    P_abs = float(np.sum(sab * C * u[0] * dl))
    assert P_em == pytest.approx(P_abs, rel=0.35)


def test_ski_multigrain_mix():
    from skirt9_tpu.config import ski
    import xml.etree.ElementTree as ET
    el = ET.fromstring("<MRNDustMix/>")
    mix = ski.build_mix(el)
    assert ski.multigrain_for(mix) is not None
    assert np.all(np.isfinite(mix.sigma_ext))


def test_stochastic_emission_end_to_end():
    """Full loop with dust_emission_type='Stochastic' on an MRN multi-grain
    medium: secondary flux reaches the instrument, energy stays consistent
    (ref: DustEmissionOptions dustEmissionType Stochastic)."""
    import jax
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    mg = grains.mrn_mix(nbins=3)
    mix = mg.mix
    grid = make_cartesian(((-PC, PC),) * 3, (6,) * 3)
    i_v = np.argmin(abs(mix.lam - 0.55e-6))
    nd = msys.uniform_density_sphere(grid, 1.0, float(mix.sigma_ext[i_v]),
                                     0.8 * PC)
    med = msys.make_medium(grid, nd, mix.lam, mix.sigma_ext[None, :],
                           mix.albedo[None, :], mix.g[None, :])
    rfb = np.geomspace(0.05e-6, 10e-6, 9)
    emsb = np.geomspace(1e-6, 1000e-6, 25)
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=tuple(np.geomspace(0.3e-6, 1000e-6, 17)),
        distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8)
    L_star = 100.0 * 3.839e26
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=L_star, lam0=0.55e-6)],
                     instruments=[inst], options=opts,
                     rf_borders=rfb, ems_borders=emsb,
                     num_packets=4096, batch_size=2048, seed=1,
                     max_iterations=2,
                     dust_emission_type="Stochastic", grain_tables=mg)
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    assert 0.1 * L_star < info["L_dust"] < 0.95 * L_star
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    w = np.asarray(sed["wavelength"])
    sec_flux = np.asarray(sed["secondarydirect"])
    assert sec_flux.sum() > 0
    assert sec_flux[w < 1e-6].sum() == pytest.approx(0.0, abs=1e-30)


def test_mie_amplitudes_rayleigh_limit():
    """Tiny spheres reproduce the Rayleigh/dipole Mueller pattern and the
    optical theorem: Qsca x^2 = integral(|S1|^2+|S2|^2) sin t dt."""
    from skirt9_tpu.media.grains import mie_amplitudes, mie_q

    m = 1.5 + 0.01j
    theta = np.linspace(0, np.pi, 181)
    ct = np.cos(theta)
    S1, S2 = mie_amplitudes(m, np.array([0.05]), ct)
    # dipole: S1 ~ const, S2 ~ S1 * cos(theta)
    np.testing.assert_allclose(np.abs(S1[0]) / np.abs(S1[0, 0]),
                               np.ones_like(ct), rtol=5e-3)
    np.testing.assert_allclose((S2[0] / S1[0]).real, ct, atol=2e-3)
    # polarization degree -S12/S11 = sin^2/(1+cos^2)
    S11 = 0.5 * (np.abs(S1[0])**2 + np.abs(S2[0])**2)
    S12 = 0.5 * (np.abs(S2[0])**2 - np.abs(S1[0])**2)
    np.testing.assert_allclose(-S12 / S11,
                               (1 - ct**2) / (1 + ct**2), atol=2e-3)
    # energy consistency at a Mie-regime size
    x = np.array([3.0])
    S1b, S2b = mie_amplitudes(m, x, ct)
    qext, qsca, g = mie_q(m, x)
    integ = np.trapezoid((np.abs(S1b[0])**2 + np.abs(S2b[0])**2)
                         * np.sin(theta), theta)
    np.testing.assert_allclose(integ, qsca[0] * x[0]**2, rtol=1e-2)


def test_mrn_mueller_tables():
    """Dust SphericalPolarization Mueller tables from our Mie pipeline:
    valid shapes, forward-peaked S11, physical polarization bound."""
    from skirt9_tpu.media.grains import mrn_mueller

    mt = mrn_mueller(0.55e-6, n_theta=61)
    S11 = np.asarray(mt.S11[0])
    S12 = np.asarray(mt.S12[0])
    assert S11[0] > S11[-1]          # forward scattering dominates
    assert (S11 > 0).all()
    p = -S12 / S11
    assert (np.abs(p) <= 1.0 + 1e-9).all()
    assert np.abs(p).max() > 0.05    # genuinely polarizing


def test_polarized_grain_composition_from_ski():
    """ConfigurableDustMix with PolarizedSilicateGrainComposition switches
    on SphericalPolarization with Mie-derived Mueller tables."""
    import xml.etree.ElementTree as ET

    from skirt9_tpu.config.ski import build_mix

    el = ET.fromstring("""
      <ConfigurableDustMix scatteringType="SphericalPolarization">
       <populations type="GrainPopulation">
        <GrainPopulation numSizes="4" dustMassPerHydrogenAtom="1e-29 kg">
         <composition type="GrainComposition">
          <PolarizedSilicateGrainComposition/>
         </composition>
         <sizeDistribution type="GrainSizeDistribution">
          <PowerLawGrainSizeDistribution minSize="0.005 micron"
              maxSize="0.25 micron" exponent="3.5"/>
         </sizeDistribution>
        </GrainPopulation>
       </populations>
      </ConfigurableDustMix>""")
    mix = build_mix(el)
    mt = getattr(mix, "_mueller", None)
    assert mt is not None
    S11 = np.asarray(mt.S11[0])
    assert (S11 > 0).all() and S11[0] > S11[-1]
