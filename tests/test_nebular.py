"""Nebular continuum + H recombination line emission.

(ref: NebularContinuumEmission.hpp:26-31, NebularLineEmission.cpp,
EmittingGasMix.hpp)
"""

import numpy as np
import jax
import pytest

from skirt9_tpu.media import nebular as neb


def test_hbeta_coefficient_matches_published():
    """4 pi j_Hbeta / (ne nHII) = 1.24e-25 erg cm^3/s at 1e4 K
    (Osterbrock & Ferland table 4.4) = 1.24e-38 W m^3."""
    L = neb.line_luminosity_density(1e4, 1.0, 1.0, "Hbeta")
    assert L == pytest.approx(1.24e-38, rel=0.02)


def test_balmer_decrement():
    """Halpha/Hbeta ~ 2.86 at 1e4 K (Case B)."""
    a = neb.line_luminosity_density(1e4, 1.0, 1.0, "Halpha")
    b = neb.line_luminosity_density(1e4, 1.0, 1.0, "Hbeta")
    assert a / b == pytest.approx(2.86, rel=0.03)
    # decrement grows toward lower temperature
    a2 = neb.line_luminosity_density(5e3, 1.0, 1.0, "Halpha")
    b2 = neb.line_luminosity_density(5e3, 1.0, 1.0, "Hbeta")
    assert a2 / b2 > a / b


def test_two_photon_energy_budget():
    """Integrated two-photon continuum = ne nHII alpha_2s E(Lya)."""
    lam = np.geomspace(121.6e-9, 5e-6, 4000)
    eps = neb.two_photon_emissivity(lam, 1e4, 1.0, 1.0)
    total = np.trapezoid(eps, lam)
    expect = 0.838e-19 * (neb.H_PLANCK * neb.C_LIGHT / neb.LAM_LYA)
    assert total == pytest.approx(expect, rel=0.02)
    # profile vanishes shortward of Lya
    assert neb.two_photon_emissivity(100e-9, 1e4, 1.0, 1.0) == 0.0


def test_free_free_spectrum():
    """Flat-ish gamma_nu with exponential cutoff at h nu ~ kT; scales as
    ne^2 and roughly T^-1/2 at fixed long wavelength."""
    lam = np.array([1e-2, 1e-3, 2e-5])  # radio to mid-IR
    e1 = neb.free_free_emissivity(lam, 1e4, 1.0, 1.0)
    assert (e1 > 0).all()
    # gamma_nu = eps*lam^2/c varies slowly (Gaunt only) in the radio
    gnu = e1 * lam**2
    assert gnu[0] / gnu[1] == pytest.approx(1.0, rel=0.5)
    e2 = neb.free_free_emissivity(np.array([1e-2]), 4e4, 1.0, 1.0)
    assert e2[0] < e1[0]  # T^-1/2 (log gaunt rises but sqrt wins)
    # optical: exponential cutoff kicks in at small lam
    cut = neb.free_free_emissivity(np.array([50e-9]), 1e4, 1.0, 1.0)
    assert cut[0] < neb.free_free_emissivity(np.array([1e-6]), 1e4,
                                             1.0, 1.0)[0]


def test_free_bound_jumps():
    """Recombination continuum shows the Balmer jump: emissivity just
    shortward of 364.6 nm exceeds just longward."""
    below = neb.free_bound_emissivity(np.array([360e-9]), 1e4, 1.0, 1.0)
    above = neb.free_bound_emissivity(np.array([370e-9]), 1e4, 1.0, 1.0)
    assert below[0] > 3 * above[0]
    # Paschen jump at 820.4 nm
    b2 = neb.free_bound_emissivity(np.array([815e-9]), 1e4, 1.0, 1.0)
    a2 = neb.free_bound_emissivity(np.array([825e-9]), 1e4, 1.0, 1.0)
    assert b2[0] > a2[0]


def test_cell_spectra_and_secondary_source():
    """Per-cell spectra integrate to the cell luminosity and drive the
    standard secondary-source launcher."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.sources import secondary as sec

    PC = 3.0857e16
    grid = make_cartesian(((-PC, PC),) * 3, (4,) * 3)
    N = grid.ncells
    T = np.full(N, 1e4)
    ne = np.full(N, 1e8)      # 100 cm^-3
    nH = np.full(N, 1e8)
    calc = neb.NebularEmission()
    eb = np.geomspace(0.1e-6, 10e-6, 65)
    eps, L_cell = calc.cell_spectra(eb, T, ne, nH, grid.volumes())
    assert (L_cell > 0).all()
    # integral consistency
    dlam = np.diff(eb)
    np.testing.assert_allclose((eps * dlam).sum(1) * grid.volumes(),
                               L_cell, rtol=1e-10)
    # Halpha bin dominates neighboring continuum bins
    b_ha = int(np.searchsorted(eb, 656.46e-9)) - 1
    assert eps[0, b_ha] > 5 * eps[0, b_ha + 2]

    src = sec.prepare(grid, L_cell, eps, eb, 0.5)
    assert src.luminosity == pytest.approx(L_cell.sum(), rel=1e-5)
    from skirt9_tpu.ops import rng as prng
    hk = prng.history_keys(jax.random.PRNGKey(0), np.arange(4096))
    keys = prng.event_keys(hk, prng.LAUNCH_EVENT)
    out = src.launch(src.tables(), keys, 4096)
    lam = np.asarray(out["lam"], np.float64)
    lum = np.asarray(out["lum"], np.float64)
    assert lum.sum() * 1 == pytest.approx(L_cell.sum() / 4096 * 4096,
                                          rel=0.1)
    # a healthy share of packets in the Halpha bin
    frac_ha = ((lam >= eb[b_ha]) & (lam < eb[b_ha + 1])).mean()
    assert frac_ha > 0.05


def test_nebular_emission_end_to_end():
    """An ionized box observed by an SED instrument shows the Balmer
    decrement in the detected fluxes (same integration idiom as the
    NonLTE gas lines: the prepared secondary source runs as a source)."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources import secondary as sec
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    grid = make_cartesian(((-PC, PC),) * 3, (4,) * 3)
    N = grid.ncells
    med = msys.make_medium(grid, np.zeros(N, np.float32),
                           np.array([1e-7, 1e-5]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    calc = neb.NebularEmission(include_free_free=False,
                               include_free_bound=False,
                               include_two_photon=False,
                               lines=("Halpha", "Hbeta"))
    # fine grid so the two lines land in distinct narrow bins
    eb = np.geomspace(0.4e-6, 0.8e-6, 129)
    eps, L_cell = calc.cell_spectra(eb, np.full(N, 1e4), np.full(N, 1e8),
                                    np.full(N, 1e8), grid.volumes())
    src = sec.prepare(grid, L_cell, eps, eb, 0.5)
    inst = dinst.DistantInstrumentCfg(name="i0", wave_borders=tuple(eb),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2)
    sim = Simulation(grid=grid, medium=med, sources=[src],
                     instruments=[inst], options=opts,
                     num_packets=1 << 15, batch_size=1 << 14, seed=2)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    tot = np.asarray(sed["total"], np.float64)
    dlam = np.diff(eb)
    F = tot * dlam  # band-integrated flux
    i_ha = int(np.searchsorted(eb, 656.46e-9)) - 1
    i_hb = int(np.searchsorted(eb, 486.27e-9)) - 1
    assert F[i_ha] > 0 and F[i_hb] > 0
    assert F[i_ha] / F[i_hb] == pytest.approx(2.86, rel=0.1)
