"""Non-LTE line gas tests (ref: NonLTELineGasMix.hpp:289)."""

import numpy as np
import pytest

from skirt9_tpu.media import nonlte
from skirt9_tpu.utils import constants as c


def test_co_rotor_constants():
    mol = nonlte.linear_rotor(nlevels=8)
    # exact published values for CO
    assert mol.A[0] == pytest.approx(7.203e-8, rel=0.01)       # J=1-0
    assert mol.line_lam[0] == pytest.approx(2.6006e-3, rel=1e-3)  # 2.6 mm
    assert mol.line_lam[1] == pytest.approx(1.3003e-3, rel=1e-3)  # J=2-1
    assert np.all(np.diff(mol.E) > 0)
    np.testing.assert_allclose(mol.g, 2 * np.arange(8) + 1)


def test_high_density_reaches_lte():
    mol = nonlte.linear_rotor(nlevels=8)
    T = np.array([10.0, 30.0, 100.0])
    pops = np.asarray(nonlte.solve_populations(mol, np.full(3, 1e14), T))
    lte = nonlte.lte_populations(mol, T)
    np.testing.assert_allclose(pops, lte, atol=3e-3)


def test_low_density_subthermal():
    mol = nonlte.linear_rotor(nlevels=8)
    T = np.array([30.0])
    pops = np.asarray(nonlte.solve_populations(mol, np.array([1e7]), T))
    lte = nonlte.lte_populations(mol, T)
    # radiative decay wins: ground state overpopulated relative to LTE
    assert pops[0, 0] > 3 * lte[0, 0]
    assert pops.sum() == pytest.approx(1.0, abs=1e-5)


def test_radiation_field_pumps_levels():
    """A strong radiation field at the line frequencies must push the
    populations toward the radiation temperature even with no collisions."""
    mol = nonlte.linear_rotor(nlevels=6)
    T_rad = 50.0
    nu = mol.line_freq
    # Planck mean intensity at each line
    J = (2 * c.H_PLANCK * nu**3 / c.C_LIGHT**2 /
         np.expm1(c.H_PLANCK * nu / (c.K_BOLTZMANN * T_rad)))
    pops = np.asarray(nonlte.solve_populations(
        mol, np.array([1.0]), np.array([5.0]), J_rad=J[None, :]))
    lte_rad = nonlte.lte_populations(mol, np.array([T_rad]))
    np.testing.assert_allclose(pops, lte_rad, atol=2e-3)


def test_line_luminosities_and_opacity():
    mol = nonlte.linear_rotor(nlevels=8)
    T = np.full(2, 30.0)
    pops = np.asarray(nonlte.solve_populations(mol, np.full(2, 1e10), T))
    n_mol = np.full(2, 1e8)
    V = np.full(2, (3.0857e16) ** 3)
    L = nonlte.line_luminosities(mol, pops, n_mol, V)
    assert L.shape == (7, 2)
    assert np.all(np.isfinite(L)) and np.all(L >= 0)
    # energy per transition: L = h nu A n_u N_mol
    li = 0
    expect = (c.H_PLANCK * mol.line_freq[li] * mol.A[li]
              * pops[0, mol.up[li]] * n_mol[0] * V[0])
    assert L[li, 0] == pytest.approx(expect, rel=1e-6)
    sig = nonlte.line_center_cross_section(mol, pops, T)
    assert sig.shape == (7, 2)
    assert np.all(sig >= 0)
    assert sig.max() > 1e-22  # CO lines are strong absorbers


def test_lamda_roundtrip(tmp_path):
    """Write a 3-level synthetic molecule in LAMDA format, read it back."""
    f = tmp_path / "mol.dat"
    f.write_text("""!MOLECULE
TESTMOL
!MOLECULAR WEIGHT
28.0
!NUMBER OF ENERGY LEVELS
3
!LEVEL + ENERGIES(cm^-1) + WEIGHT + J
 1 0.000000 1.0 0
 2 3.845033 3.0 1
 3 11.534919 5.0 2
!NUMBER OF RADIATIVE TRANSITIONS
2
!TRANS + UP + LOW + EINSTEINA(s^-1) + FREQ(GHz) + E_u(K)
 1 2 1 7.2e-08 115.27 5.53
 2 3 2 6.9e-07 230.54 16.60
!NUMBER OF COLL PARTNERS
1
!COLLISIONS BETWEEN
1 TESTMOL - H2
!NUMBER OF COLL TRANS
3
!NUMBER OF COLL TEMPS
2
!COLL TEMPS
 10.0 100.0
!TRANS + UP + LOW + RATE COEFFS(cm^3 s^-1)
 1 2 1 3.0e-11 4.0e-11
 2 3 1 1.0e-11 1.5e-11
 3 3 2 5.0e-11 6.0e-11
""")
    mol = nonlte.from_lamda(str(f))
    assert mol.name == "TESTMOL"
    assert mol.nlevels == 3
    assert mol.weight == 28.0
    assert mol.A[0] == pytest.approx(7.2e-8)
    # cm^-1 -> J conversion: 3.845 cm^-1 is the CO J=1 level
    assert mol.E[1] == pytest.approx(3.845033 * 100 * c.H_PLANCK * c.C_LIGHT)
    # rate coefficient cm^3/s -> m^3/s
    assert mol.coll_rate[0, 0] == pytest.approx(3.0e-17)
    # the reader's molecule must run through the solver
    pops = np.asarray(nonlte.solve_populations(mol, np.array([1e12]),
                                               np.array([20.0])))
    assert pops.sum() == pytest.approx(1.0, abs=1e-5)


def test_nonlte_line_emission_end_to_end():
    """CO-filled box observed by an SED instrument: both the 1-0 and 2-1
    lines show up at their wavelengths via make_line_sources."""
    import jax
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    grid = make_cartesian(((-PC, PC),) * 3, (4,) * 3)
    ncells = grid.ncells
    T = np.full(ncells, 40.0)
    med = msys.make_medium(grid, np.zeros(ncells, np.float32),
                           np.array([1e-4, 1e-2]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)),
                           temperature=T.astype(np.float32))
    mol = nonlte.linear_rotor(nlevels=6)
    pops = np.asarray(nonlte.solve_populations(mol, np.full(ncells, 1e9), T))
    sources = nonlte.make_line_sources(grid, med, mol, pops,
                                       np.full(ncells, 1e6))
    assert len(sources) >= 2
    wb = np.geomspace(0.4e-3, 4e-3, 33)
    inst = dinst.DistantInstrumentCfg(name="i0", wave_borders=tuple(wb),
                                      distance=1e3 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2)
    sim = Simulation(grid=grid, medium=med, sources=sources,
                     instruments=[inst], options=opts,
                     num_packets=4096, batch_size=2048, seed=3)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    tot = np.asarray(sed["total"])
    # flux concentrated in the bins CONTAINING the two line wavelengths
    i10 = int(np.searchsorted(wb, mol.line_lam[0]) - 1)
    i21 = int(np.searchsorted(wb, mol.line_lam[1]) - 1)
    assert tot[i10] > 0 and tot[i21] > 0
    # everything off any line wavelength must be empty (pure line emission)
    mask = np.ones_like(tot, bool)
    for lam in mol.line_lam:
        j = int(np.searchsorted(wb, lam) - 1)
        if 0 <= j < tot.size:
            mask[max(j - 1, 0):j + 2] = False
    assert tot[mask].sum() == pytest.approx(0.0, abs=1e-30)


def test_multi_source_allocation_energy():
    """Regression: sources after the first must launch their full packet
    share (history ranges are global, validity cutoffs per segment), and the
    composite source bias must not distort total energy: transparent flux
    of N point sources == sum L / (4 pi d^2)."""
    import jax
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    grid = make_cartesian(((-PC, PC),) * 3, (2,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells, np.float32),
                           np.array([1e-7, 1e-5]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    lams = [0.5e-6, 1.0e-6, 2.0e-6, 4.0e-6]
    Ls = [1.0, 10.0, 0.1, 5.0]
    sources = [PointSource(luminosity=L, lam0=l) for L, l in zip(Ls, lams)]
    wb = np.geomspace(0.3e-6, 6e-6, 25)
    inst = dinst.DistantInstrumentCfg(name="i0", wave_borders=tuple(wb),
                                      distance=100 * PC)
    sim = Simulation(grid=grid, medium=med, sources=sources,
                     instruments=[inst],
                     options=lc.TransportOptions(max_steps=grid.max_steps(),
                                                 max_events=1),
                     num_packets=4096, batch_size=1024, seed=0)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    F = np.sum(np.asarray(sed["transparent"]) * np.diff(wb))
    expect = sum(Ls) / (4 * np.pi * (100 * PC) ** 2)
    assert F == pytest.approx(expect, rel=1e-4)
    # every source contributed: four distinct bins lit
    assert (np.asarray(sed["transparent"]) > 0).sum() == 4


def test_nonlte_rf_iteration_flow():
    """Populations <-> radiation-field coupling through the primary
    iteration flow (ref: NonLTELineGasMix.hpp:289): the recipe updates the
    effective absorber density from statistical equilibrium with J from
    the stored RF, and the flow converges."""
    import jax
    import jax.numpy as jnp

    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.media import dynamic as dyn
    from skirt9_tpu.media import nonlte as nl
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    mol = nl.linear_rotor(nlevels=4)
    lam0 = float(mol.line_lam[0])
    grid = make_cartesian(((-PC, PC),) * 3, (6,) * 3)
    nc = grid.ncells
    n_mol = np.full(nc, 1e8)
    n_col = np.full(nc, 1e9)
    T_kin = np.full(nc, 20.0)
    # start from LTE populations for the initial opacity
    pops0 = np.asarray(nl.lte_populations(mol, jnp.asarray(T_kin)))
    g = np.asarray(mol.g, np.float64)
    u, l = int(mol.up[0]), int(mol.lo[0])
    n_eff0 = n_mol * (pops0[:, l] - g[l] / g[u] * pops0[:, u])
    lam_t = np.array([lam0 * 0.8, lam0 * 1.2])
    sigma = 1e-22
    med = msys.make_medium(grid, n_eff0.astype(np.float32), lam_t,
                           sigma_ext=np.full((1, 2), sigma),
                           albedo=np.zeros((1, 2)), g=np.zeros((1, 2)))
    rfb = np.array([lam0 * 0.9, lam0 * 1.1])
    recipe = dyn.NonLTELineRecipe(mol=mol, component=0, n_mol=n_mol,
                                  n_col=n_col, T_kin=T_kin, rf_borders=rfb)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1e20, lam0=lam0)],
                     instruments=[], options=opts, rf_borders=rfb,
                     num_packets=2048, batch_size=1024, seed=6,
                     dynamic_recipes=[recipe], iterate_primary=True,
                     max_primary_iterations=6)
    info = sim.run_primary_iterations(verbose=False)
    assert info["iterations"] >= 2
    assert info["converged"]
    # the medium now holds the converged effective density (changed vs LTE)
    nd_final = np.asarray(sim.medium.nd[:, 0], np.float64)
    assert not np.allclose(nd_final, n_eff0, rtol=1e-6)
    assert np.isfinite(nd_final).all()
