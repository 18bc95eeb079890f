"""Imported snapshots: SPH density resampling, particle sources, BB family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.imports import snapshots as snap
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import mixes as mx
from skirt9_tpu.ops import rng
from skirt9_tpu.utils import constants as c

PC = 3.0857e16


def test_cubic_spline_normalization():
    """4 pi int W(q) q^2 dq = 1."""
    q = np.linspace(0, 1, 20001)
    integral = 4 * np.pi * np.trapezoid(snap.cubic_spline_w(q) * q**2, q)
    assert integral == pytest.approx(1.0, rel=1e-4)


def test_particle_density_mass_conservation():
    """Kernel-smoothed densities integrate to the total particle mass."""
    rs = np.random.default_rng(0)
    npart = 200
    pos = rs.normal(scale=0.3 * PC, size=(npart, 3))
    h = np.full(npart, 0.2 * PC)
    mass = rs.uniform(1e28, 1e30, npart)
    s = snap.ParticleSnapshot(positions=pos, h=h, mass=mass)
    grid = make_cartesian(((-1.5 * PC, 1.5 * PC),) * 3, (24,) * 3)
    rho = s.density_on_cells(grid)
    total = np.sum(rho * np.asarray(grid.volumes()))
    assert total == pytest.approx(mass.sum(), rel=0.1)  # center sampling


def test_imported_medium():
    rs = np.random.default_rng(1)
    pos = rs.normal(scale=0.3 * PC, size=(100, 3))
    vel = np.tile([1e5, 0, 0], (100, 1))
    s = snap.ParticleSnapshot(positions=pos, h=np.full(100, 0.2 * PC),
                              mass=np.full(100, 1e30), velocity=vel)
    grid = make_cartesian(((-PC, PC),) * 3, (12,) * 3)
    mix = mx.mean_interstellar_approx()
    med = snap.imported_medium(grid, s, mix)
    assert float(jnp.max(med.nd)) > 0
    np.testing.assert_allclose(np.asarray(med.bulk_v[:, 0]), 1e5)


def test_planck_wavelength_sampling():
    """Sampled wavelengths are B_lambda-distributed: the dimensionless
    x = hc/(lam k T) must have <x> = 4 zeta(5)/zeta(4) = 3.832 for any T."""
    keys = rng.history_keys(jax.random.PRNGKey(0), jnp.arange(50_000))
    u = rng.uniform(keys, 1)
    for T in [3000.0, 10000.0]:
        lam = np.asarray(snap.sample_planck_wavelength(u, jnp.float32(T)))
        x = c.H_PLANCK * c.C_LIGHT / (lam * c.K_BOLTZMANN * T)
        assert x.mean() == pytest.approx(3.8322, rel=0.03)
        # wavelengths scale as 1/T
        if T == 3000.0:
            lam3000_med = np.median(lam)
        else:
            assert np.median(lam) == pytest.approx(lam3000_med * 0.3,
                                                   rel=0.02)


def test_particle_source_launch_and_transport():
    """Imported particle source end-to-end: launch + transparent SED shape."""
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.transport import lifecycle as lc

    rs = np.random.default_rng(2)
    npart = 50
    pos = rs.normal(scale=0.2 * PC, size=(npart, 3))
    s = snap.ParticleSnapshot(positions=pos, h=np.full(npart, 0.05 * PC),
                              mass=np.full(npart, 1e30))
    source = snap.ParticleSource(
        snapshot=s,
        luminosities=np.full(npart, 3.8e26),
        temperatures=np.full(npart, 5778.0))
    grid = make_cartesian(((-PC, PC),) * 3, (8,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells, np.float32),
                           np.array([1e-8, 1e-4]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    inst = dinst.DistantInstrumentCfg(
        name="i", wave_borders=tuple(np.geomspace(0.1e-6, 10e-6, 30)),
        distance=1000 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2,
                               store_rf=False)
    sim = Simulation(grid=grid, medium=med, sources=[source],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=20_000, batch_size=4096, seed=6)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    w = sed["wavelength"]
    f = sed["transparent"]
    # SED peaks near the solar Wien peak (~0.5 um)
    assert w[np.argmax(f)] == pytest.approx(0.5e-6, rel=0.4)
    # integrated flux = L_tot/(4 pi d^2)
    total = np.trapezoid(f, w) * 0  # bins are exact sums, integrate directly
    total = float(np.sum(f * np.diff(np.asarray(inst.wave_borders))))
    expect = npart * 3.8e26 / (4 * np.pi * (1000 * PC) ** 2)
    # some flux falls outside the instrument range; allow a loose window
    assert total == pytest.approx(expect, rel=0.2)


def test_read_column_file(tmp_path):
    p = tmp_path / "parts.dat"
    p.write_text("# x y z h M\n1 0 0 0.1 2\n0 1 0 0.2 3\n")
    cols = snap.read_column_file(str(p), [
        ("x", "length", "pc"), ("y", "length", "pc"), ("z", "length", "pc"),
        ("h", "length", "pc"), ("M", "mass", "Msun")])
    assert cols["x"][0] == pytest.approx(PC, rel=1e-3)
    assert cols["M"][1] == pytest.approx(3 * c.SOLAR_MASS)


def test_cylindrical_cell_snapshot():
    """CylindricalCellSnapshot: density from (R, phi, z) cells
    (ref: CylindricalCellSnapshot.hpp)."""
    from skirt9_tpu.imports.snapshots import CylindricalCellSnapshot

    # one full ring R in [1,2], z in [-1,1]
    lo = np.array([[1.0, 0.0, -1.0]])
    hi = np.array([[2.0, 2 * np.pi, 1.0]])
    vol = 0.5 * (4 - 1) * 2 * np.pi * 2
    snap = CylindricalCellSnapshot(lo=lo, hi=hi, mass=np.array([vol]))
    d = snap.density_at(np.array([[1.5, 0.0, 0.0],    # inside
                                  [0.5, 0.0, 0.0],    # inner hole
                                  [1.5, 0.0, 1.5]]))  # above
    np.testing.assert_allclose(d, [1.0, 0.0, 0.0], atol=1e-12)


def test_spherical_cell_snapshot():
    from skirt9_tpu.imports.snapshots import SphericalCellSnapshot

    # full shell r in [1,2]
    lo = np.array([[1.0, 0.0, 0.0]])
    hi = np.array([[2.0, np.pi, 2 * np.pi]])
    vol = (8 - 1) / 3 * 2 * 2 * np.pi
    snap = SphericalCellSnapshot(lo=lo, hi=hi, mass=np.array([vol]))
    d = snap.density_at(np.array([[0.0, 0.0, 1.5],
                                  [0.0, 0.0, 0.5],
                                  [2.5, 0.0, 0.0]]))
    np.testing.assert_allclose(d, [1.0, 0.0, 0.0], atol=1e-12)


def test_mesh_snapshot_medium_and_source():
    """MeshSnapshot: regular-mesh import backing MeshMedium/MeshSource
    (ref: MeshGeometry/MeshSource/MeshMedium)."""
    from skirt9_tpu.imports.snapshots import MeshSnapshot

    n = (4, 4, 4)
    mass = np.zeros(n)
    mass[1, 2, 3] = 8.0
    snap = MeshSnapshot(lo=np.array([0.0, 0.0, 0.0]),
                        hi=np.array([4.0, 4.0, 4.0]), mass=mass)
    # density: mass / unit cell volume, localized
    d = snap.density_at(np.array([[1.5, 2.5, 3.5], [0.5, 0.5, 0.5],
                                  [5.0, 0.0, 0.0]]))
    np.testing.assert_allclose(d, [8.0, 0.0, 0.0])

    # mesh source: launches come from the luminous cell
    import jax
    import jax.numpy as jnp

    from skirt9_tpu.ops import rng
    L = np.zeros(64)
    L[1 * 16 + 2 * 4 + 3] = 5.0
    emsb = np.array([1e-6, 2e-6, 4e-6])
    spectra = np.tile(np.array([1.0, 1.0]), (64, 1))
    src = snap.as_cell_source(L, emsb, spectra)
    assert src.luminosity == 5.0
    keys = rng.event_keys(rng.history_keys(jax.random.PRNGKey(0),
                                           jnp.arange(512, dtype=jnp.int32)),
                          rng.LAUNCH_EVENT)
    f = src.launch(src.tables(), keys, 512)
    pos = np.asarray(f["pos"])
    assert (pos[:, 0] >= 1).all() and (pos[:, 0] <= 2).all()
    assert (pos[:, 1] >= 2).all() and (pos[:, 1] <= 3).all()
    assert (pos[:, 2] >= 3).all() and (pos[:, 2] <= 4).all()


def test_entity_collection_queries():
    """EntityCollection-style overlap queries (ref: EntityCollection.hpp):
    position and path queries return kernel-weighted entity sets, and the
    path column density matches the plane-parallel analytic value."""
    from skirt9_tpu.imports.snapshots import ParticleSnapshot

    rs = np.random.default_rng(2)
    n = 200
    pos = rs.uniform(-1.0, 1.0, (n, 3))
    snap = ParticleSnapshot(positions=pos, h=np.full(n, 0.3),
                            mass=np.full(n, 1.0 / n))
    ents = snap.entities_at(np.array([0.0, 0.0, 0.0]))
    assert len(ents) > 0
    assert all(w > 0 for _, w in ents)
    # column through the cloud ~ total mass / area: average many rays
    cols = [snap.column_density(np.array([x, y, -2.0]),
                                np.array([0.0, 0.0, 1.0]), 4.0)
            for x in (-0.5, 0.0, 0.5) for y in (-0.5, 0.0, 0.5)]
    mean_col = np.mean(cols)
    # expected ~ M_total / (2x2 area) = 0.25 within kernel-noise factor
    assert 0.1 < mean_col < 0.5, mean_col
