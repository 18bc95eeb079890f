"""Physics/capability tail: FilePolarizedPointSource, ReadFitsGeometry,
Lloyd relaxation, CMB dust heating, radiation-field checkpointing."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

PC = 3.0857e16


def _polarized_table():
    lam = np.array([0.4, 0.55, 0.7])          # micron
    mu = np.linspace(-1, 1, 9)
    rows = []
    for la in lam:
        for m in mu:
            I = 1.0 + 0.5 * m * m * (la / 0.55)
            Q = 0.3 * (1 - m * m) * I
            rows.append([la, m, I, Q, 0.0, 0.0])
    return np.asarray(rows)


def test_file_polarized_point_source_launch_and_stokes():
    from skirt9_tpu.ops import rng
    from skirt9_tpu.sources.filepolarized import FilePolarizedPointSource

    src = FilePolarizedPointSource(filename=_polarized_table(),
                                   luminosity=2.0)
    tabs = src.tables()
    B = 1 << 14
    keys = rng.event_keys(rng.history_keys(jax.random.PRNGKey(0),
                                           jnp.arange(B)), rng.LAUNCH_EVENT)
    out = src.launch(tabs, keys, B)
    d = np.asarray(out["dir"])
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)
    lam = np.asarray(out["lam"])
    assert (lam >= 0.4e-6 - 1e-12).all() and (lam <= 0.7e-6 + 1e-12).all()
    # mu distribution follows ~(1 + 0.5 mu^2): poles over equator ratio
    mu = d[:, 2]
    hist, _ = np.histogram(mu, bins=10, range=(-1, 1))
    assert hist[0] > hist[4] * 1.15
    # stokes normal is the axis projection perpendicular to k
    st = np.asarray(out["stokes"])
    n = np.asarray(out["normal"])
    assert np.abs((n * d).sum(1)).max() < 1e-4
    # fractional Q matches the table: Q/I = 0.3 (1 - mu^2)
    np.testing.assert_allclose(st[:, 1], 0.3 * (1 - mu ** 2), atol=0.02)
    # emission phase: sphere-average equals 1/(4 pi)
    ph = np.asarray(src.emission_phase(
        jnp.asarray([0.0, 0.0, 1.0]), None,
        jnp.full((B,), 0.55e-6)))
    assert ph.shape == (B,)

    # end to end: a transparent run records polarized emission
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.transport import lifecycle as lc

    grid = make_cartesian(((-PC, PC),) * 3, (8,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells),
                           np.array([0.3e-6, 0.8e-6]),
                           np.zeros((1, 2)), np.zeros((1, 2)),
                           np.zeros((1, 2)))
    inst = dinst.DistantInstrumentCfg(
        name="i", wave_borders=tuple(np.linspace(0.4e-6, 0.7e-6, 7)),
        inclination=np.pi / 2, distance=100 * PC,
        record_polarization=True)
    sim = Simulation(grid=grid, medium=med, sources=[src],
                     instruments=[inst],
                     options=lc.TransportOptions(max_steps=grid.max_steps(),
                                                 max_events=2),
                     num_packets=4096, batch_size=4096, seed=1)
    _, accs = sim.run_primary(verbose=False)
    quv = np.asarray(accs[0]["stokes"])
    sed = np.asarray(accs[0]["sed"])
    direct = sed[dinst.KIND_PRIMARY_DIRECT].sum()
    # edge-on observer: mu=0 -> polarization degree 0.3 from the table
    # (frame-independent: sqrt(Q^2+U^2)/I_direct; every packet peels from
    # the same point so the detection-frame rotation is common)
    p = np.hypot(quv[0].sum(), quv[1].sum()) / direct
    assert 0.27 < p < 0.33
    assert abs(np.asarray(accs[0]["stokes"])[2]).sum() < 1e-6 * direct
    # SIGN check (round-4 advisory): the table's Stokes frame has
    # reference direction n = s x k (reference convention), so Q/I = +0.3
    # means E-field along s x k — azimuthal around the symmetry axis,
    # horizontal in the edge-on image — which lands in the instrument
    # frame as Q = +0.3 * I_direct. The old (wrong) projection normal
    # n = s - (k.s)k is rotated 90 deg and would flip this to -0.3.
    assert quv[0].sum() > 0.27 * direct
    assert abs(quv[1].sum()) < 1e-4 * direct


def test_read_fits_geometry_deprojection(tmp_path):
    from skirt9_tpu.geometries.fitsgeometry import (ReadFits3DGeometry,
                                                    ReadFitsGeometry)
    from skirt9_tpu.ops import rng
    from skirt9_tpu.utils.fits import write_fits

    img = np.zeros((16, 16))
    img[8, 4] = 3.0        # (iy=8, ix=4)
    img[8, 12] = 1.0
    p = tmp_path / "img.fits"
    write_fits(str(p), img)
    g = ReadFitsGeometry(filename=str(p), pixel_scale=0.1 * PC,
                         scale_height=0.05 * PC, inclination=0.5)
    # density at the deprojected position of pixel (4.5, 8.5)
    xg = (4.5 - 8.0) * 0.1 * PC
    yg = (8.5 - 8.0) * 0.1 * PC / np.cos(0.5)
    rho = g.density_np(np.array([[xg, yg, 0.0]]))
    assert rho[0] > 0
    # off-image positions have zero density
    assert g.density_np(np.array([[10 * PC, 0, 0]]))[0] == 0.0
    # sampling reproduces the 3:1 pixel flux split and the z profile
    B = 1 << 13
    keys = rng.event_keys(rng.history_keys(jax.random.PRNGKey(2),
                                           jnp.arange(B)), rng.LAUNCH_EVENT)
    pts = np.asarray(g.sample(keys))
    left = (pts[:, 0] < 0).mean()
    assert 0.70 < left < 0.80
    z = np.abs(pts[:, 2])
    assert abs(np.mean(z) / (0.05 * PC) - 1.0) < 0.05
    # every sample lands where the density is positive
    assert (g.density_np(pts) > 0).all()

    cube = np.zeros((4, 4, 4))
    cube[1, 2, 3] = 1.0
    g3 = ReadFits3DGeometry(filename=cube, pixel_scale=0.1 * PC)
    pts3 = np.asarray(g3.sample(keys))
    assert (g3.density_np(pts3) > 0).all()
    # voxel (k=1, j=2, i=3): x in [0.1, 0.2) pc, y in [0, 0.1), z in
    # [-0.1, 0) for pixel_scale 0.1 pc and a 4^3 cube centered on origin
    assert g3.density_np(np.array([[0.15 * PC, 0.05 * PC, -0.05 * PC]]))[
        0] > 0


def test_lloyd_relaxation_regularizes():
    from scipy.spatial import cKDTree

    from skirt9_tpu.grids.voronoi import lloyd_relax

    rs = np.random.default_rng(0)
    sites = rs.uniform(-1, 1, (64, 3))
    relaxed = lloyd_relax(sites, ((-1, 1),) * 3, n_iter=8,
                          samples=200_000)
    # relaxation evens out the cell volumes (MC volume estimates)
    pts = rs.uniform(-1, 1, (200_000, 3))

    def vol_cv(s):
        _, o = cKDTree(s).query(pts)
        v = np.bincount(o, minlength=len(s)) / len(pts)
        return v.std() / v.mean()

    assert vol_cv(relaxed) < 0.6 * vol_cv(sites)
    assert (relaxed >= -1).all() and (relaxed <= 1).all()


def test_cmb_heating_floors_temperature():
    from skirt9_tpu.emission import equilibrium as eq
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.media import system as msys

    grid = make_cartesian(((-PC, PC),) * 3, (4,) * 3)
    lam_t = np.geomspace(0.05e-6, 3000e-6, 32)
    sigma = 1e-24 * (lam_t / 1e-6) ** -1.5
    med = msys.make_medium(grid, np.full(grid.ncells, 1e6), lam_t,
                           sigma[None, :], np.zeros((1, 32)),
                           np.zeros((1, 32)))
    rfb = np.geomspace(0.05e-6, 10e-6, 9)
    emsb = np.geomspace(1e-6, 3000e-6, 17)
    etabs = eq.build_emission_tables(med, rfb, emsb)
    p_abs = np.full((grid.ncells, 1), 1e-40)      # essentially no field
    T0 = eq.equilibrium_temperature(etabs, p_abs)
    p_cmb = eq.cmb_heating_power(etabs, 2.725)
    T1 = eq.equilibrium_temperature(etabs, p_abs, p_cmb=p_cmb)
    assert (T1 > T0).all()
    # with no other heating the dust sits AT the CMB temperature
    np.testing.assert_allclose(T1[:, 0], 2.725, rtol=0.05)
    # strong fields are unaffected
    p_hot = np.full((grid.ncells, 1), 1e-10)
    Th0 = eq.equilibrium_temperature(etabs, p_hot)
    Th1 = eq.equilibrium_temperature(etabs, p_hot, p_cmb=p_cmb)
    np.testing.assert_allclose(Th1, Th0, rtol=1e-4)


def test_rf_checkpoint_resume(tmp_path, monkeypatch):
    from skirt9_tpu.config.ski import load_ski

    G = os.path.join(os.path.dirname(__file__), "golden")
    ck = str(tmp_path / "state.npz")

    def build():
        sim = load_ski(os.path.join(G, "bench3.ski"), num_packets=1024,
                       batch_size=1024, max_events=3)
        sim.seed = 0
        sim.max_iterations = 2
        sim.min_iterations = 2
        sim.checkpoint_path = ck
        return sim

    sim_a = build()
    # keep the checkpoint of the completed run for the resume test
    monkeypatch.setattr(type(sim_a), "_clear_checkpoint", lambda self: None)
    rf_a, accs_a, info_a = sim_a.run_with_dust_emission(verbose=False)
    assert os.path.exists(ck)

    sim_b = build()
    calls = {"primary": 0}
    orig = type(sim_b).run_primary

    def counting(self, *a, **k):
        calls["primary"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(type(sim_b), "run_primary", counting)
    rf_b, accs_b, info_b = sim_b.run_with_dust_emission(verbose=False)
    assert calls["primary"] == 0          # resumed: primary skipped
    assert info_b["iterations"] == info_a["iterations"]
    np.testing.assert_allclose(np.asarray(rf_b), np.asarray(rf_a),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(accs_b[0]["sed"]),
                               np.asarray(accs_a[0]["sed"]), rtol=1e-6)
