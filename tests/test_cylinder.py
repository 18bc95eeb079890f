"""2D cylindrical grid: traversal exactness and disk transport."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.grids.cylinder import make_cylinder2d

PC = 3.0857e16


def test_locate_and_volumes():
    g = make_cylinder2d(1.0, -0.5, 0.5, 10, 8)
    pos = jnp.asarray([[0.05, 0, 0], [0.75, 0, 0.3], [1.5, 0, 0],
                       [0.5, 0, 0.9]])
    c = np.asarray(g.locate(pos))
    assert c[0] >= 0 and c[1] >= 0
    assert c[2] == -1 and c[3] == -1
    assert g.volumes().sum() == pytest.approx(np.pi * 1.0, rel=1e-6)


def test_traversal_chord():
    g = make_cylinder2d(1.0, -0.6, 0.6, 9, 7)
    rs = np.random.default_rng(4)
    B = 128
    R = rs.uniform(0.05, 0.9, B)
    phi = rs.uniform(0, 2 * np.pi, B)
    z = rs.uniform(-0.5, 0.5, B)
    pos = np.stack([R * np.cos(phi), R * np.sin(phi), z], -1).astype(np.float32)
    d = rs.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos_j, d_j = jnp.asarray(pos), jnp.asarray(d)
    c = g.locate(pos_j)
    total = jnp.zeros(B)
    p = pos_j
    for _ in range(g.max_steps()):
        ds, c2, p2 = g.step(p, d_j, c)
        total = total + jnp.where(c >= 0, ds, 0.0)
        p, c = p2, c2
    assert (np.asarray(c) == -1).all()

    # analytic exit: min of cylinder-wall and z-slab crossing
    pn, dn = pos.astype(np.float64), d.astype(np.float64)
    q = dn[:, 0] ** 2 + dn[:, 1] ** 2
    b = pn[:, 0] * dn[:, 0] + pn[:, 1] * dn[:, 1]
    disc = b**2 + q * (1.0 - pn[:, 0] ** 2 - pn[:, 1] ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_cyl = np.where(q > 0, (-b + np.sqrt(disc)) / q, np.inf)
        t_z = np.where(dn[:, 2] > 0, (0.6 - pn[:, 2]) / dn[:, 2],
                       np.where(dn[:, 2] < 0, (-0.6 - pn[:, 2]) / dn[:, 2],
                                np.inf))
    t_exit = np.minimum(t_cyl, t_z)
    np.testing.assert_allclose(np.asarray(total), t_exit, rtol=1e-3,
                               atol=1e-5)


def test_disk_transport():
    """Exponential disk on the cylinder grid: edge-on extinction exceeds
    face-on (the axisymmetric disk sanity check)."""
    from skirt9_tpu.geometries.analytic import ExpDiskGeometry
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import geometric as gm, mixes as mx
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    g = make_cylinder2d(3 * PC, -0.5 * PC, 0.5 * PC, 20, 32)
    geom = ExpDiskGeometry(h_r=0.8 * PC, h_z=0.1 * PC)
    mix = mx.power_law_test_mix(albedo=0.4, g=0.3)
    norm = gm.OpticalDepthNormalization(tau=4.0, lam=0.55e-6, axis="x",
                                        rmax=3 * PC)
    med = gm.build_medium(g, [(geom, mix, norm)], samples=4)
    face = dinst.DistantInstrumentCfg(name="face", wave_borders=(0.5e-6, 0.6e-6),
                                      inclination=0.0, distance=100 * PC)
    edge = dinst.DistantInstrumentCfg(name="edge", wave_borders=(0.5e-6, 0.6e-6),
                                      inclination=np.pi / 2, distance=100 * PC)
    opts = lc.TransportOptions(max_steps=g.max_steps(), max_events=10,
                               store_rf=False)
    sim = Simulation(grid=g, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[face, edge], options=opts, rf_borders=None,
                     num_packets=8192, batch_size=4096, seed=2)
    _, accs = sim.run_primary(verbose=False)
    f = dinst.calibrate_sed(face, jax.device_get(accs[0]))
    e = dinst.calibrate_sed(edge, jax.device_get(accs[1]))
    att_face = f["primarydirect"][0] / f["transparent"][0]
    att_edge = e["primarydirect"][0] / e["transparent"][0]
    assert att_edge < 0.3 * att_face  # edge-on much more extinguished
    assert f["primaryscattered"][0] > 0 and e["primaryscattered"][0] > 0