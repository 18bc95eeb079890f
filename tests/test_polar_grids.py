"""Polar grids: Sphere2D/Sphere3D/Cylinder3D traversal correctness
(ref: Sphere2DSpatialGrid, Sphere3DSpatialGrid, Cylinder3DSpatialGrid)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.grids import polar

PC = 3.0857e16


def _march_total(g, pos, d, weight=None):
    """Total path length (or weighted path) through the grid per ray."""
    c = g.locate(pos)
    # rays starting outside first advance to the boundary
    pos2, c2, _ = g.move_inside(pos, d)
    pos = jnp.where((c < 0)[..., None], pos2, pos)
    c = jnp.where(c < 0, c2, c)
    total = jnp.zeros(pos.shape[0])
    p = pos
    for _ in range(g.max_steps()):
        ds, cn, pn = g.step(p, d, c)
        w = 1.0 if weight is None else weight[jnp.maximum(c, 0)]
        total = total + jnp.where(c >= 0, ds * w, 0.0)
        p, c = pn, cn
    assert (np.asarray(c) == -1).all(), "ray did not exit within max_steps"
    return np.asarray(total)


def _random_rays(B, R, seed, inside=True):
    rs = np.random.default_rng(seed)
    if inside:
        pos = rs.normal(size=(B, 3))
        pos = pos / np.linalg.norm(pos, axis=-1, keepdims=True) \
            * rs.uniform(0.05, 0.95, (B, 1)) * R
    else:
        pos = rs.normal(size=(B, 3))
        pos = pos / np.linalg.norm(pos, axis=-1, keepdims=True) * 2.5 * R
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if not inside:
        # aim roughly at the grid
        to_c = -pos / np.linalg.norm(pos, axis=-1, keepdims=True)
        d = 0.8 * to_c + 0.2 * d
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32))


def _chord_sphere(pos, d, R):
    pn, dn = np.asarray(pos, np.float64), np.asarray(d, np.float64)
    b = np.sum(pn * dn, axis=-1)
    disc = R * R - (np.sum(pn * pn, -1) - b**2)
    t_exit = -b + np.sqrt(np.maximum(disc, 0.0))
    r = np.linalg.norm(pn, axis=-1)
    t_enter = np.where(r > R, np.maximum(-b - np.sqrt(np.maximum(disc, 0)), 0.0), 0.0)
    return np.where(disc > 0, t_exit - t_enter, 0.0)


def test_sphere2d_chord():
    g = polar.make_sphere2d(1.0, 9, 7)
    assert g.volumes().sum() == pytest.approx(4 / 3 * np.pi, rel=1e-5)
    pos, d = _random_rays(256, 1.0, 5)
    total = _march_total(g, pos, d)
    np.testing.assert_allclose(total, _chord_sphere(pos, d, 1.0),
                               rtol=2e-3, atol=2e-4)


def test_sphere3d_chord():
    g = polar.make_sphere3d(1.0, 6, 5, 8)
    assert g.volumes().sum() == pytest.approx(4 / 3 * np.pi, rel=1e-5)
    pos, d = _random_rays(256, 1.0, 6)
    total = _march_total(g, pos, d)
    np.testing.assert_allclose(total, _chord_sphere(pos, d, 1.0),
                               rtol=2e-3, atol=2e-4)


def test_cylinder3d_chord():
    g = polar.make_cylinder3d(1.0, -0.7, 0.7, 6, 8, 5)
    assert g.volumes().sum() == pytest.approx(np.pi * 1.4, rel=1e-5)
    rs = np.random.default_rng(7)
    B = 256
    pos = np.stack([rs.uniform(-0.6, 0.6, B), rs.uniform(-0.6, 0.6, B),
                    rs.uniform(-0.5, 0.5, B)], -1)
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    posj = jnp.asarray(pos, jnp.float32)
    dj = jnp.asarray(d, jnp.float32)
    total = _march_total(g, posj, dj)
    # analytic chord: min(exit through side, exit through cap)
    b = np.sum(pos[:, :2] * d[:, :2], -1)
    q = np.sum(d[:, :2] ** 2, -1)
    disc = b * b + q * (1.0 - np.sum(pos[:, :2] ** 2, -1))
    t_side = np.where(q > 1e-12, (-b + np.sqrt(np.maximum(disc, 0))) / np.maximum(q, 1e-12), np.inf)
    t_cap = np.where(d[:, 2] > 0, (0.7 - pos[:, 2]) / d[:, 2],
                     np.where(d[:, 2] < 0, (-0.7 - pos[:, 2]) / d[:, 2], np.inf))
    np.testing.assert_allclose(total, np.minimum(t_side, t_cap),
                               rtol=2e-3, atol=2e-4)


def test_sphere2d_weighted_path_matches_shell_tau():
    """Radially-stratified density: path integral from outside through the
    center column equals the analytic sum over shells."""
    g = polar.make_sphere2d(1.0, 12, 6)
    dens = np.zeros((12, 6))
    dens[:, :] = (np.arange(12) + 1.0)[:, None]  # density ~ shell index
    w = jnp.asarray(dens.reshape(-1), jnp.float32)
    # ray along +x through the center
    pos = jnp.asarray([[-2.0, 1e-5, 1e-5]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    total = _march_total(g, pos, d, weight=w)
    rb = np.linspace(0, 1, 13)
    expect = 2.0 * np.sum((np.arange(12) + 1.0) * np.diff(rb))
    assert total[0] == pytest.approx(expect, rel=1e-3)


def test_polar_grids_locate_centers():
    """locate(cell_centers()) is the identity for all three grids."""
    for g in (polar.make_sphere2d(1.0, 5, 4),
              polar.make_sphere3d(1.0, 4, 3, 5),
              polar.make_cylinder3d(1.0, -1.0, 1.0, 4, 5, 3)):
        cells = np.asarray(g.locate(g.cell_centers()))
        np.testing.assert_array_equal(cells, np.arange(g.ncells))


def test_sphere2d_transport_matches_sphere1d():
    """A spherically symmetric problem must give the same observed SED on
    Sphere2D as on Sphere1D (same physics, redundant theta axis)."""
    from skirt9_tpu.grids.sphere import make_sphere1d
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    R = PC
    sigma = 1e-24
    results = []
    for grid in (make_sphere1d(1.1 * R, 24),
                 polar.make_sphere2d(1.1 * R, 24, 6)):
        nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.9 * R)
        med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                               sigma_ext=np.full((1, 2), sigma),
                               albedo=np.full((1, 2), 0.4),
                               g=np.full((1, 2), 0.3))
        inst = dinst.DistantInstrumentCfg(name="i0",
                                          wave_borders=(0.5e-6, 0.6e-6),
                                          distance=100 * PC)
        sim = Simulation(
            grid=grid, medium=med,
            sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
            instruments=[inst],
            options=lc.TransportOptions(max_steps=grid.max_steps(),
                                        max_events=6),
            num_packets=8192, batch_size=4096, seed=2)
        _, accs = sim.run_primary(verbose=False)
        sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
        results.append((float(np.sum(sed["primarydirect"])),
                        float(np.sum(sed["primaryscattered"]))))
    (d1, s1), (d2, s2) = results
    assert d2 == pytest.approx(d1, rel=0.02)
    assert s2 == pytest.approx(s1, rel=0.15)  # MC noise on scattered flux
