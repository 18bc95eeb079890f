"""Tetrahedral grid: build, locate, traversal, transport consistency.

(ref: TetraMeshSpatialGrid.cpp:388-407 Delaunay build + face-exit walk)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.grids.tetra import build_tetra


def make_grid(n_sites=300, seed=4):
    rs = np.random.default_rng(seed)
    sites = rs.uniform(-1, 1, (n_sites, 3))
    return build_tetra(sites, ((-1, 1), (-1, 1), (-1, 1)), lookup_res=16)


def test_volumes_tile_box_exactly():
    g = make_grid()
    assert g.volumes().sum() == pytest.approx(8.0, rel=1e-6)
    assert (g.volumes() > 0).all()


def test_locate_matches_scipy():
    g = make_grid(n_sites=200, seed=1)
    rs = np.random.default_rng(0)
    pos = rs.uniform(-0.99, 0.99, (500, 3)).astype(np.float32)
    got = np.asarray(g.locate(jnp.asarray(pos)))
    # validate geometrically: the point satisfies the located cell's four
    # face-plane inequalities (up to the f32 walk tolerance)
    s = np.asarray(g._signed(jnp.asarray(np.maximum(got, 0)),
                             jnp.asarray(pos)))
    assert (s.max(axis=1) < 1e-4).mean() > 0.995
    out = np.asarray(g.locate(jnp.asarray([[1.5, 0, 0]], jnp.float32)))
    assert out[0] == -1


def test_traversal_accumulates_chord():
    """Stepping from a boundary entry accumulates the full chord length and
    the step midpoints lie in the claimed cells."""
    g = make_grid(n_sites=150, seed=7)
    rs = np.random.default_rng(3)
    B = 128
    pos = rs.uniform(-0.95, 0.95, (B, 3)).astype(np.float32)
    d = rs.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)

    p = jnp.asarray(pos)
    dirn = jnp.asarray(d)
    cell = g.locate(p)
    total = jnp.zeros(B)
    ok_mid = []
    for _ in range(g.max_steps()):
        ds, nxt, p2 = g.step(p, dirn, cell)
        mid = p + 0.5 * ds[:, None] * dirn
        mid_cell = g.locate(mid)
        ok_mid.append(np.asarray((mid_cell == cell) | (cell < 0) | (ds == 0)))
        total = total + jnp.where(cell >= 0, ds, 0.0)
        p, cell = p2, nxt
    assert np.mean(ok_mid) > 0.95

    pos_n, d_n = pos.astype(np.float64), d.astype(np.float64)
    with np.errstate(divide="ignore"):
        t1 = (-1 - pos_n) / d_n
        t2 = (1 - pos_n) / d_n
    tmax = np.min(np.maximum(t1, t2), axis=-1)
    np.testing.assert_allclose(np.asarray(total), tmax, rtol=5e-3)


def test_transport_on_tetra_matches_cartesian():
    """Uniform-sphere problem on a tetra grid agrees with Cartesian."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    R, box = PC, 1.2 * PC
    sigma = 1e-24

    def run(grid, max_steps):
        centers = np.asarray(grid.cell_centers(), np.float64)
        r = np.linalg.norm(centers, axis=-1)
        nd = np.where(r <= R, 1.0 / (sigma * R), 0.0).astype(np.float32)
        med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                               np.array([[sigma, sigma]]),
                               np.full((1, 2), 0.4), np.full((1, 2), 0.3))
        inst = dinst.DistantInstrumentCfg(name="i",
                                          wave_borders=(0.5e-6, 0.6e-6),
                                          distance=100 * PC)
        opts = lc.TransportOptions(max_steps=max_steps, max_events=12)
        sim = Simulation(grid=grid, medium=med,
                         sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                         instruments=[inst], options=opts, rf_borders=None,
                         num_packets=8192, batch_size=4096, seed=3)
        _, accs = sim.run_primary(verbose=False)
        return dinst.calibrate_sed(inst, jax.device_get(accs[0]))

    cart = run(make_cartesian(((-box, box),) * 3, (16,) * 3), 51)
    rs = np.random.default_rng(8)
    sites = rs.uniform(-box, box, (3000, 3))
    tet = build_tetra(sites, ((-box, box),) * 3, lookup_res=16)
    tg = run(tet, tet.max_steps())
    for k in ("transparent", "primarydirect", "primaryscattered"):
        assert tg[k][0] == pytest.approx(cart[k][0], rel=0.08), k
