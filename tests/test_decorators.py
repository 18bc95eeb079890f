"""Geometry decorators: mass conservation and coordinate transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.geometries.analytic import PlummerGeometry, UniformSphereGeometry
from skirt9_tpu.geometries import decorators as dec
from skirt9_tpu.ops import rng


def mc_mass(geom, extent=3.0, n=48):
    x = np.linspace(-extent, extent, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    pos = np.stack([X, Y, Z], -1).reshape(-1, 3)
    rho = geom.density_np(pos)
    dv = (x[1] - x[0]) ** 3
    return rho.sum() * dv


def sample_pts(geom, n=20000, seed=0):
    keys = rng.history_keys(jax.random.PRNGKey(seed), jnp.arange(n))
    return np.asarray(geom.sample(keys), np.float64)


def test_offset():
    g = dec.OffsetDecorator(PlummerGeometry(b=0.3), offset=(1.0, 0, 0))
    assert mc_mass(g) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    assert pts[:, 0].mean() == pytest.approx(1.0, abs=0.05)


def test_rotate_mass_and_alignment():
    base = dec.SpheroidalDecorator(PlummerGeometry(b=0.4), q=0.3)
    g = dec.RotateDecorator(base, beta=np.pi / 2)  # flatten along x now
    assert mc_mass(g) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    # flattened axis rotated from z to x
    assert pts[:, 0].std() < 0.5 * pts[:, 2].std()


def test_spheroidal_flattening():
    g = dec.SpheroidalDecorator(PlummerGeometry(b=0.4), q=0.25)
    # flattened core needs finer sampling for the mass integral
    assert mc_mass(g, n=96) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    # robust width ratio (Plummer tails make std noisy)
    iqr = lambda a: np.subtract(*np.percentile(a, [75, 25]))
    assert iqr(pts[:, 2]) == pytest.approx(0.25 * iqr(pts[:, 0]), rel=0.1)


def test_clip_sphere():
    base = UniformSphereGeometry(rmax=1.0)
    g = dec.SphereClipDecorator(base, remove_inside=True,
                                center=(0, 0, 0), radius=0.5)
    # inner 1/8 of the volume removed, mass renormalized to 1
    assert mc_mass(g, extent=1.2, n=64) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g, n=5000)
    r = np.linalg.norm(pts, axis=-1)
    assert (r > 0.499).all()
    d = g.density_np(np.array([[0.0, 0, 0.75], [0, 0, 0.25]]))
    assert d[0] > 0 and d[1] == 0


def test_combine():
    g = dec.CombineDecorator(
        dec.OffsetDecorator(PlummerGeometry(b=0.2), offset=(1, 0, 0)),
        dec.OffsetDecorator(PlummerGeometry(b=0.2), offset=(-1, 0, 0)),
        w1=3.0, w2=1.0)
    assert mc_mass(g) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    frac_right = (pts[:, 0] > 0).mean()
    assert frac_right == pytest.approx(0.75, abs=0.02)


def test_clumpy():
    g = dec.ClumpyDecorator(PlummerGeometry(b=0.5), clump_fraction=0.4,
                            num_clumps=30, clump_radius=0.08)
    assert mc_mass(g, extent=4.0, n=72) == pytest.approx(1.0, rel=0.1)
    pts = sample_pts(g, n=30000)
    # clumped positions cluster near the fixed clump centers
    from scipy.spatial import cKDTree
    t = cKDTree(g._centers)
    d, _ = t.query(pts)
    assert (d < 0.08).mean() == pytest.approx(0.4, abs=0.06)
