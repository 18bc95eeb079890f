"""Axial + added spherical geometries: normalization and sampling
consistency (sampled positions follow density_np)."""

import numpy as np
import jax
import pytest

from skirt9_tpu.geometries import analytic as ga
from skirt9_tpu.geometries import axial as ax
from skirt9_tpu.ops import rng

GEOMS = [
    ga.EinastoGeometry(rs=2.0),
    ga.PseudoSersicGeometry(),
    ga.UniformBoxGeometry(lx=2.0, ly=1.0, lz=0.5),
    ga.MultiGaussianExpansionGeometry(components=((0.7, 1.0, 0.5),
                                                  (0.3, 2.0, 1.0))),
    ax.TorusGeometry(),
    ax.ConicalShellGeometry(),
    ax.TTauriDiskGeometry(),
    ax.RingGeometry(),
    ax.AnnulusGeometry(),
    ax.DonutGeometry(),
    ax.BrokenExpDiskGeometry(),
    ax.ParaboloidGeometry(),
    ax.ParaboloidShellGeometry(),
    ax.HyperboloidGeometry(),
    ax.HyperboloidShellGeometry(),
]


@pytest.mark.parametrize("geo", GEOMS, ids=lambda g: type(g).__name__)
def test_normalized(geo):
    n = 128
    if hasattr(geo, "bounds"):
        Rm, zm = geo.bounds()
        L = max(Rm, zm)
    elif isinstance(geo, ga.UniformBoxGeometry):
        L = 1.2
    elif isinstance(geo, ga.MultiGaussianExpansionGeometry):
        L = 10.0
    else:
        L = geo.rmax
    xs = np.linspace(-L, L, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    rho = geo.density_np(np.stack([X, Y, Z], -1))
    mass = rho.sum() * (xs[1] - xs[0]) ** 3
    tol = 0.25 if isinstance(geo, ga.PseudoSersicGeometry) else 0.08
    assert abs(mass - 1.0) < tol


@pytest.mark.parametrize("geo", [ax.TorusGeometry(), ax.AnnulusGeometry(),
                                 ax.RingGeometry(),
                                 ga.UniformBoxGeometry(lx=2.0, ly=1.0, lz=0.5)],
                         ids=lambda g: type(g).__name__)
def test_sampling_matches_density(geo):
    B = 20000
    import jax.numpy as jnp
    hkeys = rng.history_keys(jax.random.PRNGKey(3),
                             jnp.arange(B, dtype=jnp.int32))
    keys = rng.event_keys(hkeys, rng.LAUNCH_EVENT)
    pos = np.asarray(geo.sample(keys))
    assert np.isfinite(pos).all()
    # samples must lie where density > 0 (allow sub-cell leakage at edges)
    rho = geo.density_np(pos)
    assert (rho > 0).mean() > 0.97
    # first moments of |z| and R agree with density-weighted grid estimates
    n = 96
    if hasattr(geo, "bounds"):
        Rm, zm = geo.bounds()
        L = max(Rm, zm)
    else:
        L = 1.2
    xs = np.linspace(-L, L, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    grid = np.stack([X, Y, Z], -1)
    w = geo.density_np(grid).ravel()
    w = w / w.sum()
    Rg = np.hypot(grid[..., 0], grid[..., 1]).ravel()
    zg = np.abs(grid[..., 2]).ravel()
    R_s = np.hypot(pos[:, 0], pos[:, 1]).mean()
    z_s = np.abs(pos[:, 2]).mean()
    assert abs(R_s - (w * Rg).sum()) < 0.08 * max((w * Rg).sum(), 0.1)
    assert abs(z_s - (w * zg).sum()) < 0.08 * max((w * zg).sum(), 0.1)
