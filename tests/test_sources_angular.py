"""Anisotropic angular distributions + surface sources
(ref: SKIRT/core/AngularDistribution.hpp family, *BackgroundSource,
StellarSurfaceSource)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.ops import rng
from skirt9_tpu.sources import angular as ang
from skirt9_tpu.sources import background as bg


def _keys(B, seed=0):
    hk = rng.history_keys(jax.random.PRNGKey(seed),
                          jnp.arange(B, dtype=jnp.int32))
    return rng.event_keys(hk, rng.LAUNCH_EVENT)


def _phase_integral(dist):
    """Monte Carlo estimate of the solid-angle integral of phase()."""
    n = 40000
    k = np.random.default_rng(1).normal(size=(n, 3))
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    ph = np.asarray(dist.phase(jnp.asarray(k, jnp.float32)))
    return 4 * np.pi * ph.mean()


@pytest.mark.parametrize("dist", [
    ang.IsotropicAngularDistribution(),
    ang.ConicalAngularDistribution(delta=0.6),
    ang.NetzerAngularDistribution(),
], ids=lambda d: type(d).__name__)
def test_phase_normalized(dist):
    assert abs(_phase_integral(dist) - 1.0) < 0.03


@pytest.mark.parametrize("dist", [
    ang.ConicalAngularDistribution(delta=0.6),
    ang.NetzerAngularDistribution(axis=(0.0, 0.0, 1.0)),
], ids=lambda d: type(d).__name__)
def test_sampling_matches_phase(dist):
    B = 40000
    d = np.asarray(dist.sample_direction(_keys(B), rng.LAUNCH_DIRECTION))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    mu = np.abs(d[:, 2])
    # expected <|mu|> from the phase function by MC over the sphere
    n = 200000
    k = np.random.default_rng(2).normal(size=(n, 3))
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    ph = np.asarray(dist.phase(jnp.asarray(k, jnp.float32)))
    exp_mu = (np.abs(k[:, 2]) * ph).sum() / ph.sum()
    assert abs(mu.mean() - exp_mu) < 0.02


def test_laser():
    d = ang.LaserAngularDistribution(axis=(0, 1, 0))
    k = np.asarray(d.sample_direction(_keys(64), rng.LAUNCH_DIRECTION))
    assert np.allclose(k, [0, 1, 0], atol=1e-6)
    assert float(d.phase(jnp.asarray([0.0, 1.0, 0.0]))) == 0.0


@pytest.mark.parametrize("src_cls,inward", [
    (bg.SphericalBackgroundSource, True),
    (bg.StellarSurfaceSource, False),
    (bg.CubicalBackgroundSource, True),
])
def test_surface_sources(src_cls, inward):
    s = src_cls(luminosity=2.0)
    tabs = s.tables()
    B = 20000
    keys = _keys(B)
    f = s.launch(tabs, keys, B)
    pos = np.asarray(f["pos"])
    d = np.asarray(f["dir"])
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(f["lum"]).sum(), 2.0, rtol=1e-4)
    n_out = np.asarray(s._outward_normal_at(jnp.asarray(pos)))
    mu = (d * n_out).sum(-1) * (-1.0 if inward else 1.0)
    assert (mu > 0).all()                       # correct hemisphere
    assert abs(mu.mean() - 2.0 / 3.0) < 0.02    # cosine law <mu> = 2/3
    # emission_phase integrates to 1 over the sphere per packet
    n = 5000
    k = np.random.default_rng(3).normal(size=(n, 3))
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    ph = np.stack([np.asarray(s.emission_phase(jnp.asarray(kk, jnp.float32),
                                               jnp.asarray(pos[:64])))
                   for kk in k[:2000]])
    integ = 4 * np.pi * ph.mean(axis=0)
    assert abs(integ.mean() - 1.0) < 0.02
    assert np.abs(integ - 1.0).max() < 0.15
