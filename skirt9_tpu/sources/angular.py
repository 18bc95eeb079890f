"""Angular emission distributions for anisotropic primary sources
(ref: SKIRT/core/AngularDistribution.hpp hierarchy: Isotropic, Laser,
Conical, Netzer).

Each distribution supplies `sample_direction(keys, tag)` for launch and
`phase(kobs)` — the emission probability per steradian toward an observer —
for emission peel-off (ref: MonteCarloSimulation::peelOffEmission :617,
which multiplies the per-packet luminosity by this factor).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng, sampling


def _frame(axis):
    """Orthonormal frame (a, t1, t2) around a unit axis (host)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    helper = np.array([1.0, 0.0, 0.0]) if abs(a[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    t1 = np.cross(a, helper)
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(a, t1)
    return a, t1, t2


def _dir_from_mu(keys, tag, axis, mu):
    """Direction at polar cosine mu around axis with uniform azimuth."""
    a, t1, t2 = _frame(axis)
    phi = 2 * jnp.pi * rng.uniform(keys, tag + 7)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
    return (mu[..., None] * jnp.asarray(a, jnp.float32)
            + (st * jnp.cos(phi))[..., None] * jnp.asarray(t1, jnp.float32)
            + (st * jnp.sin(phi))[..., None] * jnp.asarray(t2, jnp.float32))


@dataclasses.dataclass(frozen=True)
class IsotropicAngularDistribution:
    """ref: SKIRT/core/IsotropicAngularDistribution.hpp"""

    def sample_direction(self, keys, tag):
        return rng.isotropic_direction(keys, tag)

    def phase(self, kobs):
        return 1.0 / (4.0 * jnp.pi)


@dataclasses.dataclass(frozen=True)
class LaserAngularDistribution:
    """All packets along +axis; the delta distribution contributes zero to
    any off-axis peel-off (ref: SKIRT/core/LaserAngularDistribution.hpp)."""

    axis: tuple = (0.0, 0.0, 1.0)

    def sample_direction(self, keys, tag):
        B = keys.shape[0]
        a = np.asarray(self.axis, np.float64)
        a = a / np.linalg.norm(a)
        return jnp.broadcast_to(jnp.asarray(a, jnp.float32), (B, 3))

    def phase(self, kobs):
        return jnp.float32(0.0)


@dataclasses.dataclass(frozen=True)
class ConicalAngularDistribution:
    """Uniform emission inside the double cone of half-opening delta around
    +-axis (ref: SKIRT/core/ConicalAngularDistribution.hpp)."""

    axis: tuple = (0.0, 0.0, 1.0)
    delta: float = 0.5

    def sample_direction(self, keys, tag):
        u = rng.uniform(keys, tag)
        mu = 1.0 - u * (1.0 - np.cos(self.delta))
        sgn = jnp.where(rng.uniform(keys, tag + 3) < 0.5, 1.0, -1.0)
        return _dir_from_mu(keys, tag, self.axis, mu * sgn)

    def phase(self, kobs):
        a = np.asarray(self.axis, np.float64)
        a = a / np.linalg.norm(a)
        mu = jnp.abs(jnp.sum(kobs * jnp.asarray(a, jnp.float32), axis=-1))
        inside = mu >= np.cos(self.delta)
        return jnp.where(inside, 1.0 / (4 * jnp.pi * (1 - np.cos(self.delta))),
                         0.0)


@dataclasses.dataclass(frozen=True)
class NetzerAngularDistribution:
    """AGN accretion-disk anisotropy p(mu) = 3/(14 pi) |mu| (1 + 2|mu|)
    (Netzer 1987; ref: SKIRT/core/NetzerAngularDistribution.hpp)."""

    axis: tuple = (0.0, 0.0, 1.0)

    def _mu_tables(self):
        t = getattr(self, "_tables", None)
        if t is None:
            mu = np.linspace(0.0, 1.0, 1024)
            w = mu * (1.0 + 2.0 * mu)
            cdf, _ = sampling.cdf_linlin(mu, w)
            t = (jnp.asarray(mu, jnp.float32), jnp.asarray(cdf, jnp.float32))
            object.__setattr__(self, "_tables", t)
        return t

    def sample_direction(self, keys, tag):
        mu_t, cdf = self._mu_tables()
        u = rng.uniform(keys, tag)
        mu = sampling.sample_cdf_linlin(u, mu_t, cdf)
        sgn = jnp.where(rng.uniform(keys, tag + 3) < 0.5, 1.0, -1.0)
        return _dir_from_mu(keys, tag, self.axis, mu * sgn)

    def phase(self, kobs):
        a = np.asarray(self.axis, np.float64)
        a = a / np.linalg.norm(a)
        mu = jnp.abs(jnp.sum(kobs * jnp.asarray(a, jnp.float32), axis=-1))
        return 3.0 / (14.0 * jnp.pi) * mu * (1.0 + 2.0 * mu)
