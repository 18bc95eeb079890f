"""Surface-emitting specialty sources: inward-radiating backgrounds and the
outward-radiating stellar surface
(ref: SKIRT/core/SphericalBackgroundSource.hpp,
CubicalBackgroundSource.hpp, StellarSurfaceSource.hpp).

Positions are uniform on the emitting surface; directions follow the cosine
law around the local (inward or outward) normal, matching the reference's
surface-launch convention.  These sources define `emission_phase(kobs, pos)`
— the per-packet emission probability per steradian toward an observer —
which the life cycle uses in emission peel-off (the phase depends on the
packet's local surface normal).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from .base import TabulatedSED, _sample_wavelength


def _cosine_direction(keys, tag, normal):
    """Cosine-law direction around per-packet unit normals (B,3)."""
    u1, u2 = rng.uniform2(keys, tag)
    ct = jnp.sqrt(u1)                      # p(theta) ~ cos(theta) sin(theta)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    phi = 2 * jnp.pi * u2
    helper = jnp.where(jnp.abs(normal[..., :1]) < 0.9,
                       jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                       jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    t1 = jnp.cross(normal, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-30)
    t2 = jnp.cross(normal, t1)
    return (ct[..., None] * normal
            + (st * jnp.cos(phi))[..., None] * t1
            + (st * jnp.sin(phi))[..., None] * t2)


def _cosine_phase(kobs, normal):
    """Probability per sr of the cosine law toward kobs: cos/pi (per packet),
    divided by the 1x surface-average normalization the reference applies."""
    B = normal.shape[0]
    k = jnp.broadcast_to(kobs, (B, 3))
    mu = jnp.sum(k * normal, axis=-1)
    return jnp.where(mu > 0, mu / jnp.pi, 0.0)


@dataclasses.dataclass(frozen=True)
class _SurfaceSource:
    luminosity: float = 1.0
    lam0: float = 0.55e-6
    sed: TabulatedSED | None = None
    wavelength_bias: float = 0.5

    def tables(self) -> dict:
        t = {}
        if self.sed is not None:
            t["sed"] = self.sed.tables()
        return t

    def _surface_point(self, keys):  # -> (pos, outward normal)
        raise NotImplementedError

    def _normal_sign(self) -> float:
        raise NotImplementedError    # +1 outward emission, -1 inward

    def launch(self, tabs: dict, keys: jax.Array, n_total: int) -> dict:
        pos, n_out = self._surface_point(keys)
        normal = self._normal_sign() * n_out
        dirn = _cosine_direction(keys, rng.LAUNCH_DIRECTION, normal)
        lum = jnp.full((keys.shape[0],), self.luminosity / n_total, jnp.float32)
        lam, lum = _sample_wavelength(
            tabs, keys, lum, self.sed, self.lam0, self.wavelength_bias)
        return {"lam": lam, "lum": lum, "pos": pos, "dir": dirn}

    def emission_phase(self, kobs, pos):
        normal = self._normal_sign() * self._outward_normal_at(pos)
        return _cosine_phase(kobs, normal)

    def _outward_normal_at(self, pos):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class SphericalBackgroundSource(_SurfaceSource):
    """Inward cosine-law emission from a sphere of radius r
    (ref: SKIRT/core/SphericalBackgroundSource.hpp)."""

    radius: float = 1.0
    center: tuple = (0.0, 0.0, 0.0)

    def _surface_point(self, keys):
        n = rng.isotropic_direction(keys, rng.LAUNCH_POSITION)
        c = jnp.asarray(np.asarray(self.center), jnp.float32)
        # nudge inside so the launch cell is interior to the surface
        return c + (self.radius * (1.0 - 1e-5)) * n, n

    def _normal_sign(self):
        return -1.0

    def _outward_normal_at(self, pos):
        c = jnp.asarray(np.asarray(self.center), jnp.float32)
        d = pos - c
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30)


@dataclasses.dataclass(frozen=True)
class StellarSurfaceSource(SphericalBackgroundSource):
    """Outward cosine-law emission from a stellar surface
    (ref: SKIRT/core/StellarSurfaceSource.hpp)."""

    def _surface_point(self, keys):
        n = rng.isotropic_direction(keys, rng.LAUNCH_POSITION)
        c = jnp.asarray(np.asarray(self.center), jnp.float32)
        return c + (self.radius * (1.0 + 1e-5)) * n, n

    def _normal_sign(self):
        return 1.0


@dataclasses.dataclass(frozen=True)
class CubicalBackgroundSource(_SurfaceSource):
    """Inward cosine-law emission from the surface of an axis-aligned cube
    (ref: SKIRT/core/CubicalBackgroundSource.hpp)."""

    edge: float = 2.0
    center: tuple = (0.0, 0.0, 0.0)

    def _surface_point(self, keys):
        B = keys.shape[0]
        u1, u2 = rng.uniform2(keys, rng.LAUNCH_POSITION)
        uf = rng.uniform(keys, rng.LAUNCH_POSITION + 3)
        face = jnp.clip((uf * 6).astype(jnp.int32), 0, 5)
        axis = face // 2
        sign = jnp.where(face % 2 == 0, 1.0, -1.0)
        h = self.edge / 2
        a = (u1 - 0.5) * self.edge
        b = (u2 - 0.5) * self.edge
        # build (B,3): coordinate `axis` = sign*h, others = (a, b)
        outn = jnp.stack([jnp.where(axis == 0, sign, 0.0),
                          jnp.where(axis == 1, sign, 0.0),
                          jnp.where(axis == 2, sign, 0.0)], axis=-1)
        px = jnp.where(axis == 0, sign * h, jnp.where(axis == 1, a, a))
        py = jnp.where(axis == 0, a, jnp.where(axis == 1, sign * h, b))
        pz = jnp.where(axis == 0, b, jnp.where(axis == 1, b, sign * h))
        pos = jnp.stack([px, py, pz], axis=-1) * (1.0 - 1e-5)
        c = jnp.asarray(np.asarray(self.center), jnp.float32)
        return c + pos, outn

    def _normal_sign(self):
        return -1.0

    def _outward_normal_at(self, pos):
        c = jnp.asarray(np.asarray(self.center), jnp.float32)
        d = pos - c
        ax = jnp.argmax(jnp.abs(d), axis=-1)
        sgn = jnp.sign(jnp.take_along_axis(d, ax[:, None], 1)[:, 0])
        return jnp.stack([jnp.where(ax == 0, sgn, 0.0),
                          jnp.where(ax == 1, sgn, 0.0),
                          jnp.where(ax == 2, sgn, 0.0)], axis=-1)
