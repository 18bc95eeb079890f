"""Analytic geometries: normalized density profiles + position sampling.

Counterpart of the reference's Geometry hierarchy (ref:
SKIRT/core/Geometry.hpp:21 — ~45 concrete profiles + decorators). Contract
per geometry (matching the reference's):

  density(pos (N,3)) -> (N,) normalized density [1/m^3], total mass = 1
  sample(keys, tag) -> (B,3) random positions distributed as density
  (host) density_np(pos) for medium-state construction at setup

Sampling is inverse-cdf on the analytic radial/vertical profiles, batched on
device; decorators (offset/rotate/clip/...) are in geometries/decorators.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng, sampling


class Geometry:
    """Base: subclasses implement density_np and sample."""

    def density_np(self, pos: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def sample(self, keys: jax.Array, tag: int = rng.LAUNCH_POSITION) -> jax.Array:
        raise NotImplementedError


def _radial_cdf_tables(rho_of_r, rmax: float, n: int = 4096):
    """Host-built cdf of 4 pi r^2 rho(r) for spherical profiles."""
    r = np.linspace(0.0, rmax, n)
    w = 4 * np.pi * r**2 * rho_of_r(np.maximum(r, rmax * 1e-9))
    cdf, total = sampling.cdf_linlin(r, w)
    return jnp.asarray(r, jnp.float32), jnp.asarray(cdf, jnp.float32), total


@dataclasses.dataclass(frozen=True)
class SphericalProfileGeometry(Geometry):
    """Generic spherical geometry from a radial profile; concrete profiles
    below supply rho(r) with unit total mass."""

    rmax: float

    def rho(self, r: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def density_np(self, pos: np.ndarray) -> np.ndarray:
        r = np.linalg.norm(np.asarray(pos, np.float64), axis=-1)
        out = self.rho(np.maximum(r, self.rmax * 1e-12))
        return np.where(r <= self.rmax, out, 0.0)

    def __post_init__(self):
        object.__setattr__(self, "_tables", None)

    def _get_tables(self):
        t = getattr(self, "_tables", None)
        if t is None:
            t = _radial_cdf_tables(self.rho, self.rmax)
            object.__setattr__(self, "_tables", t)
        return t

    def sample(self, keys, tag: int = rng.LAUNCH_POSITION) -> jax.Array:
        rv, cdf, _ = self._get_tables()
        u = rng.uniform(keys, tag)
        r = sampling.sample_cdf_linlin(u, rv, cdf)
        d = rng.isotropic_direction(keys, tag + 50)
        return r[..., None] * d


@dataclasses.dataclass(frozen=True)
class PlummerGeometry(SphericalProfileGeometry):
    """rho(r) = 3/(4 pi b^3) (1+r^2/b^2)^-5/2 (ref: PlummerGeometry)."""

    b: float = 1.0
    rmax: float = 0.0

    def __post_init__(self):
        if self.rmax == 0.0:
            object.__setattr__(self, "rmax", 20.0 * self.b)
        super().__post_init__()

    def rho(self, r):
        return 3.0 / (4 * np.pi * self.b**3) * (1 + (r / self.b) ** 2) ** -2.5


@dataclasses.dataclass(frozen=True)
class GammaGeometry(SphericalProfileGeometry):
    """Dehnen/gamma profile rho ~ (r/b)^-gamma (1+r/b)^(gamma-4)
    (ref: GammaGeometry)."""

    b: float = 1.0
    gamma: float = 1.0
    rmax: float = 0.0

    def __post_init__(self):
        if self.rmax == 0.0:
            object.__setattr__(self, "rmax", 50.0 * self.b)
        super().__post_init__()

    def rho(self, r):
        x = r / self.b
        norm = (3.0 - self.gamma) / (4 * np.pi * self.b**3)
        return norm * x**-self.gamma * (1 + x) ** (self.gamma - 4.0)


@dataclasses.dataclass(frozen=True)
class ShellGeometry(SphericalProfileGeometry):
    """Power-law shell rho ~ r^-p for rmin<r<rmax (ref: ShellGeometry);
    the geometry of the Ivezic benchmark problem."""

    rmin: float = 0.5
    rmax: float = 1.0
    p: float = 0.0

    def rho(self, r):
        if abs(self.p - 3.0) > 1e-12:
            integral = 4 * np.pi * (self.rmax ** (3 - self.p) - self.rmin ** (3 - self.p)) / (3 - self.p)
        else:
            integral = 4 * np.pi * np.log(self.rmax / self.rmin)
        out = np.where((r >= self.rmin) & (r <= self.rmax), r ** -self.p, 0.0)
        return out / integral


@dataclasses.dataclass(frozen=True)
class UniformSphereGeometry(SphericalProfileGeometry):
    """Constant density inside rmax."""

    rmax: float = 1.0

    def rho(self, r):
        v = 4.0 / 3.0 * np.pi * self.rmax**3
        return np.where(r <= self.rmax, 1.0 / v, 0.0)


@dataclasses.dataclass(frozen=True)
class GaussianGeometry(SphericalProfileGeometry):
    """Spherical Gaussian with dispersion sigma (ref: GaussianGeometry)."""

    sigma: float = 1.0
    rmax: float = 0.0

    def __post_init__(self):
        if self.rmax == 0.0:
            object.__setattr__(self, "rmax", 8.0 * self.sigma)
        super().__post_init__()

    def rho(self, r):
        s = self.sigma
        return (2 * np.pi * s**2) ** -1.5 * np.exp(-(r**2) / (2 * s**2))


@dataclasses.dataclass(frozen=True)
class ExpDiskGeometry(Geometry):
    """Double-exponential disk rho ~ exp(-R/hR) exp(-|z|/hz)
    (ref: ExpDiskGeometry), optional inner/outer truncation ignored for now."""

    h_r: float = 1.0
    h_z: float = 0.2

    def density_np(self, pos: np.ndarray) -> np.ndarray:
        pos = np.asarray(pos, np.float64)
        R = np.hypot(pos[..., 0], pos[..., 1])
        z = np.abs(pos[..., 2])
        norm = 1.0 / (4 * np.pi * self.h_r**2 * self.h_z)
        return norm * np.exp(-R / self.h_r - z / self.h_z)

    def sample(self, keys, tag: int = rng.LAUNCH_POSITION) -> jax.Array:
        # R from Gamma(2, hR): inverse-cdf of x e^-x via tabulated cdf
        x = np.linspace(0, 30, 4096)
        cdf, _ = sampling.cdf_linlin(x, x * np.exp(-x))
        u1 = rng.uniform(keys, tag)
        R = self.h_r * sampling.sample_cdf_linlin(
            u1, jnp.asarray(x, jnp.float32), jnp.asarray(cdf, jnp.float32))
        u2, u3 = rng.uniform2(keys, tag + 50)
        phi = 2 * jnp.pi * u2
        # z: double exponential (Laplace) inverse cdf
        z = -self.h_z * jnp.sign(u3 - 0.5) * jnp.log1p(-2 * jnp.abs(u3 - 0.5))
        return jnp.stack([R * jnp.cos(phi), R * jnp.sin(phi), z], axis=-1)


@dataclasses.dataclass(frozen=True)
class SersicGeometry(SphericalProfileGeometry):
    """Spherical Sersic profile of index m via the Prugniel-Simien
    approximation of the deprojected density (ref: SersicGeometry,
    SKIRT/utils/SersicFunction)."""

    reff: float = 1.0
    m: float = 4.0
    rmax: float = 0.0

    def __post_init__(self):
        if self.rmax == 0.0:
            object.__setattr__(self, "rmax", 40.0 * self.reff)
        super().__post_init__()

    def rho(self, r):
        m = self.m
        b = 2 * m - 1.0 / 3.0 + 4.0 / (405 * m) + 46.0 / (25515 * m**2)
        p = 1.0 - 0.6097 / m + 0.05463 / m**2
        x = np.maximum(r / self.reff, 1e-12)
        rho = x**-p * np.exp(-b * x ** (1.0 / m))
        # normalize numerically
        rr = np.geomspace(1e-6, self.rmax / self.reff, 2048)
        w = 4 * np.pi * rr**2 * rr**-p * np.exp(-b * rr ** (1.0 / m))
        norm = np.trapezoid(w, rr) * self.reff**3
        return rho / norm


@dataclasses.dataclass(frozen=True)
class PointGeometry(Geometry):
    """Delta function at the origin (sources only)."""

    def density_np(self, pos):
        return np.zeros(np.asarray(pos).shape[:-1])

    def sample(self, keys, tag: int = rng.LAUNCH_POSITION) -> jax.Array:
        B = keys.shape[0]
        return jnp.zeros((B, 3), jnp.float32)


@dataclasses.dataclass(frozen=True)
class EinastoGeometry(SphericalProfileGeometry):
    """Einasto profile rho ~ exp(-2n ((r/rs)^(1/n) - 1))
    (ref: SKIRT/core/EinastoGeometry.hpp)."""

    rs: float = 1.0
    n: float = 5.0
    rmax: float = 0.0

    def __post_init__(self):
        if self.rmax == 0.0:
            object.__setattr__(self, "rmax", 30.0 * self.rs)
        super().__post_init__()

    def rho(self, r):
        x = np.maximum(r / self.rs, 1e-12)
        raw = np.exp(-2 * self.n * (x ** (1.0 / self.n) - 1.0))
        rr = np.geomspace(1e-6, self.rmax / self.rs, 2048)
        w = 4 * np.pi * rr**2 * np.exp(-2 * self.n * (rr ** (1.0 / self.n) - 1.0))
        norm = np.trapezoid(w, rr) * self.rs**3
        return raw / norm


@dataclasses.dataclass(frozen=True)
class PseudoSersicGeometry(SphericalProfileGeometry):
    """Pseudo-Sersic (Prugniel-Simien 1997) spherical profile
    (ref: SKIRT/core/PseudoSersicGeometry.hpp)."""

    reff: float = 1.0
    m: float = 4.0
    rmax: float = 0.0

    def __post_init__(self):
        if self.rmax == 0.0:
            object.__setattr__(self, "rmax", 40.0 * self.reff)
        super().__post_init__()

    def rho(self, r):
        m = self.m
        bn = 2 * m - 1.0 / 3.0 + 4.0 / (405 * m) + 46.0 / (25515 * m**2)
        pn = 1.0 - 0.6097 / m + 0.05463 / m**2
        x = np.maximum(r / self.reff, 1e-12)
        raw = x**-pn * np.exp(-bn * x ** (1.0 / m))
        rr = np.geomspace(1e-6, self.rmax / self.reff, 2048)
        w = 4 * np.pi * rr**2 * rr**-pn * np.exp(-bn * rr ** (1.0 / m))
        norm = np.trapezoid(w, rr) * self.reff**3
        return raw / norm


@dataclasses.dataclass(frozen=True)
class UniformBoxGeometry(Geometry):
    """Constant density inside an axis-aligned box
    (ref: SKIRT/core/UniformBoxGeometry.hpp)."""

    lx: float = 1.0
    ly: float = 1.0
    lz: float = 1.0
    cx: float = 0.0
    cy: float = 0.0
    cz: float = 0.0

    def density_np(self, pos):
        pos = np.asarray(pos, np.float64)
        c = np.array([self.cx, self.cy, self.cz])
        half = 0.5 * np.array([self.lx, self.ly, self.lz])
        inside = np.all(np.abs(pos - c) <= half, axis=-1)
        return np.where(inside, 1.0 / (self.lx * self.ly * self.lz), 0.0)

    def sample(self, keys, tag: int = rng.LAUNCH_POSITION) -> jax.Array:
        u1, u2 = rng.uniform2(keys, tag)
        u3 = rng.uniform(keys, tag + 50)
        c = jnp.array([self.cx, self.cy, self.cz], jnp.float32)
        l = jnp.array([self.lx, self.ly, self.lz], jnp.float32)
        u = jnp.stack([u1, u2, u3], axis=-1)
        return c + (u - 0.5) * l


@dataclasses.dataclass(frozen=True)
class MultiGaussianExpansionGeometry(Geometry):
    """Sum of co-axial Gaussian components with weights, dispersions and a
    common flattening per component (ref:
    SKIRT/core/MultiGaussianExpansionGeometry.hpp).  components is a tuple
    of (weight, sigma, q) with q the z-axis flattening."""

    components: tuple = ((1.0, 1.0, 1.0),)

    def density_np(self, pos):
        pos = np.asarray(pos, np.float64)
        R2 = pos[..., 0] ** 2 + pos[..., 1] ** 2
        z = pos[..., 2]
        wtot = sum(w for w, _, _ in self.components)
        out = np.zeros(pos.shape[:-1])
        for w, s, q in self.components:
            norm = w / wtot / ((2 * np.pi) ** 1.5 * s**3 * q)
            out = out + norm * np.exp(-(R2 + (z / q) ** 2) / (2 * s**2))
        return out

    def sample(self, keys, tag: int = rng.LAUNCH_POSITION) -> jax.Array:
        ws = np.array([w for w, _, _ in self.components], np.float64)
        cdf = jnp.asarray(np.cumsum(ws) / ws.sum(), jnp.float32)
        sig = jnp.asarray([s for _, s, _ in self.components], jnp.float32)
        qs = jnp.asarray([q for _, _, q in self.components], jnp.float32)
        u = rng.uniform(keys, tag)
        k = jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, len(ws) - 1)
        g = jnp.stack([rng.gauss(keys, tag + 50 + i) for i in range(3)],
                      axis=-1)
        scale = jnp.stack([sig[k], sig[k], sig[k] * qs[k]], axis=-1)
        return g * scale
