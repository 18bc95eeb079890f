"""Observation-based geometries: densities imported from FITS images.

Counterpart of the reference's ReadFitsGeometry / ReadFits3DGeometry
(ref: SKIRT/core/ReadFitsGeometry.hpp:14-36 — a 2D observed image
deprojected with a position angle and inclination, exponential vertical
profile; ReadFits3DGeometry.hpp:14 — a 3D datacube as the density). Reuses
this build's own FITS reader (utils/fits.py), so no external FITS
dependency is involved.

Both classes fulfil the Geometry contract: normalized `density_np` for
medium-state construction and a fully traced `sample` (discrete
pixel/voxel choice via a flat cdf + uniform within the pixel + analytic z
profile) so they also serve as SOURCE geometries inside the jitted launch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng, sampling
from .analytic import Geometry


def _load_image(path_or_array):
    if isinstance(path_or_array, str):
        from ..utils.fits import read_fits
        data, _hdr = read_fits(path_or_array)
        return np.asarray(data, np.float64)
    return np.asarray(path_or_array, np.float64)


@dataclasses.dataclass(frozen=True)
class ReadFitsGeometry(Geometry):
    """Deprojected 2D image with an exponential vertical profile
    (ref: ReadFitsGeometry.hpp:14-23: rho(z) ~ exp(-|z|/hz); the galaxy
    plane maps to the image plane through the position angle rotation and
    the inclination foreshortening of the minor axis)."""

    filename: object               # path or 2D array (ny, nx)
    pixel_scale: float             # physical length per pixel [m]
    scale_height: float            # hz [m]
    position_angle: float = 0.0    # omega [rad]
    inclination: float = 0.0       # theta [rad]
    center_x: float | None = None  # image-coordinate center [pixels]
    center_y: float | None = None

    def __post_init__(self):
        img = np.maximum(_load_image(self.filename), 0.0)
        ny, nx = img.shape
        cx = self.center_x if self.center_x is not None else nx / 2.0
        cy = self.center_y if self.center_y is not None else ny / 2.0
        total = img.sum()
        if total <= 0:
            raise ValueError("FITS image holds no positive flux")
        object.__setattr__(self, "_img", img / total)
        object.__setattr__(self, "_nx", nx)
        object.__setattr__(self, "_ny", ny)
        object.__setattr__(self, "_cx", float(cx))
        object.__setattr__(self, "_cy", float(cy))
        cdf = np.cumsum(img.reshape(-1)) / total
        object.__setattr__(self, "_cdf_dev", jnp.asarray(cdf, jnp.float32))

    # galaxy plane (x, y) -> image pixel coordinates
    def _to_image(self, x, y, lib=np):
        cw, sw = lib.cos(self.position_angle), lib.sin(self.position_angle)
        xr = x * cw + y * sw
        yr = -x * sw + y * cw
        # the observed image foreshortens the galaxy minor axis
        xi = xr / self.pixel_scale + self._cx
        yi = yr * lib.cos(self.inclination) / self.pixel_scale + self._cy
        return xi, yi

    def density_np(self, pos: np.ndarray) -> np.ndarray:
        pos = np.asarray(pos, np.float64)
        xi, yi = self._to_image(pos[..., 0], pos[..., 1])
        ix = np.floor(xi).astype(np.int64)
        iy = np.floor(yi).astype(np.int64)
        inside = ((ix >= 0) & (ix < self._nx) & (iy >= 0) & (iy < self._ny))
        sigma = np.where(
            inside, self._img[np.clip(iy, 0, self._ny - 1),
                              np.clip(ix, 0, self._nx - 1)], 0.0)
        # normalized: Sigma(pixel)/pixel_area_deprojected * f(z)
        area = self.pixel_scale ** 2 / np.cos(self.inclination)
        fz = np.exp(-np.abs(pos[..., 2]) / self.scale_height) \
            / (2.0 * self.scale_height)
        return sigma / area * fz

    def sample(self, keys: jax.Array, tag: int = rng.LAUNCH_POSITION):
        u = rng.uniform(keys, tag)
        flat = sampling.searchsorted_right(self._cdf_dev, u)
        flat = jnp.clip(flat, 0, self._nx * self._ny - 1)
        iy = flat // self._nx
        ix = flat % self._nx
        u2 = rng.uniform(keys, tag + 81)
        u3 = rng.uniform(keys, tag + 82)
        xi = ix.astype(jnp.float32) + u2 - self._cx
        yi = iy.astype(jnp.float32) + u3 - self._cy
        # invert the image mapping back to the galaxy plane
        xr = xi * self.pixel_scale
        yr = yi * self.pixel_scale / jnp.cos(self.inclination)
        cw = jnp.cos(self.position_angle)
        sw = jnp.sin(self.position_angle)
        x = xr * cw - yr * sw
        y = xr * sw + yr * cw
        # double-sided exponential z
        u4 = rng.uniform(keys, tag + 83)
        u5 = rng.uniform(keys, tag + 84)
        z = -self.scale_height * jnp.log(jnp.maximum(u4, 1e-37))
        z = jnp.where(u5 < 0.5, -z, z)
        return jnp.stack([x, y, z], axis=-1)


@dataclasses.dataclass(frozen=True)
class ReadFits3DGeometry(Geometry):
    """3D datacube as the (normalized) density
    (ref: ReadFits3DGeometry.hpp:14: each voxel's value is the density,
    centered on the origin with a uniform pixel scale)."""

    filename: object               # path or 3D array (nz, ny, nx)
    pixel_scale: float

    def __post_init__(self):
        cube = np.maximum(_load_image(self.filename), 0.0)
        if cube.ndim != 3:
            raise ValueError("ReadFits3DGeometry needs a 3D datacube")
        total = cube.sum()
        if total <= 0:
            raise ValueError("FITS cube holds no positive flux")
        object.__setattr__(self, "_cube", cube / total)
        object.__setattr__(self, "_shape", cube.shape)  # (nz, ny, nx)
        cdf = np.cumsum(cube.reshape(-1)) / total
        object.__setattr__(self, "_cdf_dev", jnp.asarray(cdf, jnp.float32))

    def density_np(self, pos: np.ndarray) -> np.ndarray:
        nz, ny, nx = self._shape
        pos = np.asarray(pos, np.float64)
        i = np.floor(pos[..., 0] / self.pixel_scale + nx / 2.0).astype(int)
        j = np.floor(pos[..., 1] / self.pixel_scale + ny / 2.0).astype(int)
        k = np.floor(pos[..., 2] / self.pixel_scale + nz / 2.0).astype(int)
        inside = ((i >= 0) & (i < nx) & (j >= 0) & (j < ny)
                  & (k >= 0) & (k < nz))
        rho = np.where(inside,
                       self._cube[np.clip(k, 0, nz - 1),
                                  np.clip(j, 0, ny - 1),
                                  np.clip(i, 0, nx - 1)], 0.0)
        return rho / self.pixel_scale ** 3

    def sample(self, keys: jax.Array, tag: int = rng.LAUNCH_POSITION):
        nz, ny, nx = self._shape
        u = rng.uniform(keys, tag)
        flat = jnp.clip(sampling.searchsorted_right(self._cdf_dev, u),
                        0, nx * ny * nz - 1)
        k = flat // (ny * nx)
        j = (flat // nx) % ny
        i = flat % nx
        u1 = rng.uniform(keys, tag + 81)
        u2 = rng.uniform(keys, tag + 82)
        u3 = rng.uniform(keys, tag + 83)
        x = (i.astype(jnp.float32) + u1 - nx / 2.0) * self.pixel_scale
        y = (j.astype(jnp.float32) + u2 - ny / 2.0) * self.pixel_scale
        z = (k.astype(jnp.float32) + u3 - nz / 2.0) * self.pixel_scale
        return jnp.stack([x, y, z], axis=-1)
