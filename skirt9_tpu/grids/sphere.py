"""Spherical (1D shell) spatial grid with exact ray-sphere traversal.

Counterpart of the reference's Sphere1DSpatialGrid (ref:
SKIRT/core/Sphere1DSpatialGrid, SphereSpatialGrid.hpp): concentric shells
around the origin, the natural grid for the 1D benchmark problems
(Ivezic et al. 1997). Traversal solves the ray-sphere quadratics in closed
form per step — no marching error at all.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3e38)


class Sphere1DGrid(NamedTuple):
    rb: jax.Array  # (nr+1,) shell border radii [m], rb[0] >= 0

    @property
    def ncells(self) -> int:
        return self.rb.shape[0] - 1

    def locate(self, pos: jax.Array) -> jax.Array:
        r = jnp.linalg.norm(pos, axis=-1)
        i = jnp.searchsorted(self.rb, r, side="right") - 1
        inside = (r >= self.rb[0]) & (r < self.rb[-1])
        return jnp.where(inside, jnp.clip(i, 0, self.ncells - 1),
                         -1).astype(jnp.int32)

    def step(self, pos: jax.Array, dirn: jax.Array, cell: jax.Array):
        i = jnp.maximum(cell, 0)
        r_in = self.rb[i]
        r_out = self.rb[i + 1]
        b = jnp.sum(pos * dirn, axis=-1)           # signed projection
        r2 = jnp.sum(pos * pos, axis=-1)
        p2 = r2 - b * b                            # impact parameter^2

        # outer sphere: t = -b + sqrt(r_out^2 - p2) (discriminant >= 0 since
        # we are inside r_out)
        disc_out = jnp.maximum(r_out * r_out - p2, 0.0)
        t_out = -b + jnp.sqrt(disc_out)

        # inner sphere: only when heading inward (b<0) and the ray's
        # perihelion dips inside r_in
        disc_in = r_in * r_in - p2
        can_in = (r_in > 0) & (b < 0) & (disc_in > 0)
        t_in = jnp.where(can_in, -b - jnp.sqrt(jnp.maximum(disc_in, 0.0)),
                         _BIG)
        t_in = jnp.where(t_in > 0, t_in, _BIG)

        inward = t_in < t_out
        ds = jnp.where(inward, t_in, t_out)
        nxt = jnp.where(inward, i - 1, i + 1)
        nxt = jnp.where((nxt < 0) | (nxt >= self.ncells), -1, nxt)
        newpos = pos + ds[..., None] * dirn
        was_outside = cell < 0
        return (jnp.where(was_outside, 0.0, ds),
                jnp.where(was_outside, -1, nxt).astype(jnp.int32),
                jnp.where(was_outside[..., None], pos, newpos))

    def move_inside(self, pos: jax.Array, dirn: jax.Array):
        """Advance outside packets to the outer sphere (or miss)."""
        R = self.rb[-1]
        b = jnp.sum(pos * dirn, axis=-1)
        r2 = jnp.sum(pos * pos, axis=-1)
        disc = R * R - (r2 - b * b)
        hits = (disc > 0) & (b < 0)
        t = jnp.where(hits, (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
                      * (1 + 1e-6), 0.0)
        already = r2 < R * R
        t = jnp.where(already, 0.0, jnp.maximum(t, 0.0))
        newpos = pos + t[..., None] * dirn
        cell = jnp.where(already | hits, self.locate(newpos), -1)
        return newpos, cell.astype(jnp.int32), t

    def volumes(self) -> np.ndarray:
        rb = np.asarray(self.rb, np.float64)
        return 4.0 / 3.0 * np.pi * (rb[1:] ** 3 - rb[:-1] ** 3)

    def cell_centers(self) -> jax.Array:
        # representative radial position on +x (spherical symmetry)
        rb = self.rb
        rc = 0.5 * (rb[1:] + rb[:-1])
        return jnp.stack([rc, jnp.zeros_like(rc), jnp.zeros_like(rc)], -1)

    def cell_bounds(self):
        """Bounding boxes are ill-defined for shells; secondary-source
        position sampling uses radial sampling instead (see
        random_position_tables)."""
        rb = np.asarray(self.rb, np.float64)
        r = rb[1:]
        lo = np.stack([-r, -r, -r], -1)
        hi = np.stack([r, r, r], -1)
        return lo, hi

    def diagonal(self) -> float:
        return float(2 * np.asarray(self.rb)[-1])

    def max_steps(self) -> int:
        return 2 * self.ncells + 3


def make_sphere1d(r_max: float, nr: int, r_min: float = 0.0,
                  log: bool = False, rb=None) -> Sphere1DGrid:
    if rb is not None:
        rb = np.asarray(rb, np.float64)
    elif log and r_min > 0:
        rb = np.geomspace(r_min, r_max, nr + 1)
    elif log:
        # innermost border pinned to 0; log spacing from a small inner radius
        rb = np.concatenate([[0.0],
                             np.geomspace(r_max * 1e-4, r_max, nr)])
    else:
        rb = np.linspace(r_min, r_max, nr + 1)
    return Sphere1DGrid(rb=jnp.asarray(rb, jnp.float32))
