"""2D cylindrical (R, z) spatial grid with closed-form traversal.

Counterpart of the reference's Cylinder2DSpatialGrid (ref:
SKIRT/core/Cylinder2DSpatialGrid) — the natural grid for axisymmetric disk
models (e.g. the Pascucci 2004 benchmark). Cells are annular boxes
[R_i, R_i+1] x [z_j, z_j+1]; traversal solves the ray-cylinder quadratic
and the plane crossings exactly. Cell index m = ir * nz + iz.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3e38)


class Cylinder2DGrid(NamedTuple):
    rb: jax.Array  # (nr+1,) cylindrical radius borders, rb[0] >= 0
    zb: jax.Array  # (nz+1,) z borders

    @property
    def nr(self) -> int:
        return self.rb.shape[0] - 1

    @property
    def nz(self) -> int:
        return self.zb.shape[0] - 1

    @property
    def ncells(self) -> int:
        return self.nr * self.nz

    def split(self, cell):
        return cell // self.nz, cell % self.nz

    def join(self, ir, iz):
        return ir * self.nz + iz

    def locate(self, pos: jax.Array) -> jax.Array:
        R = jnp.hypot(pos[..., 0], pos[..., 1])
        ir = jnp.searchsorted(self.rb, R, side="right") - 1
        iz = jnp.searchsorted(self.zb, pos[..., 2], side="right") - 1
        inside = ((R >= self.rb[0]) & (R < self.rb[-1])
                  & (iz >= 0) & (iz < self.nz))
        cell = self.join(jnp.clip(ir, 0, self.nr - 1),
                         jnp.clip(iz, 0, self.nz - 1))
        return jnp.where(inside, cell, -1).astype(jnp.int32)

    def step(self, pos: jax.Array, dirn: jax.Array, cell: jax.Array):
        ir, iz = self.split(jnp.maximum(cell, 0))
        x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
        dx, dy, dz = dirn[..., 0], dirn[..., 1], dirn[..., 2]

        # --- radial crossings: |(x,y) + t (dx,dy)| = R_border
        q = dx * dx + dy * dy                  # in-plane direction norm^2
        b = x * dx + y * dy                    # in-plane projection
        R2 = x * x + y * y
        r_in = self.rb[ir]
        r_out = self.rb[ir + 1]

        safe_q = jnp.maximum(q, 1e-30)
        # outer cylinder: t = (-b + sqrt(b^2 + q (Rout^2 - R^2)))/q
        disc_out = jnp.maximum(b * b + safe_q * (r_out * r_out - R2), 0.0)
        t_out = (-b + jnp.sqrt(disc_out)) / safe_q
        t_out = jnp.where(q > 1e-30, jnp.maximum(t_out, 0.0), _BIG)
        # inner cylinder: heading inward and perihelion dips inside
        disc_in = b * b + safe_q * (r_in * r_in - R2)
        can_in = (r_in > 0) & (b < 0) & (disc_in > 0)
        t_in = jnp.where(can_in & (q > 1e-30),
                         (-b - jnp.sqrt(jnp.maximum(disc_in, 0.0))) / safe_q,
                         _BIG)
        t_in = jnp.where(t_in > 0, t_in, _BIG)

        # --- z-plane crossing
        z_tgt = jnp.where(dz > 0, self.zb[iz + 1], self.zb[iz])
        t_z = jnp.where(jnp.abs(dz) < 1e-30, _BIG,
                        jnp.maximum((z_tgt - z) / jnp.where(
                            jnp.abs(dz) < 1e-30, 1.0, dz), 0.0))

        ds = jnp.minimum(jnp.minimum(t_out, t_in), t_z)
        hit_rin = ds == t_in
        hit_rout = (ds == t_out) & ~hit_rin
        hit_z = ~hit_rin & ~hit_rout

        jr = ir + jnp.where(hit_rout, 1, 0) - jnp.where(hit_rin, 1, 0)
        jz = iz + jnp.where(hit_z, jnp.where(dz > 0, 1, -1), 0)
        inside = (jr >= 0) & (jr < self.nr) & (jz >= 0) & (jz < self.nz)
        nxt = jnp.where(inside,
                        self.join(jnp.clip(jr, 0, self.nr - 1),
                                  jnp.clip(jz, 0, self.nz - 1)),
                        -1).astype(jnp.int32)
        newpos = pos + ds[..., None] * dirn
        was_outside = cell < 0
        return (jnp.where(was_outside, 0.0, ds),
                jnp.where(was_outside, -1, nxt),
                jnp.where(was_outside[..., None], pos, newpos))

    def move_inside(self, pos: jax.Array, dirn: jax.Array):
        """Advance to the bounding cylinder (simple bisection-free scheme:
        intersect the outer cylinder and z-slab, take the later entry)."""
        R_out = self.rb[-1]
        x, y = pos[..., 0], pos[..., 1]
        dx, dy, dz = dirn[..., 0], dirn[..., 1], dirn[..., 2]
        q = jnp.maximum(dx * dx + dy * dy, 1e-30)
        b = x * dx + y * dy
        disc = b * b + q * (R_out * R_out - (x * x + y * y))
        t_cyl = jnp.where(disc > 0, (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
                          / q, _BIG)
        dzs = jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)
        t_z1 = (self.zb[0] - pos[..., 2]) / dzs
        t_z2 = (self.zb[-1] - pos[..., 2]) / dzs
        t_slab = jnp.minimum(t_z1, t_z2)
        t_entry = jnp.maximum(jnp.maximum(t_cyl, t_slab), 0.0) * (1 + 1e-6)
        already = self.locate(pos) >= 0
        t_entry = jnp.where(already, 0.0, t_entry)
        newpos = pos + t_entry[..., None] * dirn
        cell = self.locate(newpos)
        return newpos, cell.astype(jnp.int32), t_entry

    def volumes(self) -> np.ndarray:
        rb = np.asarray(self.rb, np.float64)
        zb = np.asarray(self.zb, np.float64)
        ring = np.pi * (rb[1:] ** 2 - rb[:-1] ** 2)
        dz = np.diff(zb)
        return (ring[:, None] * dz[None, :]).reshape(-1)

    def cell_centers(self) -> jax.Array:
        rc = 0.5 * (self.rb[1:] + self.rb[:-1])
        zc = 0.5 * (self.zb[1:] + self.zb[:-1])
        R, Z = jnp.meshgrid(rc, zc, indexing="ij")
        return jnp.stack([R.reshape(-1), jnp.zeros(self.ncells),
                          Z.reshape(-1)], axis=-1)

    def cell_jitter_halfwidths(self) -> np.ndarray:
        """Anisotropic per-cell jitter extents for density sampling: annular
        cells are thin in (R, z) but azimuthally wide — isotropic
        cbrt(volume) jitter would sample far outside the cell."""
        rb = np.asarray(self.rb, np.float64)
        zb = np.asarray(self.zb, np.float64)
        dr = np.diff(rb)
        dz = np.diff(zb)
        hr = np.repeat(dr, self.nz) * 0.5
        hz = np.tile(dz, self.nr) * 0.5
        return np.stack([hr, hr, hz], axis=-1)

    def diagonal(self) -> float:
        rb = np.asarray(self.rb, np.float64)
        zb = np.asarray(self.zb, np.float64)
        return float(np.hypot(2 * rb[-1], zb[-1] - zb[0]))

    def max_steps(self) -> int:
        return 4 * self.nr + 2 * self.nz + 5


def make_cylinder2d(r_max: float, z_min: float, z_max: float,
                    nr: int, nz: int, log_r: bool = False,
                    r_min: float = 0.0, rb=None, zb=None) -> Cylinder2DGrid:
    if rb is not None:
        rb = np.asarray(rb, np.float64)
    elif log_r:
        rb = np.concatenate([[0.0], np.geomspace(max(r_min, r_max * 1e-4),
                                                 r_max, nr)])
    else:
        rb = np.linspace(r_min, r_max, nr + 1)
    if zb is None:
        zb = np.linspace(z_min, z_max, nz + 1)
    return Cylinder2DGrid(rb=jnp.asarray(rb, jnp.float32),
                          zb=jnp.asarray(zb, jnp.float32))
