"""Clumpy spherical specialty grid: a structured 3D spherical grid
superposed with spherical clump cells.

Counterpart of the reference's ClumpySphericalSpatialGrid (ref:
SKIRT/core/ClumpySphericalSpatialGrid.hpp:67): cells 0..Nc-1 are the
clumps (imported centers + radii, filtered to lie inside the shell domain
and not overlap each other), cells Nc.. are the structured (r, theta, phi)
cells with their volumes reduced by the clump overlaps (Monte-Carlo
estimated at setup, as the reference does). Point location tests the
clumps first; traversal adds ray/clump-sphere crossings to the structured
step. The reference accelerates the clump tests with a BVH
(SphericalClumpBVH.hpp) for thousands of clumps; here the (B, Nc) distance
products vectorize on the VPU, which is faster than a tree walk for the
clump counts these models use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .polar import Sphere3DGrid, _theta_of, _phi_of  # noqa: F401

_BIG = jnp.float32(1e30)


class ClumpySphericalGrid(NamedTuple):
    rb: jax.Array    # (nr+1,) radial borders
    tb: jax.Array    # (nt+1,) polar borders
    pb: jax.Array    # (np+1,) azimuth borders
    ccen: jax.Array  # (Nc,3) clump centers
    crad: jax.Array  # (Nc,) clump radii
    vols_np: np.ndarray  # (ncells,) cached setup volumes (overlap-reduced)

    @property
    def n_clumps(self) -> int:
        return self.crad.shape[0]

    @property
    def _sph(self) -> Sphere3DGrid:
        return Sphere3DGrid(rb=self.rb, tb=self.tb, pb=self.pb)

    @property
    def ncells(self) -> int:
        return self.n_clumps + self._sph.ncells

    def _clump_of(self, pos: jax.Array) -> jax.Array:
        """Index of the clump containing each position, -1 if none
        (clumps are disjoint so at most one matches)."""
        d2 = jnp.sum((pos[..., None, :] - self.ccen) ** 2, axis=-1)
        inside = d2 <= self.crad ** 2                     # (B, Nc)
        any_in = jnp.any(inside, axis=-1)
        idx = jnp.argmax(inside, axis=-1)
        return jnp.where(any_in, idx, -1).astype(jnp.int32)

    def locate(self, pos: jax.Array) -> jax.Array:
        c = self._clump_of(pos)
        s = self._sph.locate(pos)
        out = jnp.where(c >= 0, c, jnp.where(s >= 0, s + self.n_clumps, -1))
        # a clump fully inside the domain can still win when s < 0 only at
        # float edges; restrict clump cells to the domain result
        return jnp.where(s >= 0, out, -1).astype(jnp.int32)

    def _clump_crossings(self, pos, dirn):
        """(t_entry, t_exit) per clump (B, Nc), _BIG when missed."""
        rel = pos[..., None, :] - self.ccen                  # (B,Nc,3)
        b = jnp.sum(rel * dirn[..., None, :], axis=-1)
        c0 = jnp.sum(rel * rel, axis=-1) - self.crad ** 2
        disc = b * b - c0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        miss = disc <= 0
        return (jnp.where(miss, _BIG, t0), jnp.where(miss, _BIG, t1))

    def step(self, pos: jax.Array, dirn: jax.Array, cell: jax.Array):
        eta = 1e-6 * self.rb[-1]
        in_clump = (cell >= 0) & (cell < self.n_clumps)
        sph = self._sph
        scell = sph.locate(pos)
        t0, t1 = self._clump_crossings(pos, dirn)
        # structured cell: stop at the first clump entry ahead
        t_entry = jnp.min(jnp.where(t0 > eta, t0, _BIG), axis=-1)
        ds_struct = jnp.minimum(self._struct_ds(pos, dirn, scell), t_entry)
        # clump cell: exit through this clump's far crossing
        ci = jnp.clip(cell, 0, max(self.n_clumps - 1, 0))
        t_exit = jnp.take_along_axis(t1, ci[..., None], axis=-1)[..., 0]
        ds = jnp.where(in_clump, jnp.maximum(t_exit, 0.0), ds_struct)
        newpos = pos + ds[..., None] * dirn
        nxt = self.locate(pos + (ds + eta)[..., None] * dirn)
        was_outside = cell < 0
        return (jnp.where(was_outside, 0.0, ds),
                jnp.where(was_outside, -1, nxt).astype(jnp.int32),
                jnp.where(was_outside[..., None], pos, newpos))

    def _struct_ds(self, pos, dirn, scell):
        ds, _, _ = self._sph.step(pos, dirn, scell)
        return ds

    def move_inside(self, pos: jax.Array, dirn: jax.Array):
        newpos, _, t = self._sph.move_inside(pos, dirn)
        return newpos, self.locate(newpos), t

    def volumes(self) -> np.ndarray:
        return self.vols_np

    def cell_centers(self) -> jax.Array:
        return jnp.concatenate([self.ccen,
                                self._sph.cell_centers()], axis=0)

    def cell_jitter_halfwidths(self) -> np.ndarray:
        vols = np.asarray(self.volumes(), np.float64)
        h = 0.5 * np.cbrt(np.maximum(vols, 0.0))
        return np.stack([h, h, h], axis=-1)

    def diagonal(self) -> float:
        return float(2 * np.asarray(self.rb)[-1])

    def max_steps(self) -> int:
        return self._sph.max_steps() + 2 * max(self.n_clumps, 1)


def make_clumpy_spherical(r_max: float, nr: int, nt: int, nphi: int,
                          clump_centers, clump_radii, r_min: float = 0.0,
                          rb=None, tb=None, overlap_samples: int = 20000,
                          seed: int = 23) -> ClumpySphericalGrid:
    """Build the grid: filter clumps (inside the shell, non-overlapping,
    first-read wins — ref: ClumpySphericalSpatialGrid setupSelfAfter
    retention rules), then MC-estimate the structured-cell volume
    reductions."""
    from .polar import make_sphere3d

    sph = make_sphere3d(r_max, nr, nt, nphi, r_min=r_min, rb=rb, tb=tb)
    cen = np.asarray(clump_centers, np.float64).reshape(-1, 3)
    rad = np.asarray(clump_radii, np.float64).reshape(-1)
    keep = []
    for i in range(len(rad)):
        r_c = np.linalg.norm(cen[i])
        if r_c + rad[i] > r_max or r_c - rad[i] < r_min:
            continue                      # not fully inside the domain
        ok = True
        for j in keep:
            if np.linalg.norm(cen[i] - cen[j]) < rad[i] + rad[j]:
                ok = False                # overlaps a retained clump
                break
        if ok:
            keep.append(i)
    cen, rad = cen[keep], rad[keep]

    # volumes: clumps exact; structured cells reduced by MC-attributed
    # clump-overlap volumes (ref: the setup-time Monte Carlo estimate)
    v_clump = 4.0 / 3.0 * np.pi * rad ** 3
    v_struct = np.asarray(sph.volumes(), np.float64)
    if len(rad):
        rs = np.random.default_rng(seed)
        sph_host = sph
        for i in range(len(rad)):
            u = rs.normal(size=(overlap_samples, 3))
            u /= np.linalg.norm(u, axis=-1, keepdims=True)
            rr = rad[i] * rs.uniform(size=overlap_samples) ** (1.0 / 3.0)
            pts = cen[i] + rr[:, None] * u
            cells = np.asarray(jax.device_get(
                sph_host.locate(jnp.asarray(pts, jnp.float32))))
            m = cells >= 0
            frac = np.bincount(cells[m], minlength=sph.ncells) \
                / overlap_samples
            v_struct = v_struct - frac * v_clump[i]
    v_struct = np.maximum(v_struct, 0.0)
    vols = np.concatenate([v_clump, v_struct])
    return ClumpySphericalGrid(
        rb=sph.rb, tb=sph.tb, pb=sph.pb,
        ccen=jnp.asarray(cen, jnp.float32),
        crad=jnp.asarray(rad, jnp.float32),
        vols_np=vols)
