"""Tetrahedral spatial grid: scipy Delaunay host build + face-plane walk.

TPU-native counterpart of the reference's TetraMeshSpatialGrid (ref:
SKIRT/core/TetraMeshSpatialGrid.cpp:388-407 TetGen Delaunay build, :552
block search, traversal via per-face exit tests). Differences by design:

  * scipy.spatial.Delaunay (Qhull) replaces TetGen: vertices = the eight
    box corners + interior sites, so the convex hull IS the domain box and
    every interior point lies in exactly one tetrahedron;
  * per-cell dense tables: 4 outward unit face normals + plane offsets +
    4 face neighbors (Qhull's neighbor array). The per-step exit search is
    a vectorized min over the four ray/plane intersections — the same
    shape as the Voronoi bisector walk, so the transport engine is shared;
  * point location walks the triangulation along the most-violated face
    plane from a coarse lookup-table guess (replaces the reference's
    BoxSearch blocks);
  * volumes are exact (|det|/6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3e38)


class TetraGrid(NamedTuple):
    face_n: jax.Array      # (N,4,3) f32 outward unit face normals
    face_d: jax.Array      # (N,4) f32 plane offsets: n.x + d <= 0 inside
    neighbors: jax.Array   # (N,4) int32 neighbor across each face (-1 wall)
    centroids: jax.Array   # (N,3) f32
    box_lo: jax.Array      # (3,)
    box_hi: jax.Array      # (3,)
    lookup: jax.Array      # (G,G,G) int32 candidate cell per voxel
    vol_frac: jax.Array    # (N,) f32 exact volumes / box volume
    walk_steps: int

    @property
    def ncells(self) -> int:
        return self.face_n.shape[0]

    # ---------------------------------------------------------------- locate

    def _guess(self, pos: jax.Array) -> jax.Array:
        G = self.lookup.shape[0]
        rel = (pos - self.box_lo) / (self.box_hi - self.box_lo)
        ig = jnp.clip((rel * G).astype(jnp.int32), 0, G - 1)
        return self.lookup[ig[..., 0], ig[..., 1], ig[..., 2]]

    def _signed(self, cell: jax.Array, pos: jax.Array) -> jax.Array:
        """(B,4) signed distances to the cell's face planes (<=0 inside)."""
        n = self.face_n[cell]                        # (B,4,3)
        d = self.face_d[cell]                        # (B,4)
        return jnp.sum(n * pos[..., None, :], axis=-1) + d

    def locate(self, pos: jax.Array) -> jax.Array:
        """Walk along the most-violated face plane toward the containing
        tetrahedron (the classic walk-in-triangulation point location)."""
        inside = jnp.all((pos >= self.box_lo) & (pos < self.box_hi), axis=-1)
        cell = self._guess(pos)

        def walk(c, _):
            s = self._signed(c, pos)                 # (B,4)
            worst = jnp.argmax(s, axis=-1)
            out = jnp.take_along_axis(s, worst[..., None], axis=-1)[..., 0] \
                > 1e-7 * jnp.max(self.box_hi - self.box_lo)
            nxt = jnp.take_along_axis(self.neighbors[c], worst[..., None],
                                      axis=-1)[..., 0]
            return jnp.where(out & (nxt >= 0), nxt, c), None

        cell, _ = jax.lax.scan(walk, cell, None, length=self.walk_steps)
        return jnp.where(inside, cell, -1).astype(jnp.int32)

    # --------------------------------------------------------------- traversal

    def step(self, pos: jax.Array, dirn: jax.Array, cell: jax.Array):
        """Exit the current tetrahedron through the nearest outgoing face
        (ref: TetraMeshSpatialGrid segment generator per-face exit)."""
        c = jnp.maximum(cell, 0)
        n = self.face_n[c]                           # (B,4,3)
        d = self.face_d[c]                           # (B,4)
        nb = self.neighbors[c]                       # (B,4)
        dn = jnp.sum(dirn[:, None, :] * n, axis=-1)  # (B,4)
        s = jnp.sum(n * pos[:, None, :], axis=-1) + d
        t = -s / jnp.where(jnp.abs(dn) < 1e-30, jnp.float32(1.0), dn)
        t = jnp.where(dn > 0, jnp.maximum(t, 0.0), _BIG)
        ds = jnp.min(t, axis=-1)
        j = jnp.argmin(t, axis=-1)
        nxt = jnp.take_along_axis(nb, j[..., None], axis=-1)[..., 0]
        newpos = pos + (ds * (1.0 + 1e-6))[..., None] * dirn
        # leaving through a hull face (= the domain wall) ends the path
        was_outside = cell < 0
        return (jnp.where(was_outside, 0.0, ds),
                jnp.where(was_outside, -1, nxt).astype(jnp.int32),
                jnp.where(was_outside[..., None], pos, newpos))

    def move_inside(self, pos: jax.Array, dirn: jax.Array):
        inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-30, 1e-30, dirn)
        t1 = (self.box_lo - pos) * inv
        t2 = (self.box_hi - pos) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hits = tmax > jnp.maximum(tmin, 0.0)
        already = jnp.all((pos >= self.box_lo) & (pos < self.box_hi), axis=-1)
        t_entry = jnp.where(already, 0.0, jnp.maximum(tmin, 0.0) * (1 + 1e-6))
        newpos = pos + t_entry[..., None] * dirn
        cell = jnp.where(already | hits, self.locate(newpos), -1)
        return newpos, cell.astype(jnp.int32), t_entry

    # ------------------------------------------------------------------- misc

    def volumes(self) -> np.ndarray:
        lo = np.asarray(self.box_lo, np.float64)
        hi = np.asarray(self.box_hi, np.float64)
        return np.asarray(self.vol_frac, np.float64) * np.prod(hi - lo)

    def cell_centers(self) -> jax.Array:
        return self.centroids

    def diagonal(self) -> float:
        lo = np.asarray(self.box_lo, np.float64)
        hi = np.asarray(self.box_hi, np.float64)
        return float(np.linalg.norm(hi - lo))

    def max_steps(self) -> int:
        return int(6 * np.ceil(self.ncells ** (1 / 3))) + 16


def build_tetra(sites: np.ndarray, extent, lookup_res: int = 32,
                walk_steps: int | None = None) -> TetraGrid:
    """Host-side build: Delaunay over (box corners + sites).

    sites: (N,3) interior points (the reference samples them from the
    medium density or imports them, TetraMeshSpatialGrid policies).
    """
    from scipy.spatial import Delaunay

    lo = np.array([extent[a][0] for a in range(3)], np.float64)
    hi = np.array([extent[a][1] for a in range(3)], np.float64)
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
    pts = np.vstack([corners, np.asarray(sites, np.float64)])
    # normalized coordinates for Qhull conditioning
    span = hi - lo
    tri = Delaunay((pts - lo) / span)
    simp = tri.simplices                 # (N,4)
    nbrs = tri.neighbors                 # (N,4), -1 at hull
    verts = tri.points[simp] * span + lo  # (N,4,3) world coords

    n_t = len(simp)
    # outward unit normal of the face OPPOSITE vertex k (scipy neighbor
    # convention: neighbors[i,k] is the simplex sharing that face)
    face_n = np.zeros((n_t, 4, 3))
    face_d = np.zeros((n_t, 4))
    for k in range(4):
        idx = [a for a in range(4) if a != k]
        v1, v2, v3 = (verts[:, idx[0]], verts[:, idx[1]], verts[:, idx[2]])
        vk = verts[:, k]
        nrm = np.cross(v2 - v1, v3 - v1)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                          1e-300)
        # orient away from the opposite vertex
        flip = np.sum(nrm * (vk - v1), axis=-1) > 0
        nrm = np.where(flip[:, None], -nrm, nrm)
        face_n[:, k] = nrm
        face_d[:, k] = -np.sum(nrm * v1, axis=-1)

    # exact volumes
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    e3 = verts[:, 3] - verts[:, 0]
    vol = np.abs(np.einsum("ij,ij->i", np.cross(e1, e2), e3)) / 6.0
    centroids = verts.mean(axis=1)

    # coarse locate lookup: the tetra containing each voxel center (via
    # scipy's own find_simplex on the normalized triangulation)
    G = lookup_res
    gx = (np.arange(G) + 0.5) / G
    pts_g = np.stack(np.meshgrid(gx, gx, gx, indexing="ij"), -1).reshape(-1, 3)
    owner = tri.find_simplex(pts_g)
    # voxel centers outside any simplex (degenerate): nearest centroid
    bad = owner < 0
    if bad.any():
        from scipy.spatial import cKDTree
        kdt = cKDTree((centroids - lo) / span)
        _, repl = kdt.query(pts_g[bad])
        owner[bad] = repl
    lookup = owner.astype(np.int32).reshape(G, G, G)

    if walk_steps is None:
        walk_steps = max(12, int(3 * np.ceil(n_t ** (1 / 3))))

    return TetraGrid(
        face_n=jnp.asarray(face_n, jnp.float32),
        face_d=jnp.asarray(face_d, jnp.float32),
        neighbors=jnp.asarray(nbrs, jnp.int32),
        centroids=jnp.asarray(centroids, jnp.float32),
        box_lo=jnp.asarray(lo, jnp.float32),
        box_hi=jnp.asarray(hi, jnp.float32),
        lookup=jnp.asarray(lookup),
        vol_frac=jnp.asarray(vol / np.prod(span), jnp.float32),
        walk_steps=walk_steps,
    )
