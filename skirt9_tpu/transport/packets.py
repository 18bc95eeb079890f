"""Photon-packet batch state: structure-of-arrays over a packet batch.

The reference's per-packet mutable object (ref: SKIRT/utils/PhotonPacket.hpp:63)
becomes an immutable SoA pytree carried through `lax.scan`; every field is a
(B,) or (B,k) device array. Polarization state (Stokes vector + reference
normal, ref: SKIRT/utils/StokesVector.hpp:26) rides along as optional fields.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PacketBatch(NamedTuple):
    """A batch of photon packets (all arrays share leading dim B)."""

    lam: jax.Array      # (B,) wavelength [m] in the model frame
    lum: jax.Array      # (B,) current luminosity carried by the packet [W]
    lum0: jax.Array     # (B,) launch luminosity (for weight-cutoff termination)
    pos: jax.Array      # (B,3) position [m]
    dir: jax.Array      # (B,3) unit propagation direction
    cell: jax.Array     # (B,) int32 current cell index, -1 = outside grid
    nscat: jax.Array    # (B,) int32 number of scattering events so far
    alive: jax.Array    # (B,) bool — still propagating
    hkey: jax.Array     # (B,2) uint32 per-history base RNG key
    # polarization state (identity-initialized; used when polarization on)
    stokes: jax.Array   # (B,4) Stokes (I,Q,U,V) with I normalized to 1
    normal: jax.Array   # (B,3) reference normal for Q/U orientation
    v_emit: jax.Array   # (B,3) emitter velocity [m/s] (line/kinematic
                        # sources: enables observer-frame emission
                        # wavelengths in peel-off)
    dist: jax.Array     # (B,) cumulative path length since emission [m]
                        # (time-lag bookkeeping; ref: PhotonPacket _D)

    @property
    def batch_size(self) -> int:
        return self.lam.shape[0]


def empty_batch(batch: int, dtype=jnp.float32) -> PacketBatch:
    """All-dead batch used as scan initializer."""
    z = jnp.zeros((batch,), dtype)
    z3 = jnp.zeros((batch, 3), dtype)
    return PacketBatch(
        lam=z, lum=z, lum0=z, pos=z3,
        dir=z3.at[:, 2].set(1.0),
        cell=jnp.full((batch,), -1, jnp.int32),
        nscat=jnp.zeros((batch,), jnp.int32),
        alive=jnp.zeros((batch,), bool),
        hkey=jnp.zeros((batch, 2), jnp.uint32),
        stokes=jnp.zeros((batch, 4), dtype).at[:, 0].set(1.0),
        normal=z3.at[:, 0].set(1.0),
        v_emit=z3,
        dist=z,
    )
