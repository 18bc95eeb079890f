"""Point source with file-tabulated polarized, axisymmetric emission.

Counterpart of the reference's FilePolarizedPointSource
(ref: SKIRT/core/FilePolarizedPointSource.hpp:18-60): the Stokes vector
components of the emitted radiation as a function of (wavelength,
inclination cosine mu = s.k) load from a user table; directions sample
from the I(lambda, mu) angular dependence at the packet's sampled
wavelength, the Stokes reference direction is the projection of the
symmetry axis s on the plane perpendicular to the propagation direction,
and peel-off re-evaluates the table toward each observer.

File format: text columns `lambda[micron] mu I Q U V` on a rectangular
(lambda, mu) grid (lambda-major), mirroring the reference's user-file
convention for this class.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng, sampling


def _axis_frame(axis):
    s = np.asarray(axis, np.float64)
    s = s / np.linalg.norm(s)
    a = np.array([1.0, 0.0, 0.0])
    if abs(s @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    e1 = np.cross(s, a)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(s, e1)
    return s, e1, e2


@dataclasses.dataclass(frozen=True)
class FilePolarizedPointSource:
    """(ref: FilePolarizedPointSource.hpp)"""

    filename: object            # path or (N,6) array rows lam mu I Q U V
    luminosity: float = 1.0
    position: tuple = (0.0, 0.0, 0.0)
    symmetry_axis: tuple = (0.0, 0.0, 1.0)
    wavelength_bias: float = 0.5

    def __post_init__(self):
        if isinstance(self.filename, str):
            d = np.loadtxt(self.filename)
        else:
            d = np.asarray(self.filename, np.float64)
        lam = np.unique(d[:, 0]) * 1e-6
        mu = np.unique(d[:, 1])
        L, M = len(lam), len(mu)
        if len(d) != L * M:
            raise ValueError("polarized table is not a rectangular "
                             "(lambda, mu) grid")
        order = np.lexsort((d[:, 1], d[:, 0]))
        I = d[order, 2].reshape(L, M)
        Q = d[order, 3].reshape(L, M)
        U = d[order, 4].reshape(L, M)
        V = d[order, 5].reshape(L, M)
        if (I <= 0).all():
            raise ValueError("polarized table holds no positive intensity")
        object.__setattr__(self, "_lam", lam)
        object.__setattr__(self, "_mu", mu)
        object.__setattr__(self, "_I", I)
        object.__setattr__(self, "_QUV", (Q, U, V))
        # wavelength pdf ~ integral over mu of I
        w = np.trapezoid(I, mu, axis=1)
        cdf_lam = np.cumsum(0.5 * (w[1:] + w[:-1]) * np.diff(lam))
        cdf_lam = np.concatenate([[0.0], cdf_lam])
        object.__setattr__(self, "_cdf_lam", cdf_lam / cdf_lam[-1])
        # conditional mu cdfs per lambda node
        seg = 0.5 * (I[:, 1:] + I[:, :-1]) * np.diff(mu)[None, :]
        cmu = np.cumsum(seg, axis=1)
        cmu = np.concatenate([np.zeros((L, 1)), cmu], axis=1)
        object.__setattr__(self, "_cdf_mu",
                           cmu / np.maximum(cmu[:, -1:], 1e-300))
        # normalization: mean intensity over the sphere per wavelength
        object.__setattr__(self, "_Ibar", np.maximum(w / (mu[-1] - mu[0]),
                                                     1e-300))
        object.__setattr__(self, "_frame", _axis_frame(self.symmetry_axis))

    @property
    def polarization(self):
        return self       # serves as its own emission-polarization profile

    wants_lam = True      # stokes_for / emission_phase take the wavelengths

    def tables(self) -> dict:
        s, e1, e2 = self._frame
        return {
            "pos": jnp.asarray(np.asarray(self.position), jnp.float32),
            "lam_t": jnp.asarray(self._lam, jnp.float32),
            "mu_t": jnp.asarray(self._mu, jnp.float32),
            "cdf_lam": jnp.asarray(self._cdf_lam, jnp.float32),
            "cdf_mu": jnp.asarray(self._cdf_mu, jnp.float32),
            "I": jnp.asarray(self._I, jnp.float32),
            "Ibar": jnp.asarray(self._Ibar, jnp.float32),
            "Q": jnp.asarray(self._QUV[0], jnp.float32),
            "U": jnp.asarray(self._QUV[1], jnp.float32),
            "V": jnp.asarray(self._QUV[2], jnp.float32),
            "s": jnp.asarray(s, jnp.float32),
            "e1": jnp.asarray(e1, jnp.float32),
            "e2": jnp.asarray(e2, jnp.float32),
        }

    def _lam_index(self, lam):
        lam_t = jnp.asarray(self._lam, jnp.float32)
        i = jnp.clip(sampling.searchsorted_right(lam_t, lam) - 1,
                     0, len(self._lam) - 2)
        f = (lam - sampling.take_small(lam_t, i)) / jnp.maximum(
            sampling.take_small(lam_t, i + 1)
            - sampling.take_small(lam_t, i), 1e-37)
        return i, jnp.clip(f, 0.0, 1.0)

    def _interp_tab(self, tab, lam, mu):
        """Bilinear table lookup at per-lane (lam, mu)."""
        i, fi = self._lam_index(lam)
        mu_t = jnp.asarray(self._mu, jnp.float32)
        j = jnp.clip(sampling.searchsorted_right(mu_t, mu) - 1,
                     0, len(self._mu) - 2)
        fj = (mu - sampling.take_small(mu_t, j)) / jnp.maximum(
            sampling.take_small(mu_t, j + 1)
            - sampling.take_small(mu_t, j), 1e-37)
        fj = jnp.clip(fj, 0.0, 1.0)
        t = jnp.asarray(tab, jnp.float32)
        v00 = t[i, j]
        v01 = t[i, j + 1]
        v10 = t[i + 1, j]
        v11 = t[i + 1, j + 1]
        return ((1 - fi) * ((1 - fj) * v00 + fj * v01)
                + fi * ((1 - fj) * v10 + fj * v11))

    def launch(self, tabs: dict, keys: jax.Array, n_total: int) -> dict:
        B = keys.shape[0]
        pos = jnp.broadcast_to(tabs["pos"], (B, 3))
        # wavelength from the mu-integrated intensity
        u1 = rng.uniform(keys, rng.LAUNCH_WAVELENGTH)
        lam = sampling.sample_cdf_loglog(u1, tabs["lam_t"], tabs["cdf_lam"])
        i, fi = self._lam_index(lam)
        # inclination cosine from the conditional cdf at the nearer node
        inode = jnp.where(fi > 0.5, i + 1, i)
        rows = tabs["cdf_mu"][inode]                       # (B, M)
        u2 = rng.uniform(keys, rng.LAUNCH_DIRECTION)
        k = jnp.sum((rows < u2[:, None]).astype(jnp.int32), axis=1)
        k = jnp.clip(k, 1, rows.shape[1] - 1)
        c0 = jnp.take_along_axis(rows, (k - 1)[:, None], axis=1)[:, 0]
        c1 = jnp.take_along_axis(rows, k[:, None], axis=1)[:, 0]
        f = jnp.where(c1 > c0, (u2 - c0) / jnp.maximum(c1 - c0, 1e-30),
                      0.5)
        mu_t = tabs["mu_t"]
        mu = sampling.take_small(mu_t, k - 1) + f * (
            sampling.take_small(mu_t, k) - sampling.take_small(mu_t, k - 1))
        phi = 2.0 * jnp.pi * rng.uniform(keys, rng.LAUNCH_DIRECTION + 7)
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
        dirn = (mu[:, None] * tabs["s"][None, :]
                + (st * jnp.cos(phi))[:, None] * tabs["e1"][None, :]
                + (st * jnp.sin(phi))[:, None] * tabs["e2"][None, :])
        lum = jnp.full((B,), self.luminosity / n_total, jnp.float32)
        stokes, normal = self.stokes_for(dirn, lam)
        return {"lam": lam, "lum": lum, "pos": pos, "dir": dirn,
                "stokes": stokes, "normal": normal}

    def stokes_for(self, k, lam):
        """Stokes state for propagation directions k at wavelengths lam;
        the reference direction is n = s x k / ||s x k|| — the normal of
        the (symmetry axis, propagation) plane, matching the reference's
        convention (ref: FilePolarizedPointSource.hpp 'Reference
        direction') and SpheroidalEmissionProfile.stokes_for."""
        s = jnp.asarray(self._frame[0], jnp.float32)
        mu = jnp.clip(jnp.sum(k * s[None, :], axis=-1), -1.0, 1.0)
        I = jnp.maximum(self._interp_tab(self._I, lam, mu), 1e-37)
        q = self._interp_tab(self._QUV[0], lam, mu) / I
        u = self._interp_tab(self._QUV[1], lam, mu) / I
        v = self._interp_tab(self._QUV[2], lam, mu) / I
        stokes = jnp.stack([jnp.ones_like(q), q, u, v], axis=-1)
        n = jnp.cross(jnp.broadcast_to(s[None, :], k.shape), k)
        nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
        # degenerate (k parallel to s): any perpendicular direction works
        fallback = jnp.asarray(self._frame[1], jnp.float32)
        n = jnp.where(nn > 1e-6, n / jnp.maximum(nn, 1e-30),
                      fallback[None, :])
        return stokes, n

    def emission_phase(self, kobs, pos, lam):
        """Angular emission probability per steradian toward the observer:
        I(lam, s.kobs) normalized so the sphere average is 1/(4 pi)."""
        s = jnp.asarray(self._frame[0], jnp.float32)
        B = lam.shape[0]
        ko = jnp.broadcast_to(kobs, (B, 3))
        mu = jnp.clip(jnp.sum(ko * s[None, :], axis=-1), -1.0, 1.0)
        I = self._interp_tab(self._I, lam, mu)
        i, fi = self._lam_index(lam)
        ib = jnp.asarray(self._Ibar, jnp.float32)
        Ibar = (1 - fi) * sampling.take_small(ib, i) \
            + fi * sampling.take_small(ib, i + 1)
        return I / (4.0 * jnp.pi * jnp.maximum(Ibar, 1e-37))
