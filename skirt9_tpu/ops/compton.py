"""Compton scattering on free electrons: Klein-Nishina cross sections,
angle sampling and wavelength shifts.

Counterpart of the reference's ComptonPhaseFunction
(ref: SKIRT/core/ComptonPhaseFunction.hpp:16 — wavelength-changing electron
scattering used by ElectronMix at X-ray energies). Conventions:

  x = (h c / lambda) / (m_e c^2)   photon energy in electron rest-mass units
  lambda'/lambda = 1 + x (1 - cos theta)   Compton shift
  dsigma/dOmega ~ C(x, mu)^2 (C + 1/C - 1 + mu^2)/2, C = 1/(1+x(1-mu))

Angle sampling inverts tabulated conditional cdfs over a log-x grid
(host-built once) — bounded, branch-free device work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as c

X_OF_LAM = c.H_PLANCK / (c.ELECTRON_MASS * c.C_LIGHT)  # x = X_OF_LAM / lam


def x_of_lambda(lam):
    return X_OF_LAM / jnp.maximum(lam, 1e-30)


def sigma_kn_ratio(x):
    """Total Klein-Nishina cross section / Thomson: exact closed form with
    the small-x Taylor series (1 - 2x + 26x^2/5) below x=1e-2 where the
    exact expression cancels catastrophically in f32."""
    xs = jnp.maximum(x, 1e-2)
    t1 = (1 + xs) / xs**3 * (2 * xs * (1 + xs) / (1 + 2 * xs)
                             - jnp.log1p(2 * xs))
    t2 = jnp.log1p(2 * xs) / (2 * xs)
    t3 = -(1 + 3 * xs) / (1 + 2 * xs) ** 2
    exact = 0.75 * (t1 + t2 + t3)
    series = 1.0 - 2.0 * x + 5.2 * x * x
    return jnp.where(x < 1e-2, series, exact)


def kn_diff(x, mu):
    """Unnormalized KN differential cross section vs mu = cos theta."""
    C = 1.0 / (1.0 + x * (1.0 - mu))
    return 0.5 * C * C * (C + 1.0 / C - 1.0 + mu * mu)


# host-built sampling tables: conditional cdf of mu per log-x row
_NX, _NMU = 48, 257
_XGRID = np.geomspace(1e-6, 30.0, _NX)
_MUGRID = np.linspace(-1.0, 1.0, _NMU)


def _build_tables():
    cdfs = np.zeros((_NX, _NMU))
    norms = np.zeros(_NX)
    for i, xv in enumerate(_XGRID):
        C = 1.0 / (1.0 + xv * (1.0 - _MUGRID))
        pdf = 0.5 * C * C * (C + 1.0 / C - 1.0 + _MUGRID**2)
        norms[i] = np.trapezoid(pdf, _MUGRID)
        cdf = np.concatenate([[0.0], np.cumsum(
            0.5 * (pdf[1:] + pdf[:-1]) * np.diff(_MUGRID))])
        cdfs[i] = cdf / cdf[-1]
    return cdfs, norms


_CDFS, _NORMS = _build_tables()
_NORMS_J = jnp.asarray(_NORMS, jnp.float32)
_CDFS_J = jnp.asarray(_CDFS, jnp.float32)
_XGRID_J = jnp.asarray(_XGRID, jnp.float32)
_MUGRID_J = jnp.asarray(_MUGRID, jnp.float32)


def sample_costheta(u: jax.Array, x: jax.Array) -> jax.Array:
    """Sample mu from the KN angular distribution at photon energy x (B,).

    Inverse-cdf in the two bracketing x rows, linearly blended — smooth in
    x and exactly Thomson-dipole-shaped at x -> 0.
    """
    lx = jnp.log(jnp.clip(x, _XGRID[0], _XGRID[-1]))
    lxg = jnp.log(_XGRID_J)
    i = jnp.clip(jnp.searchsorted(lxg, lx, side="right") - 1, 0, _NX - 2)
    w = (lx - lxg[i]) / (lxg[i + 1] - lxg[i])

    def invert(rows):
        # rows (B, NMU) monotone; find mu with cdf = u
        li = jnp.sum((rows < u[:, None]).astype(jnp.int32), axis=1)
        li = jnp.clip(li, 1, _NMU - 1)
        c0 = jnp.take_along_axis(rows, (li - 1)[:, None], axis=1)[:, 0]
        c1 = jnp.take_along_axis(rows, li[:, None], axis=1)[:, 0]
        f = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-30), 0.5)
        return _MUGRID_J[li - 1] + f * (_MUGRID_J[li] - _MUGRID_J[li - 1])

    mu0 = invert(_CDFS_J[i])
    mu1 = invert(_CDFS_J[i + 1])
    return jnp.clip((1 - w) * mu0 + w * mu1, -1.0, 1.0)


def shifted_wavelength(lam, x, mu):
    """lambda' = lambda (1 + x (1 - mu))."""
    return lam * (1.0 + x * (1.0 - mu))


def phase_value(x, mu):
    """KN phase function normalized over the sphere (B,)."""
    # normalization: integral of kn_diff over mu, tabulated per x
    norms = jnp.interp(jnp.log(jnp.clip(x, _XGRID[0], _XGRID[-1])),
                       jnp.log(_XGRID_J), _NORMS_J)
    return kn_diff(x, mu) / (2.0 * jnp.pi * norms)





def electron_mix_kn(n: int = 160):
    """Electron mix with the exact KN total cross section vs wavelength
    (replaces the constant-Thomson electron_mix for X-ray work;
    ref: ElectronMix + ComptonPhaseFunction)."""
    from ..media import mixes as mx
    lam = np.geomspace(1e-14, 1e-4, n)
    x = X_OF_LAM / lam
    xs = np.maximum(x, 1e-4)
    t1 = (1 + xs) / xs**3 * (2 * xs * (1 + xs) / (1 + 2 * xs)
                             - np.log1p(2 * xs))
    t2 = np.log1p(2 * xs) / (2 * xs)
    t3 = -(1 + 3 * xs) / (1 + 2 * xs) ** 2
    ratio = np.where(x < 1e-4, 1.0 - 2.0 * x + 5.2 * x * x,
                     0.75 * (t1 + t2 + t3))
    sig = c.SIGMA_THOMSON * ratio
    return mx.tabulated(lam, sig, np.ones(n), np.zeros(n),
                        mu=c.ELECTRON_MASS)
