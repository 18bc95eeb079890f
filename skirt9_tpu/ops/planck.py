"""Planck function and integrals (device + host variants).

Equivalent of the reference's PlanckFunction (ref: SKIRT/utils/PlanckFunction.hpp)
and the Planck-integral tables used by the equilibrium dust emission
calculator (ref: SKIRT/core/EquilibriumDustEmissionCalculator.hpp:55).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import constants as c

_C1 = 2.0 * c.H_PLANCK * c.C_LIGHT**2          # 2hc^2
_C2 = c.H_PLANCK * c.C_LIGHT / c.K_BOLTZMANN   # hc/k
SIGMA_SB = 5.670374419e-8                      # Stefan-Boltzmann [W/m2/K4]


def b_lambda(lam, T):
    """Planck spectral radiance B_lambda(T) [W / m^2 / m / sr].

    Batched over any broadcastable shapes; stable for large/small exponents.
    """
    x = _C2 / (lam * T)
    # expm1 overflow-safe: for x > 700 the result underflows to 0 anyway
    xs = jnp.minimum(x, 700.0)
    return _C1 / (lam**5 * jnp.expm1(xs)) * jnp.where(x > 700.0, 0.0, 1.0)


def b_lambda_np(lam, T):
    lam = np.asarray(lam, np.float64)
    T = np.asarray(T, np.float64)
    x = _C2 / (lam * T)
    out = np.zeros(np.broadcast_shapes(lam.shape, T.shape))
    ok = x < 700
    out[ok] = (_C1 / lam**5 / np.expm1(np.minimum(x, 700.0)))[ok]
    return out


def integrated_b(T):
    """Bolometric integral of pi*B over wavelength = sigma T^4 [W/m^2]."""
    return SIGMA_SB * T**4 / np.pi
