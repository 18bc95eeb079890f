"""Scattering phase functions: Henyey-Greenstein and dipole (Rayleigh/Thomson).

Batched, branch-free device functions. The reference implements HG sampling
and evaluation inside DustMix (ref: SKIRT/core/DustMix.hpp:51-100) and the
dipole phase function for electrons (ref: SKIRT/core/DipolePhaseFunction.hpp).
All functions take/return (B,) or (B,3) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

_ISO = 1.0 / (4.0 * jnp.pi)


def hg_phase(g: jnp.ndarray, costheta: jnp.ndarray) -> jnp.ndarray:
    """HG phase function value Phi(cos t), normalized to 1 over 4pi sr:
    (1/4pi) (1-g^2) / (1 + g^2 - 2 g cos t)^{3/2}. g=0 -> isotropic."""
    t = 1.0 + g * g - 2.0 * g * costheta
    return _ISO * (1.0 - g * g) / jnp.maximum(t * jnp.sqrt(t), 1e-30)


def hg_sample_costheta(g: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-cdf sample of cos(theta) from the HG phase function.

    Stable for g -> 0 (series switch), matching the reference's handling of
    near-isotropic grains (ref: DustMix HG generateCosineFromPhaseFunction).
    """
    near_iso = jnp.abs(g) < 1e-5
    gs = jnp.where(near_iso, 0.5, g)  # safe value to avoid 0/0 in the traced branch
    f = (1.0 - gs * gs) / (1.0 - gs + 2.0 * gs * u)
    ct_aniso = (1.0 + gs * gs - f * f) / (2.0 * gs)
    ct_iso = 2.0 * u - 1.0
    return jnp.clip(jnp.where(near_iso, ct_iso, ct_aniso), -1.0, 1.0)


def dipole_phase(costheta: jnp.ndarray) -> jnp.ndarray:
    """Dipole (Rayleigh/Thomson) phase function, normalized over 4pi:
    (3/16pi)(1+cos^2 t) (ref: DipolePhaseFunction.cpp)."""
    return 3.0 / (16.0 * jnp.pi) * (1.0 + costheta * costheta)


def dipole_sample_costheta(u: jnp.ndarray) -> jnp.ndarray:
    """Invert the dipole cdf: cos t solves mu^3 + 3 mu + (4 - 8u) = 0;
    closed-form Cardano root (the cubic is monotone, single real root)
    (ref: DipolePhaseFunction.cpp generateCosineFromPhaseFunction)."""
    p = 4.0 * u - 2.0
    d = jnp.sqrt(1.0 + p * p)
    return jnp.clip(jnp.cbrt(p + d) + jnp.cbrt(p - d), -1.0, 1.0)


def rotate_direction(k: jnp.ndarray, costheta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """New direction at polar angle (costheta, phi) relative to axis k (B,3).

    Builds an orthonormal frame around k without branches (robust Frisvad-style
    construction handling k_z ~ +-1), then rotates. Replaces the reference's
    Direction trigonometric construction (ref: SKIRT/core/Random.cpp direction
    overload with (bfk, costheta)).
    """
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    sign = jnp.where(kz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + kz)
    b = kx * ky * a
    e1 = jnp.stack([1.0 + sign * kx * kx * a, sign * b, -sign * kx], axis=-1)
    e2 = jnp.stack([b, sign + ky * ky * a, -ky], axis=-1)
    sint = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    cp = jnp.cos(phi)
    sp = jnp.sin(phi)
    out = (
        sint[..., None] * (cp[..., None] * e1 + sp[..., None] * e2)
        + costheta[..., None] * k
    )
    # renormalize to counter f32 drift over many scatterings
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
