"""Gas line emission sources: per-cell line luminosities with thermal and
bulk Doppler broadening.

Counterpart of the reference's LineGasSecondarySource + EmittingGasMix line
machinery (ref: SKIRT/core/LineGasSecondarySource.cpp — packets launched
per cell at line wavelengths drawn from a Gaussian with the local thermal
dispersion, shifted by the cell bulk velocity; SpinFlipHydrogenGasMix.hpp:190
for the 21 cm specifics). Implemented as a source object usable in any
segment: cell selection by luminosity with the composite spatial bias,
uniform in-cell positions, isotropic directions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from ..utils import constants as c

LAM_21CM = 0.2110611405413          # 21 cm line rest wavelength [m]
A_21CM = 2.8843e-15                 # Einstein A of the spin-flip transition [1/s]


@dataclasses.dataclass(frozen=True)
class GasLineSource:
    """Line emission from the gas state: per-cell luminosities at lam0."""

    emits_with_velocity = True

    lam0: float
    luminosity: float
    spatial_bias: float = 0.5
    _tables: dict = dataclasses.field(default=None, compare=False,
                                      repr=False, hash=False)

    def tables(self) -> dict:
        return self._tables

    def launch(self, tabs: dict, keys: jax.Array, n_total: int) -> dict:
        B = keys.shape[0]
        cdf = tabs["cell_cdf"]
        u_cell = rng.uniform(keys, rng.LAUNCH_CELL)
        cell = jnp.clip(jnp.searchsorted(cdf, u_cell, side="right"),
                        0, cdf.shape[0] - 1).astype(jnp.int32)
        lum = (self.luminosity / n_total) * tabs["cell_weight"][cell]

        u3 = jax.vmap(lambda k: jax.random.uniform(k, (3,)))(
            rng.purpose_key(keys, rng.LAUNCH_POSITION))
        pos = tabs["cell_lo"][cell] + u3 * (tabs["cell_hi"][cell]
                                            - tabs["cell_lo"][cell])
        dirn = rng.isotropic_direction(keys, rng.LAUNCH_DIRECTION)

        # 3D emitter velocity = bulk + isotropic thermal Maxwellian
        # (ref: LineGasSecondarySource launch: Gaussian line profile with
        # the local thermal dispersion + cell bulk velocity)
        vth = jnp.sqrt(2.0 * c.K_BOLTZMANN * jnp.maximum(
            tabs["T"][cell], 1.0) / tabs["mass"])
        g3 = jax.vmap(lambda k: jax.random.normal(k, (3,)))(
            rng.purpose_key(keys, rng.EMISSION_LAMBDA))
        v_emit = tabs["v"][cell] + (vth * 0.7071067811865476)[:, None] * g3
        lam = self.lam0 * (1.0 - jnp.sum(dirn * v_emit, axis=-1) / c.C_LIGHT)
        return {"lam": lam, "lum": lum, "pos": pos, "dir": dirn,
                "v_emit": v_emit}


def prepare_line_source(grid, med, lam0: float, L_cell: np.ndarray,
                        particle_mass: float,
                        spatial_bias: float = 0.5) -> GasLineSource:
    """Build a GasLineSource from per-cell line luminosities [W]."""
    from .secondary import cell_bounds
    L_np = np.asarray(L_cell, np.float64)
    total = float(L_np.sum())
    nonzero = L_np > 0
    n_nonzero = max(int(nonzero.sum()), 1)
    wl = np.where(nonzero, L_np / max(total, 1e-300), 0.0)
    w = (1 - spatial_bias) * wl + spatial_bias * nonzero / n_nonzero
    w = w / max(w.sum(), 1e-300)
    cdf = np.cumsum(w)
    weight = np.where(w > 0, wl / np.maximum(w, 1e-300), 0.0)
    lo, hi = cell_bounds(grid)
    tables = {
        "cell_cdf": jnp.asarray(cdf, jnp.float32),
        "cell_weight": jnp.asarray(weight, jnp.float32),
        "cell_lo": jnp.asarray(lo, jnp.float32),
        "cell_hi": jnp.asarray(hi, jnp.float32),
        "T": med.temperature,
        "v": med.bulk_v,
        "mass": jnp.float32(particle_mass),
    }
    return GasLineSource(lam0=lam0, luminosity=total,
                         spatial_bias=spatial_bias, _tables=tables)


def spinflip_luminosities(grid, n_HI: np.ndarray) -> np.ndarray:
    """21 cm line luminosity per cell from the neutral hydrogen column:
    L = 3/4 A_21 h nu_0 N_HI (the standard optically-thin emissivity;
    ref: SpinFlipHydrogenGasMix emission). n_HI (ncells,) [1/m^3]."""
    vols = np.asarray(grid.volumes(), np.float64)
    nu0 = c.C_LIGHT / LAM_21CM
    return 0.75 * A_21CM * c.H_PLANCK * nu0 * np.asarray(n_HI, np.float64) \
        * vols
