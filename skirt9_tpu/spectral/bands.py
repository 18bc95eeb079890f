"""Broadband transmission bands and band-based instrument binning
(ref: SKIRT/core/Band.hpp:509 BroadBand/FileBand/ListBand,
BandWavelengthGrid.hpp, ConfigurableBandWavelengthGrid).

A band is a transmission curve T(lambda); a band wavelength grid detects a
photon packet into EVERY band with weight T_b(lambda) (bands may overlap —
unlike disjoint grids there is no searchsorted binning).  The effective
width used for flux calibration is integral T dlambda / max T following the
reference's convention (ref: Band::effectiveWidth).

The reference ships ~100 predefined filter curves in resource packs
(GALEX..ALMA); those packs are not redistributable here, so predefined
shapes are exposed as top-hat and Gaussian analytic builders plus file/list
curves supplied by the user (ref: FileBand/ListBand).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Band:
    """Transmission curve on a wavelength grid [m]; dimensionless T >= 0."""

    name: str
    lam: np.ndarray
    transmission: np.ndarray

    def normalized(self) -> "Band":
        t = np.asarray(self.transmission, np.float64)
        return dataclasses.replace(self, transmission=t / t.max())

    def pivot_wavelength(self) -> float:
        """lambda_pivot = sqrt(int T dl / int T/l^2 dl)
        (ref: Band::pivotWavelength)."""
        lam = np.asarray(self.lam, np.float64)
        t = np.asarray(self.transmission, np.float64)
        return float(np.sqrt(np.trapezoid(t, lam)
                             / np.trapezoid(t / lam**2, lam)))

    def effective_width(self) -> float:
        """int T dlambda / max T (ref: Band::effectiveWidth)."""
        lam = np.asarray(self.lam, np.float64)
        t = np.asarray(self.transmission, np.float64)
        return float(np.trapezoid(t, lam) / t.max())


def tophat_band(name: str, lam_min: float, lam_max: float, n: int = 64) -> Band:
    lam = np.linspace(lam_min * 0.99, lam_max * 1.01, n)
    t = np.where((lam >= lam_min) & (lam <= lam_max), 1.0, 0.0)
    return Band(name=name, lam=lam, transmission=t)


def gaussian_band(name: str, center: float, fwhm: float, n: int = 129) -> Band:
    sig = fwhm / 2.3548200450309493
    lam = np.linspace(center - 4 * sig, center + 4 * sig, n)
    t = np.exp(-0.5 * ((lam - center) / sig) ** 2)
    return Band(name=name, lam=lam, transmission=t)


def file_band(name: str, path: str) -> Band:
    """Two-column text file: wavelength [micron], transmission
    (ref: FileBand column convention)."""
    d = np.loadtxt(path)
    return Band(name=name, lam=d[:, 0] * 1e-6, transmission=d[:, 1])


def list_band(name: str, lam, transmission) -> Band:
    return Band(name=name, lam=np.asarray(lam, np.float64),
                transmission=np.asarray(transmission, np.float64))


def band_tables(bands: list[Band]) -> dict:
    """Device tables for band detection: a common dense wavelength grid with
    per-band transmission rows (K, nb) for one interp + matmul detect."""
    import jax.numpy as jnp

    lmin = min(b.lam.min() for b in bands)
    lmax = max(b.lam.max() for b in bands)
    K = 512
    lam = np.geomspace(lmin, lmax, K)
    T = np.stack([np.interp(lam, b.lam, b.transmission, left=0.0, right=0.0)
                  for b in bands], axis=-1)          # (K, nb)
    return {
        "lam": jnp.asarray(lam, jnp.float32),
        "T": jnp.asarray(T, jnp.float32),
    }


def band_weights(tabs: dict, lam):
    """Per-band transmission weights (B, nb) for packet wavelengths."""
    import jax.numpy as jnp

    lg = tabs["lam"]
    i = jnp.clip(jnp.searchsorted(lg, lam, side="right") - 1, 0,
                 lg.shape[0] - 2)
    f = (lam - lg[i]) / (lg[i + 1] - lg[i])
    f = jnp.clip(f, 0.0, 1.0)[:, None]
    w = (1 - f) * tabs["T"][i] + f * tabs["T"][i + 1]
    return jnp.where(((lam >= lg[0]) & (lam <= lg[-1]))[:, None], w, 0.0)
