"""SED templates: analytic spectral energy distributions on wavelength grids.

Covers the reference's analytic SED family (ref: SKIRT/core/SED.hpp:49,
BlackBodySED, QuasarSED, SunSED approximation, FileSED/ListSED/TabulatedSED);
resource-backed stellar-population families (BruzualCharlot, Starburst99,
BPASS, ...) load through the same TabulatedSED path from user-provided or
converted stored tables (see spectral/sedfamilies.py).

All builders return a TabulatedSED (lam [m], s_lambda ~ W/m up to
normalization); normalization to a luminosity happens in the source
(ref: LuminosityNormalization family).
"""

from __future__ import annotations

import numpy as np

from ..ops import planck
from ..sources.base import TabulatedSED
from ..utils import constants as c


def blackbody(T: float, lam_min: float = 0.01e-6, lam_max: float = 100e-6,
              n: int = 512) -> TabulatedSED:
    """(ref: SKIRT/core/BlackBodySED)"""
    lam = np.geomspace(lam_min, lam_max, n)
    return TabulatedSED(lam=lam, s=np.pi * planck.b_lambda_np(lam, T))


def quasar(lam_min: float = 0.001e-6, lam_max: float = 1000e-6,
           n: int = 512) -> TabulatedSED:
    """Broken power-law quasar SED (ref: SKIRT/core/QuasarSED.hpp:
    F_lambda ~ lam^1/5 for 0.001-0.01 um, lam^-1 for 0.01-0.1,
    lam^-3/2 for 0.1-5, lam^-4 for 5-1000 um)."""
    lam = np.geomspace(lam_min, lam_max, n)
    lum = np.empty_like(lam)
    l_um = lam * 1e6
    b1, b2, b3 = 0.01, 0.1, 5.0
    s1 = (l_um / b1) ** 0.2
    s2 = (l_um / b1) ** -1.0
    s3 = (b2 / b1) ** -1.0 * (l_um / b2) ** -1.5
    s4 = (b2 / b1) ** -1.0 * (b3 / b2) ** -1.5 * (l_um / b3) ** -4.0
    lum = np.where(l_um < b1, s1, np.where(l_um < b2, s2,
                   np.where(l_um < b3, s3, s4)))
    return TabulatedSED(lam=lam, s=lum)


def sun_approx() -> TabulatedSED:
    """Solar SED approximated by a 5777 K blackbody (the reference's SunSED
    uses a resource table; this analytic stand-in integrates to the same
    bolometric shape within a few percent in the optical)."""
    return blackbody(5777.0, 0.09e-6, 160e-6, 600)


def single_wavelength(lam0: float) -> TabulatedSED:
    """Delta-like SED: narrow triangle at lam0 (ref: SingleWavelengthSED)."""
    lam = np.array([lam0 * (1 - 1e-3), lam0, lam0 * (1 + 1e-3)])
    return TabulatedSED(lam=lam, s=np.array([0.0, 1.0, 0.0]))


def from_file(path: str, lam_unit: float = 1.0, s_unit: float = 1.0) -> TabulatedSED:
    """Two-column text file: wavelength, specific luminosity
    (ref: FileSED via TextInFile)."""
    data = np.loadtxt(path)
    return TabulatedSED(lam=data[:, 0] * lam_unit, s=data[:, 1] * s_unit)


def clipped(sed: TabulatedSED, lam_min: float, lam_max: float) -> TabulatedSED:
    """Restrict the SED support to [lam_min, lam_max] with exact endpoint
    samples (ref: sources normalize and sample over the SourceSystem
    wavelength range)."""
    lam = np.asarray(sed.lam, np.float64)
    s = np.asarray(sed.s, np.float64)
    lo = max(lam_min, lam[0])
    hi = min(lam_max, lam[-1])
    if lo >= hi:
        raise ValueError("source range does not overlap the SED support")
    inner = lam[(lam > lo) & (lam < hi)]
    grid = np.concatenate([[lo], inner, [hi]])
    return TabulatedSED(lam=grid, s=np.interp(grid, lam, s))


def integrate(sed: TabulatedSED, lam_min=None, lam_max=None) -> float:
    """Integrated luminosity over a range (for normalizations;
    ref: SED::integratedLuminosity)."""
    lam = np.asarray(sed.lam, np.float64)
    s = np.asarray(sed.s, np.float64)
    lo = lam_min if lam_min is not None else lam[0]
    hi = lam_max if lam_max is not None else lam[-1]
    grid = np.unique(np.clip(np.concatenate([lam, [lo, hi]]), lo, hi))
    sv = np.interp(grid, lam, s)
    return float(np.trapezoid(sv, grid))


def normalized(sed: TabulatedSED, luminosity: float,
               lam_min=None, lam_max=None) -> TabulatedSED:
    """Scale so the integrated luminosity over the range equals `luminosity`
    (ref: IntegratedLuminosityNormalization)."""
    tot = integrate(sed, lam_min, lam_max)
    return TabulatedSED(lam=sed.lam, s=np.asarray(sed.s) * (luminosity / tot))


LAM_LYA = 1215.67e-10   # Lyman-alpha center [m] (ref: Constants::lambdaLya)
_C = 2.99792458e8


def lya_gaussian(dispersion: float, n: int = 1200) -> TabulatedSED:
    """Gaussian Lyman-alpha line in velocity space with dispersion s [m/s]
    (ref: LyaGaussianSED/LyaGaussianSEDFamily: unit spectrum
    exp(-v^2/2s^2)/sqrt(2 pi)/s over v = (lam-lam_a)/lam_a c)."""
    v = np.linspace(-6.0, 6.0, n) * dispersion
    lam = LAM_LYA * (1.0 + v / _C)
    s = np.exp(-0.5 * (v / dispersion) ** 2)
    return TabulatedSED(lam=lam, s=s)


def lya_double_peaked(scale: float, n: int = 1200) -> TabulatedSED:
    """Double-peaked Lyman-alpha profile with velocity scale s [m/s]
    (ref: LyaDoublePeakedSED/Family: 1.5 x^2 / (1 + cosh(x^3)),
    x = v/s — the two peaks of resonant escape)."""
    v = np.linspace(-3.0, 3.0, n) * scale
    x = v / scale
    s = 1.5 * x * x / (1.0 + np.cosh(x ** 3))
    lam = LAM_LYA * (1.0 + v / _C)
    return TabulatedSED(lam=lam, s=np.maximum(s, 1e-300))


def lines(lams, lums, width_frac: float = 1e-5) -> TabulatedSED:
    """Discrete emission lines as very narrow top-hats on the tabulated
    machinery (ref: LineSED/ListLineSED/FileLineSED: delta lines with
    given luminosities; detection bins are far wider than width_frac so
    the discretization is invisible)."""
    lams = np.asarray(lams, np.float64)
    lums = np.asarray(lums, np.float64)
    order = np.argsort(lams)
    lams, lums = lams[order], lums[order]
    grid = []
    vals = []
    for lam0, L in zip(lams, lums):
        w = lam0 * width_frac
        grid += [lam0 - 0.6 * w, lam0 - 0.5 * w, lam0 + 0.5 * w,
                 lam0 + 0.6 * w]
        vals += [0.0, L / w, L / w, 0.0]
    sed = TabulatedSED(lam=np.asarray(grid), s=np.asarray(vals))
    # keep the discrete line list for LineLuminosityNormalization
    # (ref: LineSED::intrinsicWavelengthsAndLuminosities)
    object.__setattr__(sed, "_lines", (lams, lums))
    return sed
