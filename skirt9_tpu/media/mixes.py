"""Dust/electron material mixes: optical-property table builders.

Counterpart of the reference's MaterialMix zoo (ref: SKIRT/core/DustMix.hpp:104,
MeanIvezicBenchmarkDustMix.hpp:13, ElectronMix.hpp:56, TabulatedDustMix).
The reference loads per-mix optical properties from versioned resource packs
(ref: SKIRT/resources/ExpectedResources.txt) which are not redistributable
inside this repo; therefore:

  * benchmark mixes implement the *published analytic definitions* of the
    corresponding benchmark problems (Ivezic+ 1997; TRUST/Pascucci shapes);
  * the mean-interstellar mix is a documented analytic approximation of the
    Milky Way extinction curve (optical power-law + 2175 A bump + beta=2
    far-IR decline) — adequate for engine validation, replaceable by
    tabulated data;
  * TabulatedDustMix/from_file accept exact user-provided tables, the
    parity path for real science runs (ref: TabulatedDustMix, MeanFileDustMix).

Each builder returns a MixTables: wavelength table + (sigma_ext, albedo, g)
rows, plus bulk mass per entity for mass-based normalizations.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import constants as c


@dataclasses.dataclass(frozen=True)
class MixTables:
    """Optical properties of one medium component on a wavelength table."""

    lam: np.ndarray        # (T,) [m]
    sigma_ext: np.ndarray  # (T,) extinction cross section per entity [m^2]
    albedo: np.ndarray     # (T,)
    g: np.ndarray          # (T,) HG asymmetry
    mu: float = 0.0        # mass per entity [kg] (for mass normalizations)

    @property
    def sigma_abs(self) -> np.ndarray:
        return self.sigma_ext * (1.0 - self.albedo)

    @property
    def sigma_sca(self) -> np.ndarray:
        return self.sigma_ext * self.albedo

    def kappa_ext(self) -> np.ndarray:
        """Mass extinction coefficient [m^2/kg]."""
        return self.sigma_ext / self.mu if self.mu > 0 else self.sigma_ext

    def at(self, lam0: float) -> tuple[float, float, float]:
        """(sigma_ext, albedo, g) interpolated at one wavelength."""
        se = np.exp(np.interp(np.log(lam0), np.log(self.lam),
                              np.log(np.maximum(self.sigma_ext, 1e-300))))
        al = np.interp(lam0, self.lam, self.albedo)
        gg = np.interp(lam0, self.lam, self.g)
        return float(se), float(al), float(gg)


def mean_ivezic_benchmark(n: int = 200) -> MixTables:
    """The Ivezic et al. 1997 1D benchmark dust: extinction efficiency flat
    for lam <= 1 micron and ~ 1/lam above, zero albedo (pure absorption)
    (published benchmark definition; the reference ships it as the resource
    behind MeanIvezicBenchmarkDustMix, ref:
    SKIRT/core/MeanIvezicBenchmarkDustMix.hpp:13-27)."""
    lam = np.geomspace(0.01e-6, 3600e-6, n)
    l_um = lam * 1e6
    sigma0 = 1e-24  # arbitrary scale [m^2]; normalization fixes densities
    sigma = sigma0 * np.where(l_um <= 1.0, 1.0, 1.0 / l_um)
    return MixTables(lam=lam, sigma_ext=sigma,
                     albedo=np.zeros(n), g=np.zeros(n),
                     mu=4.0 / 3.0 * np.pi * (0.1e-6) ** 3 * 3000.0)


def mean_interstellar_approx(n: int = 300) -> MixTables:
    """Analytic approximation of the mean Milky Way dust extinction curve
    (stand-in for MeanInterstellarDustMix's resource table):

      * UV/optical: sigma ~ lam^-1.3 with a Drude 2175 A bump,
      * near-IR->FIR: steepening to sigma ~ lam^-2 beyond 10 um,
      * albedo ~0.6 in the optical, declining in UV and IR,
      * g ~0.6 UV -> 0.5 optical -> 0 in far-IR.

    kappa_ext(0.55um) ~ 2.4e4 cm2 per g of dust, a representative MW value.
    """
    lam = np.geomspace(0.01e-6, 3000e-6, n)
    l_um = lam * 1e6
    # extinction shape
    s_opt = (l_um / 0.55) ** -1.3
    # 2175A Drude bump
    x = 1.0 / l_um
    x0, gam = 4.6, 1.0
    drude = 0.35 * x**2 / ((x**2 - x0**2) ** 2 + x**2 * gam**2) * gam**2 * x0**2 / 4.6**2 * 4
    s_ir = (l_um / 0.55) ** -2.0 * (10.0 / 0.55) ** (2.0 - 1.3) * (10.0 / l_um) ** 0.0
    shape = np.where(l_um < 10.0, s_opt * (1 + drude), (l_um / 10.0) ** -2.0 * (10.0 / 0.55) ** -1.3)
    # calibrate kappa at V band
    mu = 4.0 / 3.0 * np.pi * (0.1e-6) ** 3 * 3000.0  # representative grain mass [kg]
    kappa_v = 2.4e3  # m^2/kg of dust
    sigma = shape / np.interp(0.55, l_um, shape) * kappa_v * mu
    albedo = 0.6 * np.exp(-((np.log(l_um / 0.4)) ** 2) / 8.0) * (l_um < 20) + 0.0
    g = np.clip(0.6 - 0.25 * np.log10(np.maximum(l_um, 1e-3) / 0.2), 0.0, 0.9) * (l_um < 5)
    return MixTables(lam=lam, sigma_ext=sigma, albedo=np.clip(albedo, 0, 0.95),
                     g=np.clip(g, 0, 0.95), mu=mu)


def power_law_test_mix(albedo: float = 0.5, g: float = 0.5,
                       slope: float = -1.0, sigma0: float = 1e-24,
                       n: int = 64) -> MixTables:
    """Simple synthetic mix for tests: sigma ~ (lam/0.55um)^slope, constant
    albedo and g."""
    lam = np.geomspace(0.01e-6, 1000e-6, n)
    sigma = sigma0 * (lam / 0.55e-6) ** slope
    return MixTables(lam=lam, sigma_ext=sigma,
                     albedo=np.full(n, albedo), g=np.full(n, g),
                     mu=1e-20)


def electron_mix(n: int = 8) -> MixTables:
    """Free electrons: wavelength-independent Thomson scattering, dipole
    phase function approximated by HG g=0 until polarization lands
    (ref: SKIRT/core/ElectronMix.hpp:56)."""
    lam = np.geomspace(1e-11, 1e-2, n)
    return MixTables(lam=lam,
                     sigma_ext=np.full(n, c.SIGMA_THOMSON),
                     albedo=np.ones(n), g=np.zeros(n),
                     mu=c.ELECTRON_MASS)


def mean_from_resource(resource_name: str) -> MixTables:
    """Mean (single-grain) dust mix from a stored-table resource with axis
    lambda(m) and quantities sigmaabs/sigmasca/g (ref:
    SingleGrainDustMix.cpp:16-21 — the Mean*BenchmarkDustMix family)."""
    from ..utils.filepaths import find_resource
    from ..utils.storedtable import read_stored_table

    tab = read_stored_table(find_resource(resource_name + ".stab"))
    lam = np.asarray(tab.axes_points[0], np.float64)
    sabs = np.asarray(tab.quantity("sigmaabs"), np.float64).reshape(-1)
    ssca = np.asarray(tab.quantity("sigmasca"), np.float64).reshape(-1)
    gg = np.asarray(tab.quantity("g"), np.float64).reshape(-1)
    sext = np.maximum(sabs + ssca, 1e-300)
    return MixTables(lam=lam, sigma_ext=sext, albedo=ssca / sext, g=gg,
                     mu=1.67e-27)


def tabulated(lam, sigma_ext, albedo, g, mu: float = 0.0) -> MixTables:
    """(ref: TabulatedDustMix / MeanListDustMix)"""
    return MixTables(lam=np.asarray(lam, np.float64),
                     sigma_ext=np.asarray(sigma_ext, np.float64),
                     albedo=np.asarray(albedo, np.float64),
                     g=np.asarray(g, np.float64), mu=mu)


def from_file(path: str) -> MixTables:
    """MeanFileDustMix text format: four columns — wavelength [micron],
    extinction mass coefficient kappa_ext [m2/kg], albedo, asymmetry g —
    using the reference's fixed arbitrary dust mass per hydrogen atom
    mu = 1.5e-29 kg/H to set the cross-section scale
    (ref: MeanFileDustMix.hpp:18-36)."""
    d = np.loadtxt(path)
    mu = 1.5e-29
    lam = d[:, 0] * 1e-6
    if lam[0] > lam[-1]:  # decreasing order is allowed
        d = d[::-1]
        lam = lam[::-1]
    return tabulated(lam, d[:, 1] * mu, d[:, 2], d[:, 3], mu=mu)


def stack(mixes: list[MixTables], lam_grid: np.ndarray | None = None):
    """Resample several mixes onto a common wavelength table; returns
    (lam, sigma_ext (H,T), albedo (H,T), g (H,T)) ready for make_medium."""
    if lam_grid is None:
        lo = max(m.lam[0] for m in mixes)
        hi = min(m.lam[-1] for m in mixes)
        lam_grid = np.geomspace(lo, hi, 200)
    se, al, gg = [], [], []
    for m in mixes:
        logs = np.interp(np.log(lam_grid), np.log(m.lam),
                         np.log(np.maximum(m.sigma_ext, 1e-300)))
        se.append(np.exp(logs))
        al.append(np.interp(lam_grid, m.lam, m.albedo))
        gg.append(np.interp(lam_grid, m.lam, m.g))
    return lam_grid, np.array(se), np.array(al), np.array(gg)


def from_stored_table(path: str, mu: float = 0.0) -> MixTables:
    """Build a mix from a SKIRT mean-optical-properties stored table
    (axes: lambda; quantities: absorption/scattering cross sections +
    asymmetry, as in the MeanXxxDustMix resources). This is the exact-parity
    path for users who have SKIRT resource packs
    (ref: MeanDustMix resource layout + StoredTable.hpp format)."""
    from ..utils.storedtable import read_stored_table
    t = read_stored_table(path)
    lam = t.axes_points[0]

    def find(*keys):
        for i, n in enumerate(t.quantity_names):
            ln = n.lower()
            if any(k in ln for k in keys):
                return t.values[..., i]
        return None

    sabs = find("abs")
    ssca = find("sca")
    g = None
    for i, n in enumerate(t.quantity_names):
        if n.lower() == "g" or "asym" in n.lower():
            g = t.values[..., i]
            break
    if sabs is None or ssca is None:
        raise ValueError(f"stored table {path} lacks abs/sca quantities "
                         f"(has {t.quantity_names})")
    if g is None:
        g = np.zeros_like(lam)
    sext = sabs + ssca
    albedo = np.where(sext > 0, ssca / np.maximum(sext, 1e-300), 0.0)
    return MixTables(lam=np.asarray(lam), sigma_ext=np.asarray(sext),
                     albedo=albedo, g=np.asarray(g), mu=mu)
