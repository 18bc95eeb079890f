"""Diffuse ionized gas: photoionized-plasma state + nebular emission.

Mechanism counterpart of the reference's DiffuseIonizedGasMix (ref:
SKIRT/core/DiffuseIonizedGasMix.hpp:153) — a hybrid of table lookups and an
inline ionization balance driven by the stored radiation field:

  * per-cell 5-bin ionizing-RF characterization (1-6 Ryd) -> ionization
    parameter log U and spectral-shape ratios R2-R5 (ref: the 5-bin
    characterization block of DiffuseIonizedGasMix.hpp);
  * gas temperature from a user-supplied table over log U (the reference's
    Cloudy stab packs are resource-blocked here; the table file stands in
    for the standard/transition stab pair) or the fixed defaultTemperature;
  * inline hydrogen ionization balance Gamma x_HI = alpha_B(T) n_e n_HII
    per cell (the reference's PhotoIonizationSolver tracks 10 species; H
    dominates the electron budget in the DIG regime this mix targets);
  * emission through the nebular machinery (media/nebular.py): H
    recombination lines + free-free/free-bound/two-photon continuum.

The per-cell state (T, logU, x_HII, n_e) converges across primary-emission
iterations exactly like the reference's per-cell criterion
(maxChangeInIonization / maxFractionNotConvergedCells).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .dynamic import UpdateResult

RYD_LAM = 91.1753e-9          # 1 Ryd in wavelength [m]
_BIN_RYD = np.array([1.0, 1.8, 2.58, 3.52, 4.0, 6.0])
C_LIGHT = 2.99792458e8
H_PLANCK = 6.62607015e-34
SIGMA_HI0 = 6.30e-22          # H ground-state photo cross section at 1 Ryd [m^2]


def alpha_B(T):
    """Case-B recombination coefficient [m^3/s] (Draine 2011 fit)."""
    T4 = np.asarray(T, np.float64) / 1e4
    return 2.54e-19 * T4 ** (-0.8163 - 0.0208 * np.log(T4))


def characterize_rf(rf, rf_borders, volumes, rf_scale):
    """Per-cell ionizing-field characterization.

    Returns (n_gamma (ncells,) ionizing photon number density [1/m^3],
    Gamma (ncells,) H photoionization rate [1/s], R (ncells, 4) shape
    ratios J_k/J_1 for bins 2..5). rf holds sqrt-scaled path deposits per
    (cell, bin); J_lambda = rf * rf_scale / (4 pi V dlam)."""
    rf64 = np.asarray(rf, np.float64)
    rb = np.asarray(rf_borders, np.float64)
    v = np.asarray(volumes, np.float64)
    dlam = np.diff(rb)
    J_lam = rf64 * rf_scale / (4.0 * np.pi * v[:, None] * dlam[None, :])
    lam_edges = RYD_LAM / _BIN_RYD          # descending wavelengths
    lam_c = np.sqrt(lam_edges[:-1] * lam_edges[1:])
    Jbin = np.zeros((rf64.shape[0], 5))
    for k in range(5):
        lo, hi = lam_edges[k + 1], lam_edges[k]
        # overlap of each RF bin with the Rydberg bin
        ov = np.maximum(0.0, np.minimum(rb[1:], hi) - np.maximum(rb[:-1], lo))
        Jbin[:, k] = J_lam @ ov              # [W/m^2/sr] band-integrated
    # photon-number flux density per bin: 4 pi J / (h c / lam)
    nphot = 4.0 * np.pi * Jbin * (lam_c[None, :] / (H_PLANCK * C_LIGHT))
    n_gamma = nphot.sum(axis=1) / C_LIGHT
    # photoionization rate with sigma ~ sigma0 (lam/lam_L)^3
    sigma = SIGMA_HI0 * (lam_c / RYD_LAM) ** 3
    Gamma = (nphot * sigma[None, :]).sum(axis=1)
    J1 = np.maximum(Jbin[:, :1], 1e-300)
    R = Jbin[:, 1:] / J1
    return n_gamma, Gamma, R


def ionization_balance(Gamma, nH, T):
    """x_HII from Gamma (1-x) = alpha_B(T) x^2 nH (quadratic root)."""
    a = alpha_B(T) * np.maximum(nH, 1e-300)
    g = np.asarray(Gamma, np.float64)
    # x = (-g + sqrt(g^2 + 4 a g)) / (2 a)
    x = np.where(g > 0,
                 (-g + np.sqrt(g * g + 4.0 * a * g)) / (2.0 * a), 0.0)
    return np.clip(x, 0.0, 1.0)


@dataclasses.dataclass
class DIGRecipe:
    """Per-iteration DIG state update + nebular secondary emission
    (ref: DiffuseIonizedGasMix.hpp:153 properties; the recipe plugs into
    Simulation.dynamic_recipes and Simulation.gas_emitters)."""

    nH: np.ndarray               # (ncells,) hydrogen number density [1/m^3]
    Z: np.ndarray                # (ncells,) metallicity
    rf_borders: np.ndarray
    default_T: float = 1e4
    use_cloudy_temperature: bool = True
    T_logU: tuple | None = None  # (logU axis, T values) user table
    max_change: float = 0.01     # maxChangeInIonization
    max_frac_not_converged: float = 0.1
    max_nH: float = 1e11         # maxHydrogenDensity ceiling [1/m^3]
    component: int | None = None  # medium component for opacity feedback
    kappa_logU: tuple | None = None  # (logU axis, absorber-fraction values)

    def state(self, rf, volumes, rf_scale):
        """(T, logU, x_HII, n_e) per cell from the radiation field."""
        nH = np.minimum(np.asarray(self.nH, np.float64),
                        self.max_nH if self.max_nH > 0 else np.inf)
        n_gamma, Gamma, R = characterize_rf(rf, self.rf_borders, volumes,
                                            rf_scale)
        U = n_gamma / np.maximum(nH, 1e-300)
        logU = np.log10(np.maximum(U, 1e-30))
        if self.use_cloudy_temperature and self.T_logU is not None:
            ax, tv = self.T_logU
            T = np.interp(logU, np.asarray(ax, np.float64),
                          np.asarray(tv, np.float64))
        else:
            T = np.full(len(nH), self.default_T)
        x = ionization_balance(Gamma, nH, T)
        ne = x * nH
        return T, logU, x, ne

    def update(self, nd: np.ndarray, rf, volumes, rf_scale: float,
               context=None) -> UpdateResult:
        T, logU, x, ne = self.state(rf, volumes, rf_scale)
        prev = context.get("dig_state") if context is not None else None
        if context is not None:
            context["dig_state"] = (T, logU, x, ne)
        nd = np.array(nd, np.float64, copy=True)
        n_changed = 0
        if self.component is not None and self.kappa_logU is not None:
            # opacity feedback: effective absorber density = f(logU) * nH
            ax, kv = self.kappa_logU
            f = np.interp(logU, np.asarray(ax, np.float64),
                          np.asarray(kv, np.float64))
            new_nd = f * np.minimum(self.nH, self.max_nH or np.inf)
            n_changed = int(np.sum(np.abs(nd[:, self.component] - new_nd)
                                   > 1e-9 * np.maximum(new_nd, 1e-300)))
            nd[:, self.component] = new_nd
        if prev is None:
            n_not = len(nd)
        else:
            T0, logU0 = prev[0], prev[1]
            relT = np.abs(T - T0) / np.maximum(np.abs(T0), 1e-300)
            relU = np.abs(logU - logU0) / np.maximum(np.abs(logU0), 1e-12)
            bad = (relT > self.max_change) | (relU > self.max_change)
            frac = float(bad.mean()) if len(nd) else 0.0
            n_not = int(bad.sum()) \
                if frac > self.max_frac_not_converged else 0
        return UpdateResult(nd, n_changed, n_not)

    def make_emitter(self, grid, ems_borders, spatial_bias=0.5,
                     lines=("Halpha", "Hbeta"), include_continuum=True):
        """A gas_emitters entry: rf -> secondary source launching the DIG
        nebular spectrum (ref: ContGasSecondarySource +
        LineGasSecondarySource over the DIG mix's emission)."""
        from ..sources import secondary as sec
        from . import nebular as neb

        calc = neb.NebularEmission(
            include_free_free=include_continuum,
            include_free_bound=include_continuum,
            include_two_photon=include_continuum,
            lines=tuple(lines))
        vols = grid.volumes()
        eb = np.asarray(ems_borders, np.float64)

        def build(rf, rf_scale):
            T, logU, x, ne = self.state(rf, vols, rf_scale)
            nHII = x * np.minimum(self.nH,
                                  self.max_nH if self.max_nH > 0
                                  else np.inf)
            eps, L_cell = calc.cell_spectra(eb, T, ne, nHII, vols)
            return sec.prepare(grid, L_cell, eps, eb, spatial_bias)

        return build
