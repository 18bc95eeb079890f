"""Wavelength grids: instrument/radiation-field binning meshes.

Equivalent of the reference's DisjointWavelengthGrid family
(ref: SKIRT/core/WavelengthGrid.hpp:43, DisjointWavelengthGrid.hpp:36,
LogWavelengthGrid/LinWavelengthGrid/NestedLogWavelengthGrid/
ResolutionWavelengthGrid/FileWavelengthGrid/ListWavelengthGrid/
OligoWavelengthGrid). A grid is represented by its border array (nb+1,)
(characteristic wavelengths are the geometric/arithmetic bin centers);
device-side binning is a searchsorted, done in the instruments/transport.
"""

from __future__ import annotations

import numpy as np


def lin_borders(lam_min: float, lam_max: float, n: int) -> np.ndarray:
    """(ref: LinWavelengthGrid / LinBorderWavelengthGrid)"""
    return np.linspace(lam_min, lam_max, n + 1)


def log_borders(lam_min: float, lam_max: float, n: int) -> np.ndarray:
    """(ref: LogWavelengthGrid)"""
    return np.geomspace(lam_min, lam_max, n + 1)


def resolution_borders(lam_min: float, lam_max: float, R: float) -> np.ndarray:
    """Constant spectral resolution R = lam/dlam
    (ref: ResolutionWavelengthGrid)."""
    n = max(1, int(np.ceil(np.log(lam_max / lam_min) / np.log1p(1.0 / R))))
    return np.geomspace(lam_min, lam_max, n + 1)


def nested_log_borders(lam_min: float, lam_max: float, n: int,
                       sub_min: float, sub_max: float, n_sub: int) -> np.ndarray:
    """Coarse log grid with a finer log subgrid nested inside
    (ref: NestedLogWavelengthGrid)."""
    coarse = np.geomspace(lam_min, lam_max, n + 1)
    fine = np.geomspace(sub_min, sub_max, n_sub + 1)
    keep = coarse[(coarse < sub_min) | (coarse > sub_max)]
    return np.unique(np.concatenate([keep, fine]))


def oligo_borders(wavelengths) -> np.ndarray:
    """Narrow disjoint bins (relative half-width 1e-3, i.e. width lam/500)
    around discrete wavelengths (ref: OligoWavelengthGrid.cpp:25
    setWavelengthBins(lams, 1e-3, true)).

    Note: disjoint narrow bins are represented as a border array with gap
    bins; callers using this must mask the gap bins at calibration.
    """
    ws = np.sort(np.asarray(wavelengths, np.float64))
    borders = []
    for w in ws:
        borders += [w * (1 - 1e-3), w * (1 + 1e-3)]
    return np.asarray(borders)


def list_borders(borders) -> np.ndarray:
    """(ref: ListBorderWavelengthGrid / FileBorderWavelengthGrid)"""
    b = np.sort(np.asarray(borders, np.float64))
    if len(b) < 2:
        raise ValueError("need at least two borders")
    return b


def centers(borders: np.ndarray, log: bool = True) -> np.ndarray:
    b = np.asarray(borders, np.float64)
    return np.sqrt(b[1:] * b[:-1]) if log else 0.5 * (b[1:] + b[:-1])
