"""Named resource-backed SEDs, SED families, bands, and wavelength grids.

The reference's named stellar-population items are thin wrappers around
stored-table resources: each class contributes only a resource-file naming
rule, the axes declaration, and the parameter conventions
(ref: SKIRT/core/BruzualCharlotSEDFamily.cpp:25-30,
MarastonSEDFamily.cpp:24-27, Starburst99SEDFamily.cpp:23,
FSPSSEDFamily.cpp:24-32, BpassSEDFamily.cpp:25-35,
ToddlersSEDFamily.cpp:32-55, MappingsSEDFamily.cpp:23,
CastelliKuruczSEDFamily.cpp:21 + clampParameterValues:43-61,
FamilySED.cpp:12-31, BroadBand.cpp:27-33). This module implements those
rules over the generic stored-table family loader
(spectral/sedfamily.load_family_stab) + resource discovery
(utils/filepaths) — with a SKIRT9 resource pack on disk the named ski
items are drop-in; without one they raise FileNotFoundError naming the
missing resource.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import filepaths as fp
from ..utils.constants import YEAR
from . import sedfamily as sf
from ..sources.base import TabulatedSED


@dataclasses.dataclass(frozen=True)
class FamilySpec:
    """Resource-naming rule + parameter conventions of one named family."""

    resource: object          # str or callable(attrs) -> resource base name
    params: tuple             # snapshot parameter names after the scale
    scale_name: str = "Minit"
    # per-parameter SI conversion applied to ski attribute values
    to_si: tuple = ()


def _bc_name(a):
    imf = a.get("imf", "Chabrier")
    res = a.get("resolution", "Low")
    return f"BruzualCharlotSEDFamily_{imf}_" \
           f"{'lr' if res == 'Low' else 'hr'}"


def _maraston_name(a):
    return f"MarastonSEDFamily_{a.get('imf', 'Kroupa')}"


def _fsps_name(a):
    return f"FSPSSEDFamily_{a.get('imf', 'Chabrier')}"


def _bpass_name(a):
    name = "BpassSEDFamily"
    imf = a.get("imf", "Chabrier300")
    name += f"_{imf}"
    if a.get("resolution", "Original") == "Downsampled":
        name += "_downsampled"
    return name


def _toddlers_name(a):
    name = "ToddlersSEDFamily"
    mode = a.get("sedMode", "SFRNormalized")
    name += "_Cloud" if mode == "Cloud" else "_SFRNormalized"
    tpl = a.get("stellarTemplate", "SB99Kroupa100Sin")
    name += {"SB99Kroupa100Sin": "_SB99_kroupa100_sin",
             "BPASSChab100Bin": "_BPASS_chab100_bin",
             "BPASSChab300Bin": "_BPASS_chab300_bin"}[tpl]
    name += "_Dust" if a.get("includeDust", "true") == "true" else "_noDust"
    name += "_lr" if a.get("resolution", "Low") == "Low" else "_hr"
    if mode == "SFRNormalized":
        name += ("_30Myr" if a.get("sfrPeriod", "Period10Myr")
                 == "Period30Myr" else "_10Myr")
    return name


NAMED_FAMILIES: dict[str, FamilySpec] = {
    "BruzualCharlotSEDFamily": FamilySpec(_bc_name, ("Z", "t")),
    "MarastonSEDFamily": FamilySpec(_maraston_name, ("Z", "t")),
    "Starburst99SEDFamily": FamilySpec("Starburst99SEDFamily", ("Z", "t")),
    "FSPSSEDFamily": FamilySpec(_fsps_name, ("Z", "t")),
    "BpassSEDFamily": FamilySpec(_bpass_name, ("Z", "t")),
    # MAPPINGS III starburst regions: scale = SFR [Msun/yr], params
    # metallicity, compactness logC, ISM pressure, PDR fraction
    "MappingsSEDFamily": FamilySpec("MappingsSEDFamily",
                                    ("Z", "logC", "P", "fPDR"),
                                    scale_name="SFR"),
    # Castelli-Kurucz stellar atmospheres: scale = 4*pi*R^2, quantity is
    # surface flux F_lambda
    "CastelliKuruczSEDFamily": FamilySpec("CastelliKuruczSEDFamily",
                                          ("Z", "Teff", "g"),
                                          scale_name="area"),
}

# named single-SED wrappers (FamilySED subclasses in the reference:
# family + fixed parameters + normalization handled by the source)
NAMED_SEDS = {
    "BruzualCharlotSED": "BruzualCharlotSEDFamily",
    "MarastonSED": "MarastonSEDFamily",
    "Starburst99SED": "Starburst99SEDFamily",
    "FSPSSED": "FSPSSEDFamily",
    "BpassSED": "BpassSEDFamily",
    "CastelliKuruczSED": "CastelliKuruczSEDFamily",
    "MappingsSED": "MappingsSEDFamily",
    "ToddlersSED": "ToddlersSEDFamily",
}


def load_named_family(kind: str, attrs: dict | None = None) -> sf.SEDFamily:
    """Resolve + load a named family's resource into an SEDFamily."""
    if kind == "ToddlersSEDFamily":
        spec = FamilySpec(_toddlers_name, ("age",), scale_name="SFR")
    else:
        spec = NAMED_FAMILIES[kind]
    a = attrs or {}
    base = spec.resource(a) if callable(spec.resource) else spec.resource
    path = fp.find_resource(base + ".stab")
    fam = sf.load_family_stab(path, scale_name=spec.scale_name)
    return fam


def _ck_clamp(T: float, g: float) -> tuple:
    """Castelli-Kurucz valid-grid clamping (the published atmosphere grid
    has no models at high T + low g; same cutoffs as the reference,
    ref: CastelliKuruczSEDFamily.cpp:43-61)."""
    Tv = [49000, 39000, 31000, 26000, 19000, 11750, 9000, 8250, 7500, 6000]
    gv = [10.0 ** (e - 2.0)
          for e in (5, 4.5, 4, 3.5, 3, 2.5, 2, 1.5, 1, 0.5)]
    for Ti, gi in zip(Tv, gv):
        if T > Ti and g < gi:
            return T, gi
    return T, g


def named_sed(kind: str, attrs: dict, q) -> TabulatedSED:
    """Build the named FamilySED's spectrum: the family evaluated at the
    ski-configured parameters with GEOMETRIC (log-value) interpolation,
    as the reference's log-scaled stored tables interpolate
    (ref: FamilySED.cpp:31 via StoredTable value interpolation).

    q(attrs, name, quantity, default) must return SI values (the ski
    loader's unit parser)."""
    fam_kind = NAMED_SEDS[kind]
    fam = load_named_family(fam_kind, attrs)
    if fam_kind in ("BruzualCharlotSEDFamily", "MarastonSEDFamily",
                    "Starburst99SEDFamily", "FSPSSEDFamily",
                    "BpassSEDFamily"):
        Z = float(attrs.get("metallicity", 0.02))
        t = q(attrs, "age", "time", 5e9 * YEAR) / YEAR
        params = [Z, t]
    elif fam_kind == "CastelliKuruczSEDFamily":
        Z = float(attrs.get("metallicity", 0.02))
        T = q(attrs, "temperature", "temperature", 5778.0)
        g = q(attrs, "gravity", "acceleration", 274.0)
        T, g = _ck_clamp(T, g)
        params = [Z, T, g]
    elif fam_kind == "MappingsSEDFamily":
        params = [float(attrs.get("metallicity", 0.02)),
                  float(attrs.get("compactness", 5.0)),
                  q(attrs, "pressure", "pressure", 1e-12),
                  float(attrs.get("coveringFactor", 0.2))]
    else:  # Toddlers
        params = [q(attrs, "age", "time", 2.5e6 * YEAR) / YEAR]
    s = fam.specific_luminosity_geometric(np.asarray([params]))[0]
    keep = s > 0
    if keep.sum() < 2:
        raise ValueError(f"{kind}: spectrum is empty at parameters {params}")
    return TabulatedSED(lam=fam.lam[keep], s=s[keep])


def broad_band(band_name: str):
    """BroadBand: named filter transmission curve from the *_BroadBand.stab
    resources (ref: BroadBand.cpp:27-33 segment matching; transmission
    quantity T(1/m) already includes the photon-counter convention)."""
    from ..utils.storedtable import read_stored_table
    from .bands import Band

    segments = [s for s in band_name.replace("_", " ").upper().split()
                if s]
    fn = fp.resource_name("_BroadBand.stab", segments)
    tab = read_stored_table(fp.find_resource(fn))
    lam = tab.axes_points[0]
    T = tab.quantity(tab.quantity_names[0]).reshape(-1)
    return Band(name=band_name, lam=np.asarray(lam, np.float64),
                transmission=np.asarray(T, np.float64))


def predefined_band_wavelength_grid(band_names: list[str]):
    """PredefinedBandWavelengthGrid / BroadBand list -> Band tuple for the
    instrument's band mode (ref: BandWavelengthGrid.hpp; the three GALEX +
    SDSS + 2MASS + WISE + HERSCHEL set lives in the resource pack)."""
    return tuple(broad_band(n) for n in band_names)
