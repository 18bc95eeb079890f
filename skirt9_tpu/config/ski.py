"""ski-file importer: build a Simulation from a SKIRT 9 parameter file.

TPU-native counterpart of the SMILE config stack (ref: SMILE/serialize/
XmlHierarchyCreator, SKIRT/core/SimulationItemRegistry.cpp — 390 item
types; SkirtUnitDef for unit-aware attribute parsing). Instead of a macro
DSL + runtime schema, item types map to Python builder functions registered
in _BUILDERS; unknown types raise with the item name so coverage gaps are
explicit. The subset grows with the engine's capabilities.

Usage:
    sim = load_ski("model.ski", num_packets=..., overrides...)
    rf, accs = sim.run_primary()  (or run_with_dust_emission)
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from ..geometries import analytic as ga
from ..geometries import axial as gax
from ..grids.cartesian import make_cartesian
from ..grids.octree import build_octree
from ..instruments import distant as dinst
from ..media import geometric as gm
from ..media import mixes as mx
from ..sources.base import GeometricSource, PointSource, TabulatedSED
from ..spectral import seds as sedlib
from ..spectral import wavelengths as wl
from ..transport import lifecycle as lc
from ..simulation import Simulation
from ..utils import units as U


def _q(attrs, name, qty, default=None):
    """Parse a unit-bearing attribute into SI."""
    if name not in attrs:
        if default is None:
            raise KeyError(f"missing attribute '{name}'")
        return default
    return U.parse(qty, attrs[name])


def _f(attrs, name, default=None):
    if name not in attrs:
        if default is None:
            raise KeyError(f"missing attribute '{name}'")
        return default
    return float(attrs[name])


def _child(el, tag):
    c = el.find(tag)
    return list(c)[0] if c is not None and len(c) else None


# ------------------------------------------------------------------ geometry

def build_geometry(el):
    t = el.tag
    a = el.attrib
    if t == "PlummerGeometry":
        return ga.PlummerGeometry(b=_q(a, "scaleLength", "length"))
    if t == "GammaGeometry":
        return ga.GammaGeometry(b=_q(a, "scaleLength", "length"),
                                gamma=_f(a, "gamma"))
    if t == "ShellGeometry":
        return ga.ShellGeometry(rmin=_q(a, "minRadius", "length"),
                                rmax=_q(a, "maxRadius", "length"),
                                p=_f(a, "exponent", 0.0))
    if t == "GaussianGeometry":
        return ga.GaussianGeometry(sigma=_q(a, "dispersion", "length"))
    if t == "ExpDiskGeometry":
        return ga.ExpDiskGeometry(h_r=_q(a, "scaleLength", "length"),
                                  h_z=_q(a, "scaleHeight", "length"))
    if t == "SersicGeometry":
        return ga.SersicGeometry(reff=_q(a, "effectiveRadius", "length"),
                                 m=_f(a, "index", 4.0))
    if t == "UniformSphereGeometry":  # convenience extension
        return ga.UniformSphereGeometry(rmax=_q(a, "maxRadius", "length"))
    if t == "EinastoGeometry":
        # the reference parameterizes by half-mass radius; solve for the
        # scale radius rs such that M(<rh) = M/2 (ref: EinastoGeometry.hpp)
        rh = _q(a, "halfMassRadius", "length")
        n = _f(a, "index")
        x = np.geomspace(1e-4, 30.0, 8192)  # matches EinastoGeometry rmax=30 rs
        w = x**2 * np.exp(-2 * n * (x ** (1.0 / n) - 1.0))
        cum = np.cumsum(w * np.gradient(x))
        xh = x[int(np.searchsorted(cum, 0.5 * cum[-1]))]  # rh/rs
        return ga.EinastoGeometry(rs=rh / xh, n=n)
    if t == "PseudoSersicGeometry":
        return ga.PseudoSersicGeometry(reff=_q(a, "effectiveRadius", "length"),
                                       m=_f(a, "index", 4.0))
    if t == "UniformBoxGeometry":
        x0, x1 = _q(a, "minX", "length"), _q(a, "maxX", "length")
        y0, y1 = _q(a, "minY", "length"), _q(a, "maxY", "length")
        z0, z1 = _q(a, "minZ", "length"), _q(a, "maxZ", "length")
        return ga.UniformBoxGeometry(lx=x1 - x0, ly=y1 - y0, lz=z1 - z0,
                                     cx=0.5 * (x0 + x1), cy=0.5 * (y0 + y1),
                                     cz=0.5 * (z0 + z1))
    if t == "TorusGeometry":
        return gax.TorusGeometry(
            p=_f(a, "exponent"), q=_f(a, "index"),
            delta=_q(a, "openingAngle", "posangle"),
            rmin=_q(a, "minRadius", "length"),
            rmax=_q(a, "maxRadius", "length"))
    if t == "ConicalShellGeometry":
        return gax.ConicalShellGeometry(
            p=_f(a, "exponent"),
            delta_in=_q(a, "minAngle", "posangle"),
            delta_out=_q(a, "maxAngle", "posangle"),
            rmin=_q(a, "minRadius", "length"),
            rmax=_q(a, "maxRadius", "length"))
    if t == "TTauriDiskGeometry":
        return gax.TTauriDiskGeometry(
            rd=_q(a, "scaleLength", "length"),
            zd=_q(a, "scaleHeight", "length"),
            rinn=_q(a, "minRadius", "length"),
            rout=_q(a, "maxRadius", "length"))
    if t == "RingGeometry":
        return gax.RingGeometry(r0=_q(a, "ringRadius", "length"),
                                width=_q(a, "width", "length"),
                                hz=_q(a, "height", "length"))
    if t == "AnnulusGeometry":
        return gax.AnnulusGeometry(rmin=_q(a, "minRadius", "length"),
                                   rmax=_q(a, "maxRadius", "length"),
                                   height=_q(a, "height", "length"))
    if t == "DonutGeometry":
        return gax.DonutGeometry(r0=_q(a, "largeRadius", "length"),
                                 rc=_q(a, "smallRadius", "length"))
    if t == "BrokenExpDiskGeometry":
        return gax.BrokenExpDiskGeometry(
            h_inn=_q(a, "scaleLengthInner", "length"),
            h_out=_q(a, "scaleLengthOuter", "length"),
            hz=_q(a, "scaleHeight", "length"),
            rb=_q(a, "breakRadius", "length"))
    raise NotImplementedError(f"geometry type '{t}' not supported yet")


# ---------------------------------------------------------------------- SEDs

def build_sed(el) -> TabulatedSED:
    t = el.tag
    a = el.attrib
    if t == "BlackBodySED":
        return sedlib.blackbody(_q(a, "temperature", "temperature"))
    if t == "QuasarSED":
        return sedlib.quasar()
    if t == "SunSED":
        return sedlib.sun_approx()
    if t == "FileSED":
        return sedlib.from_file(a["filename"])
    raise NotImplementedError(f"SED type '{t}' not supported yet")


def source_luminosity(el) -> float:
    """LuminosityNormalization subset (ref: IntegratedLuminosityNormalization)."""
    norm = _child(el, "normalization")
    if norm is None:
        return 1.0
    a = norm.attrib
    if norm.tag == "IntegratedLuminosityNormalization":
        return _q(a, "integratedLuminosity", "bolluminosity")
    if norm.tag == "SpecificLuminosityNormalization":
        return _q(a, "specificLuminosity", "monluminosity")
    raise NotImplementedError(f"normalization '{norm.tag}' not supported yet")


# ------------------------------------------------------------------- sources

def build_source(el):
    t = el.tag
    a = el.attrib
    if t == "PointSource":
        pos = (_q(a, "positionX", "length", 0.0),
               _q(a, "positionY", "length", 0.0),
               _q(a, "positionZ", "length", 0.0))
        sed_el = _child(el, "sed")
        sed = build_sed(sed_el) if sed_el is not None else None
        return PointSource(position=pos, luminosity=source_luminosity(el),
                           sed=sed)
    if t == "GeometricSource":
        geom = build_geometry(_child(el, "geometry"))
        sed_el = _child(el, "sed")
        sed = build_sed(sed_el) if sed_el is not None else None
        return GeometricSource(geometry=geom,
                               luminosity=source_luminosity(el), sed=sed)
    raise NotImplementedError(f"source type '{t}' not supported yet")


# --------------------------------------------------------------------- mixes

def build_mix(el, base_dir: str = ".") -> mx.MixTables:
    t = el.tag
    if t == "TrivialGasMix":
        a = el.attrib
        sabs = _q(a, "absorptionCrossSection", "section")
        ssca = _q(a, "scatteringCrossSection", "section")
        g = _f(a, "asymmetryParameter", 0.0)
        sext = sabs + ssca
        lam = np.array([1e-8, 1e-3])
        return mx.tabulated(lam, [sext, sext],
                            [ssca / sext, ssca / sext], [g, g])
    if t == "MeanIvezicBenchmarkDustMix":
        return mx.mean_ivezic_benchmark()
    if t == "MeanInterstellarDustMix":
        return mx.mean_interstellar_approx()
    if t == "ElectronMix":
        return mx.electron_mix()
    if t == "MeanFileDustMix":
        # input files resolve relative to the ski file's directory
        # (ref: FilePaths input path handling)
        import os as _os
        fn = el.attrib["filename"]
        if not _os.path.isabs(fn):
            fn = _os.path.join(base_dir, fn)
        return mx.from_file(fn)
    if t in ("MRNDustMix", "DraineLiDustMix", "ZubkoDustMix",
             "WeingartnerDraineDustMix", "ThemisDustMix",
             "ConfigurableDustMix"):
        # multi-grain mixes: size-distribution x composition integration
        # (ref: MultiGrainDustMix.hpp:108); the per-size-bin emission data is
        # kept on the MixTables via the `multigrain` attribute for the
        # stochastic calculator
        from ..media import grains as gr
        nb = int(_f(el.attrib, "numSilicateSizes", 6))
        if t == "MRNDustMix":
            mg = gr.mrn_mix(nb)
        elif t == "DraineLiDustMix":
            mg = gr.draine_li_mix(nb)
        elif t == "ZubkoDustMix":
            mg = gr.zubko_mix(nb)
        elif t == "WeingartnerDraineDustMix":
            mg = gr.weingartner_draine_mix(nb)
        elif t == "ThemisDustMix":
            mg = gr.themis_mix(nb)
        else:  # ConfigurableDustMix: explicit GrainPopulation children
            pops = []
            for p_el in el.iter("GrainPopulation"):
                comp_el = _child(p_el, "composition")
                comp = (gr.graphite_composition()
                        if comp_el is not None and "Graphite" in comp_el.tag
                        else gr.silicate_composition())
                sd_el = _child(p_el, "sizeDistribution")
                a = sd_el.attrib if sd_el is not None else {}
                amin = _q(a, "minSize", "grainsize") if "minSize" in a else 5e-9
                amax = _q(a, "maxSize", "grainsize") if "maxSize" in a else 250e-9
                if sd_el is not None and "LogNormal" in sd_el.tag:
                    sd = gr.log_normal_sizes(amin, amax,
                                             _q(a, "centroid", "grainsize")
                                             if "centroid" in a else 100e-9,
                                             _f(a, "width", 0.4))
                else:
                    # ref stores a positive exponent: dn/da ~ a^-exponent
                    # (PowerLawGrainSizeDistribution, default 3.5)
                    sd = gr.power_law_sizes(amin, amax,
                                            _f(a, "exponent", 3.5))
                nbins = int(_f(p_el.attrib, "numSizes", 6))
                mass = _q(p_el.attrib, "dustMassPerHydrogenAtom", "mass") \
                    if "dustMassPerHydrogenAtom" in p_el.attrib else 1e-29
                pops.append(gr.GrainPopulation(comp, sd, nbins, mass))
            mg = gr.build_multi_grain(pops)
        # MixTables is a frozen (but slot-less) dataclass; carry the
        # size-bin payload for the stochastic calculator on the object
        # itself so its lifetime is tied to the mix (no global cache)
        object.__setattr__(mg.mix, "_multigrain", mg)
        return mg.mix
    raise NotImplementedError(f"material mix '{t}' not supported yet")


def multigrain_for(mix) -> "object | None":
    return getattr(mix, "_multigrain", None)


def build_medium_normalization(el, geom, mix):
    norm = _child(el, "normalization")
    if norm is None:
        raise ValueError("medium needs a normalization")
    a = norm.attrib
    if norm.tag == "OpticalDepthMaterialNormalization":
        return gm.OpticalDepthNormalization(
            tau=_f(a, "opticalDepth"),
            lam=_q(a, "wavelength", "wavelength"),
            axis={"X": "x", "Y": "y", "Z": "z"}.get(a.get("axis", "Z"), "z"))
    if norm.tag == "MassMaterialNormalization":
        return gm.MassNormalization(mass=_q(a, "mass", "mass"))
    if norm.tag == "NumberMaterialNormalization":
        return gm.NumberNormalization(number=_f(a, "number"))
    raise NotImplementedError(f"normalization '{norm.tag}' not supported yet")


# --------------------------------------------------------------------- grids

def build_grid(el):
    t = el.tag
    a = el.attrib
    if t == "CartesianSpatialGrid":
        ext = ((_q(a, "minX", "length"), _q(a, "maxX", "length")),
               (_q(a, "minY", "length"), _q(a, "maxY", "length")),
               (_q(a, "minZ", "length"), _q(a, "maxZ", "length")))
        # mesh children (Lin by default)
        ns = []
        for mesh_name in ("meshX", "meshY", "meshZ"):
            m = _child(el, mesh_name)
            ns.append(int(m.attrib.get("numBins", 32)) if m is not None else 32)
        return make_cartesian(ext, tuple(ns))
    if t == "PolicyTreeSpatialGrid":
        ext = ((_q(a, "minX", "length"), _q(a, "maxX", "length")),
               (_q(a, "minY", "length"), _q(a, "maxY", "length")),
               (_q(a, "minZ", "length"), _q(a, "maxZ", "length")))
        pol = _child(el, "policy")
        pa = pol.attrib if pol is not None else {}
        return ("octree", ext,
                int(pa.get("minLevel", 2)), int(pa.get("maxLevel", 6)),
                float(pa.get("maxDustFraction", 1e-6)))

    def _mesh_bins(name, default=16):
        m = _child(el, name)
        return int(m.attrib.get("numBins", default)) if m is not None \
            else default

    def _mesh_is_log(name):
        # ref Mesh family (LogMesh/PowMesh/...); we honor LogMesh for
        # radial meshes and reject meshes we would silently linearize
        m = _child(el, name)
        if m is None or m.tag == "LinMesh":
            return False
        if m.tag == "LogMesh":
            return True
        raise NotImplementedError(f"{m.tag} for {name} not supported yet")

    if t == "Sphere1DSpatialGrid":
        from ..grids.sphere import make_sphere1d
        return make_sphere1d(_q(a, "maxRadius", "length"),
                             _mesh_bins("meshRadial", 32),
                             r_min=_q(a, "minRadius", "length")
                             if "minRadius" in a else 0.0,
                             log=_mesh_is_log("meshRadial"))
    if t == "Sphere2DSpatialGrid":
        from ..grids.polar import make_sphere2d
        return make_sphere2d(_q(a, "maxRadius", "length"),
                             _mesh_bins("meshRadial", 32),
                             _mesh_bins("meshPolar", 16),
                             log_r=_mesh_is_log("meshRadial"))
    if t == "Sphere3DSpatialGrid":
        from ..grids.polar import make_sphere3d
        return make_sphere3d(_q(a, "maxRadius", "length"),
                             _mesh_bins("meshRadial", 32),
                             _mesh_bins("meshPolar", 16),
                             _mesh_bins("meshAzimuthal", 16))
    if t == "Cylinder2DSpatialGrid":
        from ..grids.cylinder import make_cylinder2d
        return make_cylinder2d(_q(a, "maxRadius", "length"),
                               _q(a, "minZ", "length"),
                               _q(a, "maxZ", "length"),
                               _mesh_bins("meshRadial", 32),
                               _mesh_bins("meshZ", 32))
    if t == "Cylinder3DSpatialGrid":
        from ..grids.polar import make_cylinder3d
        return make_cylinder3d(_q(a, "maxRadius", "length"),
                               _q(a, "minZ", "length"),
                               _q(a, "maxZ", "length"),
                               _mesh_bins("meshRadial", 32),
                               _mesh_bins("meshAzimuthal", 16),
                               _mesh_bins("meshZ", 32))
    raise NotImplementedError(f"spatial grid '{t}' not supported yet")


# --------------------------------------------------------------- instruments

def build_wavelength_grid(el) -> np.ndarray:
    t = el.tag
    a = el.attrib
    if t == "LogWavelengthGrid":
        return wl.log_borders_skirt(_q(a, "minWavelength", "wavelength"),
                                    _q(a, "maxWavelength", "wavelength"),
                                    int(a["numWavelengths"]))
    if t == "LinWavelengthGrid":
        return wl.lin_borders_skirt(_q(a, "minWavelength", "wavelength"),
                                    _q(a, "maxWavelength", "wavelength"),
                                    int(a["numWavelengths"]))
    if t == "ListWavelengthGrid":
        lams = U.parse_list("wavelength", a["wavelengths"])
        return wl.oligo_borders(lams)
    raise NotImplementedError(f"wavelength grid '{t}' not supported yet")


def build_instrument(el, default_wlg):
    t = el.tag
    a = el.attrib
    wlg_el = _child(el, "wavelengthGrid")
    borders = (build_wavelength_grid(wlg_el) if wlg_el is not None
               else default_wlg)
    common = dict(
        name=a.get("instrumentName", t),
        wave_borders=tuple(borders),
        inclination=_q(a, "inclination", "angle", 0.0),
        azimuth=_q(a, "azimuth", "angle", 0.0),
        roll=_q(a, "roll", "angle", 0.0),
        distance=_q(a, "distance", "distance", 10 * 3.0857e16),
    )
    if t == "SEDInstrument":
        return dinst.DistantInstrumentCfg(**common)
    if t in ("FrameInstrument", "FullInstrument"):
        return dinst.DistantInstrumentCfg(
            **common,
            npx=int(a.get("numPixelsX", 250)),
            npy=int(a.get("numPixelsY", 250)),
            fovx=_q(a, "fieldOfViewX", "length"),
            fovy=_q(a, "fieldOfViewY", "length"),
            centerx=_q(a, "centerX", "length", 0.0),
            centery=_q(a, "centerY", "length", 0.0),
        )
    raise NotImplementedError(f"instrument '{t}' not supported yet")


# ----------------------------------------------------------------- top level

def load_ski(path: str, num_packets: int | None = None,
             batch_size: int = 16384, seed: int = 0,
             max_events: int = 64) -> Simulation:
    """Parse a .ski file into a runnable Simulation.

    (ref: SkirtCommandLineHandler::doSimulation, SkirtCommandLineHandler.cpp:295
    — parse, build item tree, setup; here: parse, build tables.)
    """
    tree = ET.parse(path)
    with open(path, "r", encoding="utf-8") as f:
        ski_text = f.read()
    root = tree.getroot()
    mcs = root.find("MonteCarloSimulation")
    if mcs is None:
        raise ValueError("not a SKIRT 9 ski file (no MonteCarloSimulation)")
    mode = mcs.attrib.get("simulationMode", "ExtinctionOnly")
    iterate_secondary = mcs.attrib.get("iterateSecondaryEmission",
                                       "false") == "true"
    oligo = mode.startswith("Oligo")
    n_pk = num_packets or int(float(mcs.attrib.get("numPackets", 1e6)))

    # sources
    src_sys = mcs.find("sourceSystem/SourceSystem")
    sources = [build_source(e) for e in src_sys.find("sources")] \
        if src_sys is not None else []
    if oligo and src_sys is not None:
        # oligochromatic regime: discrete wavelengths, sources emit at the
        # (first) discrete wavelength with their SED-weighted luminosity
        # (ref: Configuration.cpp:58 oligochromatic setup)
        import dataclasses as _dc
        lams = U.parse_list("wavelength", src_sys.attrib["wavelengths"])
        sources = [_dc.replace(s, sed=None, lam0=lams[0]) for s in sources]
    src_range = None
    if src_sys is not None:
        a = src_sys.attrib
        if "minWavelength" in a:
            src_range = (U.parse("wavelength", a["minWavelength"]),
                         U.parse("wavelength", a["maxWavelength"]))
    if src_range is not None and not oligo:
        # the reference normalizes SEDs and samples wavelengths over the
        # source range (ref: SourceSystem min/maxWavelength +
        # IntegratedLuminosityNormalization wavelengthRange="Source")
        import dataclasses as _dc
        sources = [
            _dc.replace(s, sed=sedlib.clipped(s.sed, *src_range))
            if getattr(s, "sed", None) is not None else s
            for s in sources]

    # media + grid
    med_sys = mcs.find("mediumSystem/MediumSystem")
    grid = None
    medium = None
    components = []
    if med_sys is not None:
        for m_el in med_sys.find("media"):
            if m_el.tag != "GeometricMedium":
                raise NotImplementedError(f"medium '{m_el.tag}' not supported yet")
            geom = build_geometry(_child(m_el, "geometry"))
            mix = build_mix(_child(m_el, "materialMix"),
                            base_dir=os.path.dirname(os.path.abspath(path)))
            norm = build_medium_normalization(m_el, geom, mix)
            components.append((geom, mix, norm))
        grid_el = list(med_sys.find("grid"))[0]
        grid = build_grid(grid_el)
        if isinstance(grid, tuple) and grid[0] == "octree":
            _, ext, minl, maxl, maxfrac = grid
            geom0 = components[0][0]
            grid = build_octree(ext, geom0.density_np, max_level=maxl,
                                min_level=minl, max_fraction=max(maxfrac, 1e-4))
        medium = gm.build_medium(grid, components)

    if grid is None:
        # no medium: trivial one-cell empty grid spanning the sources
        R = 3.0857e17
        grid = make_cartesian(((-R, R), (-R, R), (-R, R)), (1, 1, 1))
        import jax.numpy as jnp
        from ..media import system as msys
        medium = msys.make_medium(grid, np.zeros(1), np.array([1e-8, 1e-3]),
                                  np.zeros((1, 2)), np.zeros((1, 2)),
                                  np.zeros((1, 2)))

    # instruments
    if oligo:
        lams = U.parse_list("wavelength", src_sys.attrib["wavelengths"])
        default_wlg = wl.oligo_borders(lams)
    elif src_range is None:
        default_wlg = wl.log_borders_skirt(0.1e-6, 10e-6, 25)
    else:
        default_wlg = wl.log_borders_skirt(src_range[0], src_range[1], 25)
    inst_sys = mcs.find("instrumentSystem/InstrumentSystem")
    instruments = []
    if inst_sys is not None:
        dwlg_el = inst_sys.find("defaultWavelengthGrid")
        if dwlg_el is not None and len(dwlg_el):
            default_wlg = build_wavelength_grid(list(dwlg_el)[0])
        inst_list = inst_sys.find("instruments")
        for i_el in (list(inst_list) if inst_list is not None else []):
            instruments.append(build_instrument(i_el, default_wlg))

    with_emission = mode in ("DustEmission", "DustAndGasEmission")
    # radiation-field / dust-emission wavelength grids: explicit items in
    # the ski override the defaults (ref: RadiationFieldOptions.hpp:30,
    # DustEmissionOptions dustEmissionWLG)
    rf_borders = None
    ems_borders = None
    rf_el = mcs.find(".//radiationFieldOptions/RadiationFieldOptions/"
                     "radiationFieldWLG")
    if rf_el is not None and len(rf_el):
        rf_borders = build_wavelength_grid(list(rf_el)[0])
    de_wlg_el = mcs.find(".//dustEmissionOptions/DustEmissionOptions/"
                         "dustEmissionWLG")
    if de_wlg_el is not None and len(de_wlg_el):
        ems_borders = build_wavelength_grid(list(de_wlg_el)[0])
    if rf_borders is None and (with_emission or mode.startswith("Iterate")):
        rf_borders = wl.log_borders_skirt(*(src_range or (0.05e-6, 10e-6)), 25)
    if ems_borders is None and with_emission:
        ems_borders = wl.log_borders_skirt(1e-6, 2000e-6, 40)

    # dust emission type (ref: DustEmissionOptions dustEmissionType); the
    # stochastic calculator needs the multi-grain size-bin tables of the
    # (first multi-grain) dust component
    ems_type = "Equilibrium"
    grain_tables = None
    de_opts = mcs.find(".//dustEmissionOptions/DustEmissionOptions")
    if de_opts is not None and \
            de_opts.attrib.get("dustEmissionType") == "Stochastic":
        ems_type = "Stochastic"
    grain_component = 0
    for h, (_, mix_i, _) in enumerate(components):
        mg_i = multigrain_for(mix_i)
        if mg_i is not None:
            grain_tables = mg_i
            grain_component = h
            break

    max_steps = grid.max_steps() if hasattr(grid, "max_steps") else 128
    opts = lc.TransportOptions(max_steps=min(max_steps, 256),
                               max_events=max_events,
                               store_rf=rf_borders is not None)
    sim = Simulation(
        grid=grid, medium=medium, sources=sources, instruments=instruments,
        options=opts, rf_borders=rf_borders, ems_borders=ems_borders,
        num_packets=n_pk, batch_size=batch_size, seed=seed,
        dust_emission_type=ems_type, grain_tables=grain_tables,
        grain_component=grain_component, iterate_secondary=iterate_secondary)
    # keep the exact configuration for the parameters.xml round-trip
    # (ref: SkirtCommandLineHandler.cpp:342-347 writes parameters.xml)
    sim.ski_text = ski_text
    return sim
