"""Interactive console wizard: create a ski file by Q&A.

Counterpart of the reference's interactive mode (ref:
SkirtCommandLineHandler::doInteractive, SkirtCommandLineHandler.cpp:127 —
`skirt` with no arguments walks the SMILE schema asking one question per
property and writes the resulting ski file). The full reference schema
walk spans 390 item types; this wizard walks a curated decision tree
over the capability set this framework implements, materializing schema
defaults for everything not asked, so the generated ski runs unmodified
here AND in the reference.

The question loop is injectable (`ask(prompt, default, choices)`) so the
wizard is scriptable and testable without a TTY.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _console_ask(prompt, default=None, choices=None):
    msg = prompt
    if choices:
        msg += "\n" + "\n".join(f"  {i + 1}. {c}"
                                for i, c in enumerate(choices))
        msg += f"\nEnter a number [1-{len(choices)}]"
    if default is not None:
        msg += f" ({default})"
    ans = input(msg + ": ").strip()
    if not ans:
        return default if not choices else choices[0]
    if choices:
        try:
            return choices[int(ans) - 1]
        except (ValueError, IndexError):
            return ans if ans in choices else choices[0]
    return ans


def _sub(parent, link, tag, **attrs):
    """<parent><link type=...><tag attrs/></link></parent> (SMILE shape)."""
    li = ET.SubElement(parent, link, {"type": attrs.pop("_type", tag)})
    return ET.SubElement(li, tag, {k: str(v) for k, v in attrs.items()})


GEOMETRIES = {
    "Plummer sphere": ("PlummerGeometry", {"scaleLength": "0.5 pc"}),
    "power-law shell": ("ShellGeometry",
                        {"minRadius": "0.01 pc", "maxRadius": "1 pc",
                         "exponent": "0"}),
    "exponential disk": ("ExpDiskGeometry",
                         {"scaleLength": "1 pc", "scaleHeight": "0.2 pc",
                          "minRadius": "0 pc", "maxRadius": "0 pc",
                          "maxZ": "0 pc"}),
    "Sersic bulge": ("SersicGeometry",
                     {"effectiveRadius": "1 pc", "index": "4"}),
    "uniform box": ("UniformBoxGeometry",
                       {"minX": "-1 pc", "maxX": "1 pc", "minY": "-1 pc",
                        "maxY": "1 pc", "minZ": "-1 pc", "maxZ": "1 pc"}),
}

MIXES = {
    "mean interstellar dust (file)": None,   # handled: MeanFileDustMix
    "MRN silicate+graphite": ("MRNDustMix", {}),
    "Themis": ("ThemisDustMix", {}),
    "Draine & Li": ("DraineLiDustMix", {}),
    "electrons (Thomson)": ("ElectronMix", {"includePolarization": "false"}),
}


def schema_item(ask, parent_el, type_name: str, hv=None) -> ET.Element:
    """Build ANY accepted item by walking its harvested property list —
    the schema-driven path of the reference wizard (one question per
    property; ref: SMILE/wizard property panes over SchemaDef). The
    property lists come from config/harvest.py, i.e. from the loader's
    own code, so every question corresponds to an attribute the engine
    actually consumes."""
    from ..utils import units as U
    from .harvest import harvest

    if hv is None:
        hv = harvest()
    attrs = {}
    children = []
    for p in (hv.get(type_name) or {}).values():
        if p.kind == "item":
            children.append(p)
            continue
        default = None
        if p.default is not None:
            raw = p.default.strip("'\"")
            if p.kind == "quantity":
                try:
                    default = U.format_si(p.quantity, float(raw))
                except (ValueError, KeyError):
                    default = raw
            else:
                default = raw
        prompt = f"{type_name}.{p.name}"
        if p.kind == "quantity" and p.quantity:
            prompt += f" [{p.quantity}]"
        if p.required:
            prompt += " (required)"
        v = ask(prompt, default)
        if v not in (None, ""):
            attrs[p.name] = str(v)
    el = ET.SubElement(parent_el, type_name, attrs)
    for c in children:
        tname = ask(f"{type_name}.{c.name}: child item type "
                    "(empty to skip)", "")
        if tname:
            li = ET.SubElement(el, c.name, {"type": tname})
            schema_item(ask, li, tname, hv)
    return el


OTHER = "other (any accepted type, schema-driven)"


def run_wizard(out_path: str, ask=None) -> str:
    """Walk the Q&A tree and write a ski file; returns the path."""
    ask = ask or _console_ask

    mode = ask("What is the simulation mode?", "ExtinctionOnly",
               ["ExtinctionOnly", "DustEmission", "NoMedium"])
    packets = ask("How many photon packets?", "1e6")
    lmin = ask("Minimum source wavelength (micron)?", "0.09")
    lmax = ask("Maximum source wavelength (micron)?", "100")

    root = ET.Element("skirt-simulation-hierarchy",
                      {"type": "MonteCarloSimulation", "format": "9",
                       "producer": "skirt9_tpu wizard"})
    mcs = ET.SubElement(root, "MonteCarloSimulation",
                        {"userLevel": "Regular", "simulationMode": mode,
                         "numPackets": str(packets)})
    _sub(mcs, "random", "Random", _type="Random", seed="0")
    _sub(mcs, "units", "ExtragalacticUnits", _type="Units",
         fluxOutputStyle="Wavelength")

    # ---- source
    ssl = ET.SubElement(mcs, "sourceSystem", {"type": "SourceSystem"})
    ss = ET.SubElement(ssl, "SourceSystem",
                       {"minWavelength": f"{lmin} micron",
                        "maxWavelength": f"{lmax} micron",
                        "sourceBias": "0.5"})
    srcs = ET.SubElement(ss, "sources", {"type": "Source"})
    stype = ask("What kind of source?", "point source",
                ["point source", "geometric source"])
    if stype == "point source":
        src = ET.SubElement(srcs, "PointSource",
                            {"positionX": "0 pc", "positionY": "0 pc",
                             "positionZ": "0 pc", "sourceWeight": "1",
                             "wavelengthBias": "0.5"})
    else:
        src = ET.SubElement(srcs, "GeometricSource",
                            {"sourceWeight": "1", "wavelengthBias": "0.5"})
        gname = ask("Which source geometry?", None,
                    list(GEOMETRIES) + [OTHER])
        if gname == OTHER:
            tname = ask("Geometry type name?", "PlummerGeometry")
            li = ET.SubElement(src, "geometry", {"type": "Geometry"})
            schema_item(ask, li, tname)
        else:
            tag, attrs = GEOMETRIES[gname]
            _sub(src, "geometry", tag, _type="Geometry", **attrs)
    T = ask("Black-body temperature (K)?", "5778")
    _sub(src, "sed", "BlackBodySED", _type="SED", temperature=f"{T} K")
    L = ask("Integrated luminosity (Lsun)?", "1e5")
    norm = ET.SubElement(src, "normalization",
                         {"type": "LuminosityNormalization"})
    ET.SubElement(norm, "IntegratedLuminosityNormalization",
                  {"wavelengthRange": "Source",
                   "integratedLuminosity": f"{L} Lsun"})

    # ---- medium
    if mode != "NoMedium":
        msl = ET.SubElement(mcs, "mediumSystem", {"type": "MediumSystem"})
        ms = ET.SubElement(msl, "MediumSystem")
        if mode == "DustEmission":
            rfl = ET.SubElement(ms, "radiationFieldOptions",
                                {"type": "RadiationFieldOptions"})
            rf = ET.SubElement(rfl, "RadiationFieldOptions",
                               {"storeRadiationField": "true"})
            wl = ET.SubElement(rf, "radiationFieldWLG",
                               {"type": "DisjointWavelengthGrid"})
            ET.SubElement(wl, "LogWavelengthGrid",
                          {"minWavelength": f"{lmin} micron",
                           "maxWavelength": f"{lmax} micron",
                           "numWavelengths": "25"})
            del_ = ET.SubElement(ms, "dustEmissionOptions",
                                 {"type": "DustEmissionOptions"})
            de = ET.SubElement(del_, "DustEmissionOptions",
                               {"dustEmissionType": "Equilibrium",
                                "sourceWeight": "1", "wavelengthBias": "0.5"})
            wl2 = ET.SubElement(de, "dustEmissionWLG",
                                {"type": "DisjointWavelengthGrid"})
            ET.SubElement(wl2, "LogWavelengthGrid",
                          {"minWavelength": "1 micron",
                           "maxWavelength": "2000 micron",
                           "numWavelengths": "40"})
        media = ET.SubElement(ms, "media", {"type": "Medium"})
        gm = ET.SubElement(media, "GeometricMedium",
                           {"velocityMagnitude": "0 km/s"})
        gname = ask("Which medium geometry?", None,
                    list(GEOMETRIES) + [OTHER])
        if gname == OTHER:
            tname = ask("Geometry type name?", "PlummerGeometry")
            li = ET.SubElement(gm, "geometry", {"type": "Geometry"})
            schema_item(ask, li, tname)
        else:
            tag, attrs = GEOMETRIES[gname]
            _sub(gm, "geometry", tag, _type="Geometry", **attrs)
        mname = ask("Which material mix?", None, list(MIXES))
        mm = ET.SubElement(gm, "materialMix", {"type": "MaterialMix"})
        if MIXES[mname] is None:
            fn = ask("Mean dust properties file?", "mrn_mean.txt")
            ET.SubElement(mm, "MeanFileDustMix", {"filename": fn})
        else:
            tag2, attrs2 = MIXES[mname]
            ET.SubElement(mm, tag2, attrs2)
        tau = ask("Optical depth along the Z axis at 0.55 micron?", "1.0")
        nr = ET.SubElement(gm, "normalization",
                           {"type": "MaterialNormalization"})
        ET.SubElement(nr, "OpticalDepthMaterialNormalization",
                      {"axis": "Z", "wavelength": "0.55 micron",
                       "opticalDepth": str(tau)})
        gtype = ask("Which spatial grid?", "Cartesian",
                    ["Cartesian", "octree"])
        ext = ask("Grid half-extent (pc)?", "1.2")
        gl = ET.SubElement(ms, "grid", {"type": "SpatialGrid"})
        box = {f"{mm_}{ax}": f"{s}{ext} pc"
               for ax in "XYZ" for mm_, s in (("min", "-"), ("max", ""))}
        if gtype == "Cartesian":
            nbins = ask("Cells per axis?", "32")
            cg = ET.SubElement(gl, "CartesianSpatialGrid", box)
            for ax in "XYZ":
                mesh = ET.SubElement(cg, f"mesh{ax}", {"type": "Mesh"})
                ET.SubElement(mesh, "LinMesh", {"numBins": str(nbins)})
        else:
            lvl = ask("Maximum octree level?", "6")
            tg = ET.SubElement(gl, "PolicyTreeSpatialGrid",
                               dict(box, minLevel="2", maxLevel=str(lvl)))
            pol = ET.SubElement(tg, "policy", {"type": "TreePolicy"})
            ET.SubElement(pol, "DensityTreePolicy",
                          {"minLevel": "2", "maxLevel": str(lvl),
                           "maxDustFraction": "1e-6"})

    # ---- instruments
    il = ET.SubElement(mcs, "instrumentSystem", {"type": "InstrumentSystem"})
    isys = ET.SubElement(il, "InstrumentSystem")
    dwl = ET.SubElement(isys, "defaultWavelengthGrid",
                        {"type": "WavelengthGrid"})
    ET.SubElement(dwl, "LogWavelengthGrid",
                  {"minWavelength": f"{lmin} micron",
                   "maxWavelength": "1000 micron" if mode == "DustEmission"
                   else f"{lmax} micron",
                   "numWavelengths": "40"})
    insts = ET.SubElement(isys, "instruments", {"type": "Instrument"})
    itype = ask("Which instrument?", "SED + frames",
                ["SED + frames", "SED only"])
    dist = ask("Observer distance (pc)?", "100")
    incl = ask("Inclination (deg)?", "0")
    common = {"instrumentName": "i0", "distance": f"{dist} pc",
              "inclination": f"{incl} deg", "azimuth": "0 deg",
              "roll": "0 deg", "recordComponents": "false",
              "numScatteringLevels": "0", "recordPolarization": "false",
              "recordStatistics": "false"}
    if itype == "SED + frames":
        ET.SubElement(insts, "FullInstrument",
                      dict(common, fieldOfViewX="4 pc", numPixelsX="64",
                           centerX="0 pc", fieldOfViewY="4 pc",
                           numPixelsY="64", centerY="0 pc"))
    else:
        ET.SubElement(insts, "SEDInstrument", dict(common, radius="0 pc"))

    pl = ET.SubElement(mcs, "probeSystem", {"type": "ProbeSystem"})
    ET.SubElement(pl, "ProbeSystem")

    ET.indent(root)
    ET.ElementTree(root).write(out_path, encoding="UTF-8",
                               xml_declaration=True)
    return out_path
