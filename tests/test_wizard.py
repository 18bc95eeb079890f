"""Interactive ski-creation wizard (ref: SkirtCommandLineHandler::
doInteractive — `skirt` with no arguments builds a ski by Q&A). The
question loop is injectable, so these tests drive scripted sessions and
run the generated ski end to end through the loader."""

import numpy as np

from skirt9_tpu.config.wizard import run_wizard


def _scripted(answers):
    """ask() that pops scripted answers; empty string = take the default."""
    it = iter(answers)

    def ask(prompt, default=None, choices=None):
        try:
            a = next(it)
        except StopIteration:
            a = ""
        if a == "":
            return default if (default is not None or not choices) \
                else choices[0]
        return a

    return ask


def test_wizard_extinction_cartesian(tmp_path):
    from skirt9_tpu.config.ski import load_ski

    (tmp_path / "mrn_mean.txt").write_bytes(
        open("tests/golden/mrn_mean.txt", "rb").read())
    path = str(tmp_path / "w.ski")
    answers = [
        "ExtinctionOnly", "2e4", "0.4", "0.8",      # mode, packets, range
        "point source", "5778", "1e5",              # source
        "power-law shell", "mean interstellar dust (file)",
        "mrn_mean.txt", "1.0",                      # medium + tau
        "Cartesian", "1.2", "16",                   # grid
        "SED + frames", "100", "0",                 # instrument
    ]
    run_wizard(path, ask=_scripted(answers))
    sim = load_ski(path, batch_size=2048, max_events=8, num_packets=4096)
    rf, accs = sim.run_primary(verbose=False)
    sed = np.asarray(accs[0]["sed"])
    assert np.isfinite(sed).all() and sed.sum() > 0


def test_wizard_dust_emission_octree(tmp_path):
    from skirt9_tpu.config.ski import load_ski

    path = str(tmp_path / "w2.ski")
    answers = [
        "DustEmission", "1e4", "0.09", "100",
        "geometric source", "Plummer sphere", "5778", "1e5",
        "power-law shell", "MRN silicate+graphite", "0.5",
        "octree", "1.2", "5",
        "SED only", "100", "30",
    ]
    run_wizard(path, ask=_scripted(answers))
    sim = load_ski(path, batch_size=2048, max_events=6, num_packets=2048)
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    assert np.isfinite(np.asarray(accs[0]["sed"])).all()


def test_wizard_defaults_only(tmp_path):
    """All-default walk produces a loadable NoMedium-free ski."""
    from skirt9_tpu.config.ski import load_ski

    (tmp_path / "mrn_mean.txt").write_bytes(
        open("tests/golden/mrn_mean.txt", "rb").read())
    path = str(tmp_path / "w3.ski")
    run_wizard(path, ask=_scripted([]))
    sim = load_ski(path, batch_size=1024, max_events=4, num_packets=1024)
    assert sim.grid is not None


def test_schema_export(tmp_path):
    """SMILE-style schema export (ref: smiletool): the registry's typed
    property defs plus every loader-accepted type name."""
    import xml.etree.ElementTree as ET

    from skirt9_tpu.config.schema import export_smile

    p = str(tmp_path / "skirt9_tpu.smile")
    export_smile(p)
    types = ET.parse(p).getroot().find("Types")
    names = {t.get("name") for t in types}
    assert len(names) > 150
    for must in ("MonteCarloSimulation", "PlummerGeometry",
                 "ConfigurableDustMix", "SEDInstrument",
                 "PolicyTreeSpatialGrid"):
        assert must in names, must
    mcs = types.find("Type[@name='MonteCarloSimulation']")
    assert any(pr.get("name") == "simulationMode" for pr in mcs)


def test_wizard_schema_driven_other_geometry(tmp_path):
    """Wizard v2: the schema-driven item path builds ANY accepted type by
    walking its harvested property list (config/harvest.py over the
    loader's own code; ref: the reference wizard's full SchemaDef walk)."""
    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.config.wizard import OTHER

    path = str(tmp_path / "w2.ski")
    answers = [
        "ExtinctionOnly", "2e4", "0.4", "0.8",
        "geometric source", OTHER,
        "EinastoGeometry",                 # schema-driven type
        "0.5 pc", "2.0",                   # halfMassRadius, index
        "5778", "1e5",                     # sed T, luminosity
        "Plummer sphere",                  # medium geometry (curated)
        "electrons (Thomson)", "0.5",      # mix + tau
        "Cartesian", "1.2", "8",
        "SED only", "100", "0",
    ]
    run_wizard(path, ask=_scripted(answers))
    sim = load_ski(path, batch_size=2048, max_events=4, num_packets=2048)
    from skirt9_tpu.geometries.analytic import EinastoGeometry
    assert isinstance(sim.sources[0].geometry, EinastoGeometry)
    rf, accs = sim.run_primary(verbose=False)
    sed = np.asarray(accs[0]["sed"])
    assert np.isfinite(sed).all() and sed.sum() > 0


def test_schema_export_typed_coverage(tmp_path):
    """--export-schema emits >=1 typed property (or an explicit
    noProperties declaration) for every accepted type, with >=90%
    carrying real property lists (round-5 verdict item 9)."""
    import xml.etree.ElementTree as ET

    from skirt9_tpu.config.schema import export_smile

    p = export_smile(str(tmp_path / "schema.xml"))
    types = ET.parse(p).getroot().find("Types")
    n_total = len(list(types))
    n_props = sum(1 for te in types if te.findall("Property"))
    n_declared = sum(1 for te in types
                     if te.findall("Property")
                     or te.get("noProperties") == "true")
    assert n_total > 150
    assert n_declared == n_total
    assert n_props / n_total >= 0.9
    # spot checks: harvested quantities carry units + required flags
    by_name = {te.get("name"): te for te in types}
    tg = {pe.get("name"): pe for pe in by_name["TorusGeometry"]}
    assert tg["openingAngle"].get("quantity") == "posangle"
    cg = {pe.get("name"): pe for pe in by_name["CartesianSpatialGrid"]}
    assert cg["minX"].get("required") == "true"
    assert cg["minX"].get("quantity") == "length"
