"""Production shell: logging subsystem and the ski hierarchy writer."""

import os
import xml.etree.ElementTree as ET

import numpy as np

from skirt9_tpu.utils.log import Log
from skirt9_tpu.config import skiwriter as sw


def test_log_levels_file_and_heartbeat(tmp_path):
    p = tmp_path / "run_log.txt"
    log = Log(level="info", path=str(p), stream=open(os.devnull, "w"))
    log.info("hello")
    log.warning("watch out")
    log._last_heartbeat -= 10.0  # simulate >5 s of elapsed work
    log.progress(10, 100)
    log.progress(20, 100)   # rate-limited: within 5 s of the previous
    log.progress(100, 100)  # final: always emitted
    with log.timed("test phase"):
        pass
    log.close()
    text = p.read_text()
    assert "hello" in text and "! watch out" in text
    assert text.count("Launched photon packets") == 2  # 10% and 100%
    assert "Starting test phase..." in text
    assert "Finished test phase in" in text


def test_log_level_filtering(tmp_path):
    p = tmp_path / "q_log.txt"
    log = Log(level="warning", path=str(p), stream=open(os.devnull, "w"))
    log.info("quiet")
    log.error("loud")
    log.close()
    text = p.read_text()
    assert "quiet" not in text and "loud" in text


def test_regenerate_materializes_defaults():
    golden = os.path.join(os.path.dirname(__file__), "golden", "bench5.ski")
    # strip some attributes the engine defaults, then regenerate
    root = ET.parse(golden).getroot()
    for el in root.iter("PhotonPacketOptions"):
        el.attrib.pop("pathLengthBias", None)
    for el in root.iter("Random"):
        el.attrib.pop("seed", None)
    text = ET.tostring(root, encoding="unicode")
    out = sw.regenerate(text)
    r2 = ET.fromstring(out)
    assert r2.attrib["producer"] == "skirt9_tpu"
    assert "time" in r2.attrib
    ppo = next(r2.iter("PhotonPacketOptions"))
    assert ppo.attrib["pathLengthBias"] == "0.5"   # default materialized
    assert next(r2.iter("Random")).attrib["seed"] == "0"
    # the regenerated document is reloadable
    from skirt9_tpu.config.ski import load_ski
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".ski",
                                     delete=False) as f:
        f.write(out)
        path = f.name
    sim = load_ski(path, num_packets=100)
    os.remove(path)
    assert sim.options.polarization


def test_builder_api_roundtrip(tmp_path):
    mcs = sw.item(
        "MonteCarloSimulation",
        {"simulationMode": "OligoExtinctionOnly", "numPackets": "1e4",
         "userLevel": "Expert"},
        random=sw.item("Random", {"seed": "7"}),
        units=sw.item("ExtragalacticUnits"),
        sourceSystem=sw.item(
            "SourceSystem", {"wavelengths": "0.55 micron",
                             "sourceBias": "0.5"},
            sources=sw.item(
                "PointSource", {"positionX": "0 pc", "positionY": "0 pc",
                                "positionZ": "0 pc"},
                sed=sw.item("BlackBodySED", {"temperature": "5778 K"}),
                normalization=sw.item(
                    "IntegratedLuminosityNormalization",
                    {"wavelengthRange": "Source",
                     "integratedLuminosity": "1 Lsun"}))),
        instrumentSystem=sw.item(
            "InstrumentSystem", {},
            instruments=sw.item(
                "SEDInstrument",
                {"instrumentName": "i0", "distance": "10 Mpc",
                 "inclination": "0 deg", "azimuth": "0 deg",
                 "roll": "0 deg", "radius": "0 pc"})),
        probeSystem=sw.item("ProbeSystem"))
    path = tmp_path / "api.ski"
    sw.write_ski(mcs, str(path))
    from skirt9_tpu.config.ski import load_ski
    sim = load_ski(str(path), num_packets=1000)
    assert sim.seed == 0  # seed is a loader argument; document records 7
    assert len(sim.sources) == 1 and len(sim.instruments) == 1
    _, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sed"]).sum() > 0


def test_builder_derived_default_materialization(tmp_path):
    """The loader materializes every default it consults back into the
    regenerated parameters.xml (XmlHierarchyWriter contract), derived from
    the builders themselves — and load->write->load is an identity on all
    six benchmark skis."""
    import os
    import re
    import shutil
    import xml.etree.ElementTree as ET

    from skirt9_tpu.config import skiwriter
    from skirt9_tpu.config.ski import load_ski

    G = os.path.join(os.path.dirname(__file__), "golden")
    strip = lambda s: re.sub(r'time="[^"]*"', '', s)
    for name in ("bench1", "bench1h", "bench2", "bench3", "bench4",
                 "bench5"):
        for aux in ("mrn_mean.txt", "bench4_stars.txt", "bench4_gas.txt",
                    "bench4_ssp.stab"):
            if not os.path.exists(tmp_path / aux):
                shutil.copy(os.path.join(G, aux), tmp_path / aux)
        shutil.copy(os.path.join(G, f"{name}.ski"), tmp_path / f"{name}.ski")
        sim = load_ski(str(tmp_path / f"{name}.ski"), num_packets=256,
                       batch_size=256, max_events=2)
        out = skiwriter.regenerate(sim.ski_text)
        p2 = tmp_path / f"{name}_regen.ski"
        p2.write_text(out)
        sim2 = load_ski(str(p2), num_packets=256, batch_size=256,
                        max_events=2)
        out2 = skiwriter.regenerate(sim2.ski_text)
        assert strip(out) == strip(out2), name

    # attribute-stripped ski: the loader's defaults reappear in the record
    t = ET.parse(os.path.join(G, "bench1.ski"))
    for el in t.iter("FullInstrument"):
        for a in ("roll", "centerX", "radius", "recordStatistics"):
            el.attrib.pop(a, None)
    for el in t.iter("PhotonPacketOptions"):
        el.attrib.pop("pathLengthBias", None)
    p = tmp_path / "sparse.ski"
    t.write(p)
    sim = load_ski(str(p), num_packets=256, batch_size=256, max_events=2)
    r = ET.fromstring(skiwriter.regenerate(sim.ski_text))
    inst = next(iter(r.iter("FullInstrument")))
    assert inst.attrib["roll"] == "0.0 rad"   # SI base unit formatting
    assert inst.attrib["centerX"] == "0.0 m"
    ppo = next(iter(r.iter("PhotonPacketOptions")))
    assert ppo.attrib["pathLengthBias"] == "0.5"
