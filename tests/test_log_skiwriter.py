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
