"""Schema registry: conditional relevance + load/write/load round trip.

(ref: SMILE NameManager.hpp:42 + BooleanExpression.hpp:56 +
XmlHierarchyWriter round-trip contract — the regenerated parameters.xml
must reload to an IDENTICAL simulation, which also guards loader defaults
against drifting from the registry.)
"""

import dataclasses
import os

import numpy as np
import pytest

from skirt9_tpu.config import schema, skiwriter
from skirt9_tpu.config.ski import load_ski

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_boolean_expressions():
    names = {"Emission", "DustEmission", "ForceScattering"}
    assert schema.evaluate("Emission", names)
    assert schema.evaluate("Emission&DustEmission", names)
    assert not schema.evaluate("Emission&Lya", names)
    assert schema.evaluate("Lya|Emission", names)
    assert schema.evaluate("!Lya", names)
    assert schema.evaluate("Emission&(Lya|ForceScattering)", names)
    assert not schema.evaluate("!(Emission|Lya)", names)


def test_conditional_defaults():
    import xml.etree.ElementTree as ET
    # extinction-only: no Emission names -> DustEmissionOptions defaults
    # must NOT materialize; pathLengthBias must (forced scattering on)
    ski = ET.fromstring(
        '<skirt-simulation-hierarchy type="MonteCarloSimulation">'
        '<MonteCarloSimulation simulationMode="ExtinctionOnly">'
        '<PhotonPacketOptions forceScattering="true"/>'
        '<DustEmissionOptions/>'
        '</MonteCarloSimulation></skirt-simulation-hierarchy>')
    schema.materialize(ski)
    pp = ski.find(".//PhotonPacketOptions")
    de = ski.find(".//DustEmissionOptions")
    assert pp.attrib["pathLengthBias"] == "0.5"
    assert "dustEmissionType" not in de.attrib
    # emission mode: the dust-emission defaults become relevant
    ski2 = ET.fromstring(
        '<skirt-simulation-hierarchy type="MonteCarloSimulation">'
        '<MonteCarloSimulation simulationMode="DustEmission" '
        'iterateSecondaryEmission="true">'
        '<PhotonPacketOptions forceScattering="false"/>'
        '<DustEmissionOptions/>'
        '</MonteCarloSimulation></skirt-simulation-hierarchy>')
    schema.materialize(ski2)
    de2 = ski2.find(".//DustEmissionOptions")
    pp2 = ski2.find(".//PhotonPacketOptions")
    assert de2.attrib["dustEmissionType"] == "Equilibrium"
    assert de2.attrib["maxFractionOfPrimary"] == "0.01"
    # non-forced cycle: the bias property is irrelevant
    assert "pathLengthBias" not in pp2.attrib


def _sim_signature(sim):
    return {
        "options": dataclasses.replace(sim.options, rf_scale=0.0),
        "num_packets": sim.num_packets,
        "seed": sim.seed,
        "n_sources": len(sim.sources),
        "L": [float(getattr(s, "luminosity", 1.0)) for s in sim.sources],
        "rf": None if sim.rf_borders is None
        else np.asarray(sim.rf_borders).tolist(),
        "ems": None if sim.ems_borders is None
        else np.asarray(sim.ems_borders).tolist(),
        "insts": [(c.name, c.nbins, c.inclination, c.distance,
                   c.record_polarization) for c in sim.instruments],
        "iterate": (sim.iterate_secondary, sim.min_iterations,
                    sim.max_iterations),
        "nd_sum": float(np.asarray(sim.medium.nd, np.float64).sum()),
    }


@pytest.mark.parametrize("ski", ["bench1.ski", "bench2.ski", "bench5.ski"])
def test_round_trip_identical_simulation(ski, tmp_path):
    """load -> regenerate parameters.xml -> load again: identical
    Simulation. Because regeneration MATERIALIZES every relevant default,
    this also proves the loader's implicit defaults equal the registry's
    declared ones (no drift)."""
    src = os.path.join(GOLDEN, ski)
    sim1 = load_ski(src, num_packets=1000, batch_size=512, max_events=4)
    regen = skiwriter.regenerate(sim1.ski_text)
    p = tmp_path / "regen.ski"
    p.write_text(regen)
    # input data files resolve relative to the ski location
    import shutil
    for aux in ("mrn_mean.txt",):
        if os.path.exists(os.path.join(GOLDEN, aux)):
            shutil.copy(os.path.join(GOLDEN, aux), tmp_path / aux)
    sim2 = load_ski(str(p), num_packets=1000, batch_size=512, max_events=4)
    assert _sim_signature(sim1) == _sim_signature(sim2)
