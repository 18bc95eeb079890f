"""Probe subsystem: per-cell dumps, cuts, convergence info."""

import numpy as np

from skirt9_tpu.geometries.analytic import ShellGeometry
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import geometric as gm, mixes as mx
from skirt9_tpu.probes import probes as pb
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc
from skirt9_tpu.utils.fits import read_fits

PC = 3.0857e16


def make_sim():
    grid = make_cartesian(((-1.2 * PC, 1.2 * PC),) * 3, (12,) * 3)
    geom = ShellGeometry(rmin=0.1 * PC, rmax=PC, p=0.0)
    mix = mx.mean_interstellar_approx()
    norm = gm.OpticalDepthNormalization(tau=1.0, lam=0.55e-6, axis="z")
    components = [(geom, mix, norm)]
    med = gm.build_medium(grid, components)
    inst = dinst.DistantInstrumentCfg(name="i", wave_borders=(0.4e-6, 0.7e-6),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=3.8e26, lam0=0.55e-6)],
                     instruments=[inst], options=opts,
                     rf_borders=np.geomspace(0.1e-6, 10e-6, 9),
                     ems_borders=np.geomspace(1e-6, 1000e-6, 25),
                     num_packets=2048, batch_size=2048)
    return sim, components


def test_probes(tmp_path):
    sim, components = make_sim()
    rf, accs = sim.run_primary(verbose=False)
    out = str(tmp_path)

    paths = pb.density_probe(sim, "p", out, cuts=True)
    dat = np.loadtxt(paths[0])
    assert dat.shape[1] == 4  # x y z nd
    assert dat[:, 3].max() > 0
    cube, hdr = read_fits(paths[1])
    assert cube.shape == (256, 256)
    assert np.isfinite(cube).all() and cube.max() > 0

    (p,) = pb.opacity_probe(sim, 0.55e-6, "p", out)
    k = np.loadtxt(p)[:, 3]
    assert k.max() > 0

    paths = pb.temperature_probe(sim, rf, "p", out)
    T = np.loadtxt(paths[0])[:, 3]
    nd = np.loadtxt(pb.density_probe(sim, "p2", out, cuts=False)[0])[:, 3]
    assert (T[nd > 0] > 2.0).any()

    (p,) = pb.radiation_field_probe(sim, rf, "p", out)
    J = np.loadtxt(p)
    assert np.isfinite(J).all()
    assert J[:, 3:].max() > 0

    (p,) = pb.convergence_probe(sim, components, "p", out)
    txt = open(p).read()
    assert "total_number_0" in txt and "column_z_0" in txt
    # gridded total number should match the model within sampling error
    line = [ln for ln in txt.splitlines() if ln.startswith("total_number_0")][0]
    rel_err = float(line.split()[-1])
    assert rel_err < 0.1

    (p,) = pb.grid_probe(sim, "p", out)
    assert "ncells 1728" in open(p).read()

    (p,) = pb.luminosity_probe(sim, "p", out)
    assert "3.8" in open(p).read()


def test_new_probe_kinds(tmp_path):
    """grainpops/grainsizes/materialprops/secondaryluminosity/convergence
    probe kinds produce files (ref: DustGrainPopulationsProbe,
    OpticalMaterialPropertiesProbe, SecondaryDustLuminosityProbe,
    ConvergenceInfoProbe)."""
    import numpy as np
    import skirt9_tpu.probes.probes as pr
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys, grains as gr
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    grid = make_cartesian(((-PC, PC),) * 3, (6,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.8 * PC)
    lam_t = np.geomspace(0.05e-6, 1000e-6, 16)
    med = msys.make_medium(grid, nd, lam_t,
                           sigma_ext=np.full((1, 16), sigma),
                           albedo=np.zeros((1, 16)), g=np.zeros((1, 16)))
    inst = dinst.DistantInstrumentCfg(name="i",
                                      wave_borders=(0.5e-6, 0.6e-6),
                                      distance=100 * PC)
    sim = Simulation(
        grid=grid, medium=med,
        sources=[PointSource(luminosity=3.8e26, lam0=0.55e-6)],
        instruments=[inst],
        options=lc.TransportOptions(max_steps=grid.max_steps(),
                                    max_events=4),
        rf_borders=np.geomspace(0.05e-6, 10e-6, 5),
        ems_borders=np.geomspace(1e-6, 1000e-6, 9),
        num_packets=2048, batch_size=1024, seed=0)
    sim.grain_tables = gr.build_multi_grain(
        [gr.GrainPopulation(composition=gr.silicate_composition(),
                            sizes=gr.power_law_sizes(), num_bins=3)])
    rf, _ = sim.run_primary(verbose=False)
    out = str(tmp_path)
    for kind, need_rf in [("grainpops", False), ("grainsizes", False),
                          ("materialprops", False),
                          ("secondaryluminosity", True),
                          ("absorption", True)]:
        spec = pr.ProbeSpec(kind, "t")
        paths = spec.run(sim, "x", out, rf=rf if need_rf else None)
        assert paths, kind
        for p in paths:
            assert len(open(p).readlines()) > 1, kind
    # secondaryluminosity without rf is a clean no-op
    assert pr.ProbeSpec("secondaryluminosity", "t").run(sim, "x", out) == []


def test_form_probe_kinds(tmp_path):
    """InputModelFormProbe / ConvergenceCutsProbe / DustEmissivityProbe
    kinds produce output files (ref: same-named reference probes)."""
    import os

    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.probes.probes import ProbeSpec

    G = os.path.join(os.path.dirname(__file__), "golden")
    sim = load_ski(os.path.join(G, "bench2.ski"), num_packets=256,
                   batch_size=256, max_events=2)
    for kind in ("inputmodel", "convergencecuts", "dustemissivity"):
        paths = ProbeSpec(kind, kind).run(sim, "t", str(tmp_path))
        assert paths, kind
        for p in paths:
            assert os.path.exists(p)
            assert os.path.getsize(p) > 0


def test_iteration_probe_hooks_and_tail_kinds(tmp_path):
    """Primary/Secondary hooks fire from the iteration flows with
    per-iteration tags (ref: ProbeSystem.hpp:54-57), and the new tail
    kinds (importedsource/customstate/linelums/instrtimegrid) write files."""
    import os

    from skirt9_tpu.config.ski import load_ski
    from skirt9_tpu.probes.probes import ProbeSpec

    G = os.path.join(os.path.dirname(__file__), "golden")
    sim = load_ski(os.path.join(G, "bench3.ski"), num_packets=512,
                   batch_size=512, max_events=2)
    sim.max_iterations = 2
    sim.min_iterations = 2
    sim.probes = [ProbeSpec("temperature", "Tp", when="Secondary")]
    sim.probe_prefix = "hooks"
    sim.probe_outdir = str(tmp_path)
    rf, accs, info = sim.run_with_dust_emission(verbose=False)
    assert info["iterations"] >= 2
    got = sorted(os.listdir(tmp_path))
    for k in range(1, info["iterations"] + 1):
        assert any(f"Tp_it{k}" in f for f in got), got

    # imported-source probes on bench4's SSP particles
    sim4 = load_ski(os.path.join(G, "bench4.ski"), num_packets=256,
                    batch_size=256, max_events=2)
    for which in ("age", "metallicity", "luminosity", "density"):
        paths = ProbeSpec("importedsource", which, which=which).run(
            sim4, "t", str(tmp_path))
        assert paths, which
        for p in paths:
            assert os.path.getsize(p) > 0
    # velocity not imported in bench4 -> clean no-op
    assert ProbeSpec("importedsource", "v", which="velocity").run(
        sim4, "t", str(tmp_path)) == []

    # custom state
    import numpy as np
    sim4.custom_state = {"frag": np.linspace(0, 1, sim4.grid.ncells)}
    (p,) = ProbeSpec("customstate", "cs").run(sim4, "t", str(tmp_path))
    assert os.path.getsize(p) > 0

    # line luminosities from a line source
    from skirt9_tpu.sources.gas_lines import prepare_line_source
    L_cell = np.zeros(sim4.grid.ncells)
    L_cell[:8] = 1e20
    sim4.line_sources = [prepare_line_source(
        sim4.grid, sim4.medium, 656.3e-9, L_cell, 1.67e-27)]
    (p,) = ProbeSpec("linelums", "ll").run(sim4, "t", str(tmp_path))
    lam0, L = np.loadtxt(p)
    assert lam0 == 656.3e-9 and L > 0

    # instrument time grid
    import dataclasses as dc
    sim4.instruments = [dc.replace(sim4.instruments[0],
                                   time_borders=tuple(np.linspace(0, 10, 5)))]
    (p,) = ProbeSpec("instrtimegrid", "tg").run(sim4, "t", str(tmp_path))
    assert np.loadtxt(p).shape == (4, 3)
