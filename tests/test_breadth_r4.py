"""Round-4 breadth batch: Lya/line SEDs, border/composite wavelength
grids, SymLogMesh, benchmark mean mixes from resources, smoothing-kernel
family, size-distribution names."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from skirt9_tpu.config.ski import build_sed, build_wavelength_grid
from skirt9_tpu.spectral import seds as sedlib

C = 2.99792458e8


def _el(tag, **attrs):
    return ET.Element(tag, {k: str(v) for k, v in attrs.items()})


def test_lya_seds():
    sed = build_sed(_el("LyaGaussianSED", dispersion="100 km/s"))
    lam0 = sedlib.LAM_LYA
    # centered on Lya with the configured width
    mean = np.average(sed.lam, weights=sed.s)
    assert abs(mean / lam0 - 1) < 1e-5
    sig_v = np.sqrt(np.average(((sed.lam - mean) / lam0 * C) ** 2,
                               weights=sed.s))
    assert abs(sig_v / 1e5 - 1) < 0.01

    sed2 = build_sed(_el("LyaDoublePeakedSED", scale="200 km/s"))
    # double-peaked: a local minimum AT the center, peaks off-center
    s_mid = sed2.s[np.argmin(np.abs(sed2.lam - lam0))]
    assert sed2.s.max() > 10 * s_mid


def test_line_seds():
    sed = build_sed(_el("ListLineSED",
                        wavelengths="0.5 micron, 0.6563 micron",
                        luminosities="1 W, 3 W"))
    # luminosity shares integrate to 1:3
    w = np.trapezoid(sed.s, sed.lam)
    m1 = sed.lam < 0.6e-6
    w1 = np.trapezoid(np.where(m1, sed.s, 0.0), sed.lam)
    assert abs(w1 / w - 0.25) < 0.01


def test_border_wavelength_grids():
    b = build_wavelength_grid(_el("LogBorderWavelengthGrid",
                                  minWavelength="0.1 micron",
                                  maxWavelength="10 micron",
                                  numWavelengthBins="10"))
    assert len(b) == 11
    np.testing.assert_allclose(np.diff(np.log(b)), np.diff(np.log(b))[0])

    r = build_wavelength_grid(_el("ResolutionBorderWavelengthGrid",
                                  minWavelength="1 micron",
                                  maxWavelength="2 micron",
                                  resolution="20"))
    np.testing.assert_allclose(r[1:] / r[:-1], 1.05, rtol=1e-12)

    # compositing: a later child REPLACES the borders of earlier children
    # over its full range; earlier bins partially overlapped are truncated
    # at the newcomer's edge (ref: CompositeWavelengthGrid.cpp
    # SegmentedGrid::add/replaceSegments)
    comp = _el("CompositeWavelengthGrid")
    kids = ET.SubElement(comp, "wavelengthGrids")
    kids.append(_el("LinWavelengthGrid", minWavelength="1 micron",
                    maxWavelength="3 micron", numWavelengths="4"))
    kids.append(_el("LinWavelengthGrid", minWavelength="2 micron",
                    maxWavelength="4 micron", numWavelengths="2"))
    u = build_wavelength_grid(comp) / 1e-6
    # child 1 (chars 1, 5/3, 7/3, 3) has borders 2/3, 4/3, 2, 8/3, 10/3;
    # child 2 (chars 2, 4) has borders 1, 3, 5 and REPLACES [1, 5],
    # truncating child 1 to its part below 1: [2/3, 1]
    np.testing.assert_allclose(u, [2 / 3, 1.0, 3.0, 5.0], rtol=1e-5)
    # disjoint children with a dead (zero-transmission) gap are rejected —
    # our live-border representation cannot express dead segments
    gap = _el("CompositeWavelengthGrid")
    gkids = ET.SubElement(gap, "wavelengthGrids")
    gkids.append(_el("LogWavelengthGrid", minWavelength="0.1 micron",
                     maxWavelength="1 micron", numWavelengths="5"))
    gkids.append(_el("LinWavelengthGrid", minWavelength="2 micron",
                     maxWavelength="3 micron", numWavelengths="4"))
    with pytest.raises(NotImplementedError):
        build_wavelength_grid(gap)


def test_symlog_mesh():
    from skirt9_tpu.grids.meshes import from_ski as mesh_from_ski
    b = mesh_from_ski(_el("SymLogMesh", numBins="8",
                          centralBinFraction="1e-2"))
    assert b[0] == 0.0 and b[-1] == 1.0
    assert (np.diff(b) > 0).all()
    np.testing.assert_allclose(b, 1.0 - b[::-1], atol=1e-12)
    # central bin ~ the configured fraction
    i = len(b) // 2
    assert np.diff(b)[np.argmin(np.abs(b[:-1] + np.diff(b) / 2 - 0.5))] \
        < 0.02


def test_mean_benchmark_mix_from_resource(tmp_path, monkeypatch):
    from skirt9_tpu.config.ski import build_mix
    from skirt9_tpu.utils import filepaths as fp
    from skirt9_tpu.utils.storedtable import write_stored_table

    d = tmp_path / "res"
    d.mkdir()
    monkeypatch.setenv("SKIRT9_TPU_RESOURCES", str(d))
    fp.clear_cache()
    lam = np.geomspace(1e-7, 1e-3, 32)
    sabs = 1e-26 * (lam / 1e-6) ** -1.0
    ssca = 0.5 * sabs
    g = np.full(32, 0.4)
    write_stored_table(
        str(d / "MeanPascucciBenchmarkOpticalProps.stab"),
        axes=[("lambda", "m", "log", lam)],
        quantities=[("sigmaabs", "m2/H", "log"), ("sigmasca", "m2/H", "log"),
                    ("g", "1", "lin")],
        values=np.stack([sabs, ssca, g], axis=-1))
    mix = build_mix(_el("MeanPascucciBenchmarkDustMix"))
    np.testing.assert_allclose(mix.sigma_ext, sabs + ssca, rtol=1e-6)
    np.testing.assert_allclose(mix.albedo, 1.0 / 3.0, rtol=1e-6)
    fp.clear_cache()
    monkeypatch.delenv("SKIRT9_TPU_RESOURCES")
    fp.clear_cache()
    with pytest.raises(FileNotFoundError):
        build_mix(_el("MeanPinteBenchmarkDustMix"))


def test_smoothing_kernel_family():
    import jax
    import jax.numpy as jnp

    from skirt9_tpu.imports.snapshots import kernel_tables
    from skirt9_tpu.ops import sampling

    # uniform kernel: cdf(q) = q^3 exactly
    q, cum = kernel_tables("UniformSmoothingKernel")
    np.testing.assert_allclose(np.asarray(cum),
                               np.asarray(q) ** 3, atol=1e-5)
    for kind in ("QuarticSplineSmoothingKernel",
                 "ScaledGaussianSmoothingKernel",
                 "CubicSplineSmoothingKernel"):
        q, cum = kernel_tables(kind)
        c = np.asarray(cum)
        assert c[0] == 0.0 and abs(c[-1] - 1.0) < 1e-6
        assert (np.diff(c) >= 0).all()
    # sampling draws valid radii
    u = jnp.linspace(0.001, 0.999, 100)
    r = np.asarray(sampling.sample_cdf_linlin(u, q, cum))
    assert (r >= 0).all() and (r <= 1).all() and (np.diff(r) >= 0).all()


def test_zubko_size_distribution_names(tmp_path):
    from skirt9_tpu.config.ski import build_mix

    el = _el("ConfigurableDustMix", scatteringType="HenyeyGreenstein")
    pops = ET.SubElement(el, "populations")
    p = ET.SubElement(pops, "GrainPopulation",
                      {"numSizes": "3", "dustMassPerHydrogenAtom": "1e-29"})
    cmp_ = ET.SubElement(p, "composition", {"type": "GrainComposition"})
    ET.SubElement(cmp_, "DraineGraphiteGrainComposition")
    sd = ET.SubElement(p, "sizeDistribution",
                       {"type": "GrainSizeDistribution"})
    ET.SubElement(sd, "ZubkoGraphiteGrainSizeDistribution")
    mix = build_mix(el)
    assert (np.asarray(mix.sigma_ext) > 0).all()


def test_particle_and_cell_media_from_ski(tmp_path):
    """ParticleMedium and CellMedium ski items import snapshots and
    resample onto the grid (ref: ParticleMedium.hpp, CellMedium.hpp)."""
    import re

    from skirt9_tpu.config.ski import load_ski

    import os
    G = os.path.join(os.path.dirname(__file__), "golden")
    base = open(os.path.join(G, "bench1.ski")).read()

    rs = np.random.default_rng(1)
    n = 40
    pts = rs.uniform(-0.8, 0.8, (n, 3))
    np.savetxt(tmp_path / "parts.txt",
               np.column_stack([pts, np.full(n, 0.3), np.full(n, 1e4)]))
    med_p = ('<media type="Medium"><ParticleMedium filename="parts.txt" '
             'massType="MassDensity" importVelocity="false">'
             '<materialMix type="MaterialMix">'
             '<MeanIvezicBenchmarkDustMix/></materialMix>'
             '</ParticleMedium></media>')
    m = re.search(r'<media type="Medium">.*?</media>', base, re.S)
    (tmp_path / "pm.ski").write_text(base[:m.start()] + med_p
                                     + base[m.end():])
    sim = load_ski(str(tmp_path / "pm.ski"), num_packets=1024,
                   batch_size=1024, max_events=3)
    nd = np.asarray(sim.medium.nd)
    assert (nd > 0).sum() > 10
    _, accs = sim.run_primary(verbose=False)
    assert float(np.asarray(accs[0]["sed"]).sum()) > 0

    # cell medium: two boxes with velocity import
    rows = [[-1, -1, -1, 0, 1, 1, 5e3, 100, 0, 0],
            [0, -1, -1, 1, 1, 1, 1e3, -100, 0, 0]]
    np.savetxt(tmp_path / "cells.txt", np.asarray(rows, float))
    med_c = ('<media type="Medium"><CellMedium filename="cells.txt" '
             'massType="MassDensity" importVelocity="true">'
             '<materialMix type="MaterialMix">'
             '<MeanIvezicBenchmarkDustMix/></materialMix>'
             '</CellMedium></media>')
    (tmp_path / "cm.ski").write_text(base[:m.start()] + med_c
                                     + base[m.end():])
    sim2 = load_ski(str(tmp_path / "cm.ski"), num_packets=1024,
                    batch_size=1024, max_events=3)
    nd2 = np.asarray(sim2.medium.nd)[:, 0]
    assert (nd2 > 0).sum() > 1000      # grid cells inside the two boxes
    bv = np.asarray(sim2.medium.bulk_v)
    centers = np.asarray(sim2.grid.cell_centers())
    PC = 3.0857e16
    inside = (np.abs(centers) < 0.95 * PC).all(axis=1)
    left = inside & (centers[:, 0] < -0.05 * PC)
    right = inside & (centers[:, 0] > 0.05 * PC)
    # velocity sign follows the box side
    assert (bv[left, 0] > 0).all() and (bv[right, 0] < 0).all()
    # left box has 5x the density
    assert np.median(nd2[left]) > 3 * np.median(nd2[right])


def test_cell_source_from_ski(tmp_path):
    """CellSource: box-cell entities with a blackbody family launch
    uniformly within their cells (ref: CellSource)."""
    import os
    import re

    from skirt9_tpu.config.ski import load_ski

    G = os.path.join(os.path.dirname(__file__), "golden")
    import shutil
    shutil.copy(os.path.join(G, "mrn_mean.txt"), tmp_path / "mrn_mean.txt")
    base = open(os.path.join(G, "bench2.ski")).read()
    # one hot cell on the left, a cooler one on the right
    rows = [[-0.9, -0.2, -0.2, -0.5, 0.2, 0.2, 0, 0, 0, 7e5, 8000],
            [0.5, -0.2, -0.2, 0.9, 0.2, 0.2, 0, 0, 0, 7e5, 4000]]
    np.savetxt(tmp_path / "srccells.txt", np.asarray(rows, float))
    src_x = ('<sources type="Source"><CellSource filename="srccells.txt" '
             'importVelocity="true" sourceWeight="1">'
             '<sedFamily type="SEDFamily"><BlackBodySEDFamily/>'
             '</sedFamily></CellSource></sources>')
    m = re.search(r'<sources type="Source">.*?</sources>', base, re.S)
    (tmp_path / "cs.ski").write_text(base[:m.start()] + src_x
                                     + base[m.end():])
    sim = load_ski(str(tmp_path / "cs.ski"), num_packets=2048,
                   batch_size=2048, max_events=2)
    assert sim.sources[0].luminosity > 0
    import jax

    from skirt9_tpu.ops import rng as _rng
    tabs = sim.sources[0].tables()
    keys = _rng.event_keys(_rng.history_keys(jax.random.PRNGKey(0),
                                             np.arange(2048)),
                           _rng.LAUNCH_EVENT)
    out = sim.sources[0].launch(tabs, keys, 2048)
    pos = np.asarray(out["pos"])
    PC = 3.0857e16
    in1 = (pos[:, 0] > -0.9 * PC) & (pos[:, 0] < -0.5 * PC)
    in2 = (pos[:, 0] > 0.5 * PC) & (pos[:, 0] < 0.9 * PC)
    assert (in1 | in2).all()
    assert in1.sum() > 0 and in2.sum() > 0
    _, accs = sim.run_primary(verbose=False)
    assert float(np.asarray(accs[0]["sed"]).sum()) > 0
