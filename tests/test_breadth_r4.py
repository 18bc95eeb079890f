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

    comp = _el("CompositeWavelengthGrid")
    kids = ET.SubElement(comp, "wavelengthGrids")
    kids.append(_el("LogWavelengthGrid", minWavelength="0.1 micron",
                    maxWavelength="1 micron", numWavelengths="5"))
    kids.append(_el("LinWavelengthGrid", minWavelength="2 micron",
                    maxWavelength="3 micron", numWavelengths="4"))
    u = build_wavelength_grid(comp)
    assert (np.diff(u) > 0).all() and len(u) >= 10


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
