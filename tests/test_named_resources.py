"""Named resource-backed items: SED families, SEDs, broadbands, grain
compositions resolved through the FilePaths-style resource discovery
(ref: FilePaths.cpp:267 resourceName, BruzualCharlotSEDFamily.cpp:25-30,
BroadBand.cpp:27-33, GrainComposition.hpp:72/114). Uses synthetic .stab
resources written with the same stored-table layout the reference reads.
"""

import os

import numpy as np
import pytest

from skirt9_tpu.utils import filepaths as fp
from skirt9_tpu.utils.storedtable import write_stored_table


@pytest.fixture()
def resdir(tmp_path, monkeypatch):
    d = tmp_path / "res"
    d.mkdir()
    monkeypatch.setenv("SKIRT9_TPU_RESOURCES", str(d))
    fp.clear_cache()
    yield d
    fp.clear_cache()


def write_ssp_like(path):
    lam = np.geomspace(1e-7, 1e-5, 48)
    Z = np.array([0.004, 0.02, 0.05])
    t = np.array([1e6, 1e8, 1e10])
    L = np.zeros((len(t), len(Z), len(lam), 1))
    shape = np.exp(-0.5 * ((np.log(lam) - np.log(1e-6)) / 0.5) ** 2)
    for i, ti in enumerate(t):
        for j, zj in enumerate(Z):
            L[i, j, :, 0] = (1 + 10 * zj) * (ti / 1e8) * shape
    write_stored_table(
        str(path),
        axes=[("lambda", "m", "log", lam), ("Z", "1", "lin", Z),
              ("t", "yr", "log", t)],
        quantities=[("Llambda", "W/m", "log")],
        values=L)
    return lam, Z, t, L


def test_filepaths_discovery_and_errors(resdir):
    write_ssp_like(resdir / "Starburst99SEDFamily.stab")
    p = fp.find_resource("Starburst99SEDFamily.stab")
    assert os.path.exists(p)
    assert fp.has_resource("Starburst99SEDFamily.stab")
    assert not fp.has_resource("NoSuch.stab")
    with pytest.raises(FileNotFoundError) as e:
        fp.find_resource("NoSuch.stab")
    assert "NoSuch.stab" in str(e.value)


def test_named_family_and_sed(resdir):
    from skirt9_tpu.spectral import named as nm
    lam, Z, t, L = write_ssp_like(
        resdir / "BruzualCharlotSEDFamily_Chabrier_lr.stab")
    fam = nm.load_named_family("BruzualCharlotSEDFamily",
                               {"imf": "Chabrier", "resolution": "Low"})
    assert fam.nparams == 2
    np.testing.assert_allclose(fam.lam, lam)

    # SED at exact node params reproduces the node spectrum shape
    def q(attrs, name, quantity, default):
        from skirt9_tpu.utils import units as U
        v = attrs.get(name)
        if v is None:
            return default
        num, _, unit = v.partition(" ")
        return U.to_si(quantity, float(num), unit) if unit else float(num)

    sed = nm.named_sed("BruzualCharlotSED",
                       {"metallicity": "0.02", "age": "1e8 yr",
                        "imf": "Chabrier", "resolution": "Low"}, q)
    want = L[1, 1, :, 0]
    m = want > 0
    ratio = sed.s / want[m][np.searchsorted(lam[m], sed.lam)]
    assert np.allclose(ratio, ratio[0], rtol=1e-5)

    # missing resource names the file
    with pytest.raises(FileNotFoundError) as e:
        nm.load_named_family("FSPSSEDFamily", {"imf": "Kroupa"})
    assert "FSPSSEDFamily_Kroupa.stab" in str(e.value)


def test_named_family_ski_particle_source(resdir, tmp_path):
    """A ski naming MarastonSEDFamily runs end to end against a synthetic
    resource table (the FileSSP pattern proven at config-4 parity)."""
    import xml.etree.ElementTree as ET

    from skirt9_tpu.config.ski import load_ski

    write_ssp_like(resdir / "MarastonSEDFamily_Kroupa.stab")
    G = os.path.join(os.path.dirname(__file__), "golden")
    tree = ET.parse(os.path.join(G, "bench4.ski"))
    for el in tree.iter("ParticleSource"):
        el.attrib["filename"] = os.path.join(G, "bench4_stars.txt")
    for fam in tree.iter("FileSSPSEDFamily"):
        fam.tag = "MarastonSEDFamily"
        fam.attrib = {"imf": "Kroupa"}
    for med in tree.iter("VoronoiMeshMedium"):
        med.attrib["filename"] = os.path.join(G, "bench4_gas.txt")
    for mix in tree.iter("MeanFileDustMix"):
        mix.attrib["filename"] = os.path.join(G, "mrn_mean.txt")
    p = tmp_path / "named.ski"
    tree.write(p)
    sim = load_ski(str(p), num_packets=256, batch_size=256, max_events=2)
    assert sim.sources[0].luminosity > 0
    rf, accs = sim.run_primary(verbose=False)
    assert float(np.asarray(accs[0]["sed"]).sum()) > 0


def test_broadband_and_predefined_grid(resdir):
    from skirt9_tpu.spectral import named as nm

    lam = np.geomspace(4e-7, 7e-7, 32)
    T = np.exp(-0.5 * ((lam - 5.5e-7) / 5e-8) ** 2)
    write_stored_table(
        str(resdir / "JOHNSON_V_BroadBand.stab"),
        axes=[("lambda", "m", "log", lam)],
        quantities=[("T", "1/m", "lin")],
        values=T[:, None])
    b = nm.broad_band("Johnson V")
    assert b.lam.shape == (32,)
    assert 5.3e-7 < b.pivot_wavelength() < 5.7e-7
    # underscore/case-insensitive matching like the reference
    b2 = nm.broad_band("JOHNSON_V")
    np.testing.assert_allclose(b2.transmission, b.transmission)
    with pytest.raises(FileNotFoundError):
        nm.broad_band("SDSS z")


def test_grain_composition_from_resource(resdir):
    from skirt9_tpu.media import grains as gr

    a_ax = np.geomspace(1e-9, 1e-6, 8)
    l_ax = np.geomspace(1e-7, 1e-4, 16)
    # Q(a, lam) = separable test pattern; stored with lambda-major values
    qa = np.outer(a_ax / a_ax[0], np.ones(16))
    qs = 0.5 * qa
    gg = np.full((8, 16), 0.3)
    vals = np.stack([qa.T, qs.T, gg.T], axis=-1)  # (lam, a, 3)
    write_stored_table(
        str(resdir / "DraineSilicateOpticalProps.stab"),
        axes=[("a", "m", "log", a_ax), ("lambda", "m", "log", l_ax)],
        quantities=[("Qabs", "1", "log"), ("Qsca", "1", "log"),
                    ("g", "1", "lin")],
        values=vals)
    T_ax = np.geomspace(1.0, 2500.0, 32)
    h = 1e7 * (T_ax / T_ax[-1]) ** 2  # J/m3
    write_stored_table(
        str(resdir / "DraineSilicateEnthalpies.stab"),
        axes=[("T", "K", "log", T_ax)],
        quantities=[("h", "J/m3", "lin")],
        values=h[:, None])

    comp = gr.composition_from_resource("DraineSilicateGrainComposition")
    qa_i, qs_i, g_i = comp.q_tables(a_ax[2:4], l_ax[3:6])
    np.testing.assert_allclose(qa_i, qa[2:4, 3:6], rtol=1e-6)
    np.testing.assert_allclose(qs_i, qs[2:4, 3:6], rtol=1e-6)
    np.testing.assert_allclose(g_i, 0.3, rtol=1e-6)
    # enthalpy: h * natoms*amass/rho
    natoms = 100.0
    U = comp.enthalpy(np.array([T_ax[5]]), natoms)
    want = h[5] * natoms * comp.atomic_mass / comp.bulk_density
    np.testing.assert_allclose(U, want, rtol=1e-6)
