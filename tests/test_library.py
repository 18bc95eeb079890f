"""Spatial cell libraries for dust emission.

(ref: SpatialCellLibrary.hpp, FieldStrengthCellLibrary.cpp:20-70,
TemperatureWavelengthCellLibrary.cpp:25-120, DustSecondarySource.cpp:214-258)
"""

import numpy as np
import jax
import pytest

from skirt9_tpu.emission import library as clib
from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import system as msys

PC = 3.0857e16


def test_entry_average():
    x = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [100.0, 100.0]])
    mapping = np.array([0, 0, 2, -1])
    out = clib.entry_average(x, mapping, 3)
    np.testing.assert_allclose(out[0], [2.0, 3.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])
    np.testing.assert_allclose(out[2], [5.0, 6.0])


def test_field_strength_mapping_monotone():
    lib = clib.FieldStrengthCellLibrary(num_field_strengths=10)
    N = 100
    # fields spanning 4 dex, increasing with index
    U = np.geomspace(1e-2, 1e2, N)
    J = (U * clib.JTOT_MW)[:, None]
    dlam = np.array([1.0])
    mask = np.ones(N, bool)
    m = lib.mapping(J, dlam, mask)
    assert m.min() == 0 and m.max() == 9
    assert (np.diff(m) >= 0).all()
    # weak-field / masked cells excluded
    J2 = J.copy()
    J2[0] = 1e-9 * clib.JTOT_MW
    mask2 = mask.copy()
    mask2[1] = False
    m2 = lib.mapping(J2, dlam, mask2)
    assert m2[0] == -1 and m2[1] == -1


def _emission_sim(cell_library, n=8, num_packets=8192):
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.transport import lifecycle as lc

    box = PC
    grid = make_cartesian(((-box, box),) * 3, (n,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, 0.8 * PC)
    lam_t = np.geomspace(0.05e-6, 1000e-6, 40)
    med = msys.make_medium(grid, nd, lam_t,
                           sigma_ext=np.full((1, 40), sigma),
                           albedo=np.zeros((1, 40)), g=np.zeros((1, 40)))
    rfb = np.geomspace(0.05e-6, 10e-6, 9)
    emsb = np.geomspace(1e-6, 1000e-6, 25)
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=tuple(np.geomspace(0.3e-6, 1000e-6, 17)),
        distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=8)
    L_star = 100.0 * 3.839e26
    return Simulation(grid=grid, medium=med,
                      sources=[PointSource(luminosity=L_star, lam0=0.55e-6)],
                      instruments=[inst], options=opts,
                      rf_borders=rfb, ems_borders=emsb,
                      num_packets=num_packets, batch_size=4096, seed=1,
                      cell_library=cell_library)


def test_library_emission_matches_exact():
    """A fine field-strength library reproduces the per-cell spectra; a
    1-entry library still conserves the dust luminosity."""
    from skirt9_tpu.instruments import distant as dinst

    sim_exact = _emission_sim(None)
    rf0, accs0, info0 = sim_exact.run_with_dust_emission(verbose=False)
    sed0 = dinst.calibrate_sed(sim_exact.instruments[0],
                               jax.device_get(accs0[0]))

    sim_lib = _emission_sim(clib.FieldStrengthCellLibrary(2000))
    rf1, accs1, info1 = sim_lib.run_with_dust_emission(verbose=False)
    sed1 = dinst.calibrate_sed(sim_lib.instruments[0],
                               jax.device_get(accs1[0]))

    assert info1["L_dust"] == pytest.approx(info0["L_dust"], rel=1e-3)
    s0 = np.asarray(sed0["secondarydirect"])
    s1 = np.asarray(sed1["secondarydirect"])
    sel = s0 > s0.max() * 1e-3
    np.testing.assert_allclose(s1[sel], s0[sel], rtol=0.15)

    sim_one = _emission_sim(clib.FieldStrengthCellLibrary(1))
    _, accs2, info2 = sim_one.run_with_dust_emission(verbose=False)
    assert info2["L_dust"] == pytest.approx(info0["L_dust"], rel=1e-3)
    sed2 = dinst.calibrate_sed(sim_one.instruments[0],
                               jax.device_get(accs2[0]))
    # single shared spectrum still emits in the infrared with the same
    # bolometric output (flux integral within MC noise + spectral shift)
    assert np.asarray(sed2["secondarydirect"]).sum() > 0


def test_temperature_wavelength_library_runs():
    lib = clib.TemperatureWavelengthCellLibrary(num_temperatures=8,
                                                num_wavelengths=4)
    sim = _emission_sim(lib, num_packets=4096)
    _, accs, info = sim.run_with_dust_emission(verbose=False)
    assert info["L_dust"] > 0
    from skirt9_tpu.instruments import distant as dinst
    sed = dinst.calibrate_sed(sim.instruments[0], jax.device_get(accs[0]))
    assert np.asarray(sed["secondarydirect"]).sum() > 0


def test_ski_cell_library_parsing(tmp_path):
    import xml.etree.ElementTree as ET
    from skirt9_tpu.config.ski import _child
    xml = """<dustEmissionOptions type="DustEmissionOptions">
      <DustEmissionOptions dustEmissionType="Equilibrium">
       <cellLibrary type="SpatialCellLibrary">
        <FieldStrengthCellLibrary numFieldStrengths="500"/>
       </cellLibrary>
      </DustEmissionOptions></dustEmissionOptions>"""
    el = ET.fromstring(xml)
    cl = _child(list(el)[0], "cellLibrary")
    assert cl.tag == "FieldStrengthCellLibrary"
