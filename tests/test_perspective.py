"""Perspective instrument: in-model camera with 3D perspective projection.

(ref: PerspectiveInstrument.cpp:20-90 transform, :132 detect)
"""

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.instruments import perspective as persp
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16


def make_sim(insts, src_pos=(0.0, 0.0, 0.0), n=8, npackets=2048):
    grid = make_cartesian(((-PC, PC),) * 3, (n,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells, np.float32),
                           np.array([1e-7, 1e-5]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2,
                               store_rf=False)
    return Simulation(grid=grid, medium=med,
                      sources=[PointSource(luminosity=1.0, lam0=0.55e-6,
                                           position=src_pos)],
                      instruments=insts, options=opts, rf_borders=None,
                      num_packets=npackets, batch_size=2048, seed=0)


def cam(**kw):
    base = dict(name="cam", wave_borders=(0.5e-6, 0.6e-6), npx=64, npy=64,
                width=2 * PC, view=(0.9 * PC, 0, 0), cross=(0.0, 0.0, 0.0),
                up=(0.0, 0.0, 1.0), focal=0.5 * PC)
    base.update(kw)
    return persp.PerspectiveInstrumentCfg(**base)


def test_center_source_lands_on_crosshair_pixel():
    cfg = cam()
    sim = make_sim([cfg])
    _, accs = sim.run_primary(verbose=False)
    sky = np.asarray(accs[0]["sky"], np.float64)
    direct = sky[dinst.KIND_PRIMARY_DIRECT, 0]
    assert direct.sum() > 0
    jy, ix = np.unravel_index(np.argmax(direct), direct.shape)
    assert abs(ix - 32) <= 1 and abs(jy - 32) <= 1
    # power calibrated with eye-frame depth: eye at 1.4 PC from source
    d_eye = 1.4 * PC
    assert direct.sum() == pytest.approx(1.0 / (4 * np.pi * d_eye**2),
                                         rel=1e-3)


def test_offset_source_projects_with_perspective():
    """A source off the axis by dz at depth z lands focal/s * dz/z pixels
    from the center; a source behind the eye is not detected."""
    dz = 0.4 * PC
    cfg = cam()
    sim = make_sim([cfg], src_pos=(0.0, 0.0, dz))
    _, accs = sim.run_primary(verbose=False)
    direct = np.asarray(accs[0]["sky"], np.float64)[dinst.KIND_PRIMARY_DIRECT, 0]
    jy, ix = np.unravel_index(np.argmax(direct), direct.shape)
    # eye at x=1.4PC, source depth z_e=1.4PC, up is +z -> ye = dz
    s = cfg.pixel_size
    expect_j = int(64 / 2 + (cfg.focal / s) * dz / (1.4 * PC))
    assert abs(int(jy) - expect_j) <= 1
    assert abs(ix - 32) <= 1

    # a source behind the eye must never be recorded (eye inside the grid
    # at x=0.8 PC, source at x=0.9 PC)
    cfg2 = cam(view=(0.5 * PC, 0, 0), focal=0.3 * PC)
    sim2 = make_sim([cfg2], src_pos=(0.9 * PC, 0.0, 0.0))
    _, accs2 = sim2.run_primary(verbose=False)
    assert np.asarray(accs2[0]["sky"]).sum() == 0


def test_perspective_through_ski_loader(tmp_path):
    ski = """<?xml version='1.0' encoding='UTF-8'?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="9">
  <MonteCarloSimulation simulationMode="OligoExtinctionOnly" numPackets="1e3">
    <random type="Random"><Random seed="0"/></random>
    <units type="Units"><ExtragalacticUnits/></units>
    <sourceSystem type="SourceSystem">
      <SourceSystem wavelengths="0.55 micron" sourceBias="0.5">
        <sources type="Source">
          <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc">
            <sed type="SED"><BlackBodySED temperature="5778 K"/></sed>
            <normalization type="LuminosityNormalization">
              <IntegratedLuminosityNormalization wavelengthRange="Source" integratedLuminosity="1 Lsun"/>
            </normalization>
          </PointSource>
        </sources>
      </SourceSystem>
    </sourceSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <PerspectiveInstrument instrumentName="cam" numPixelsX="32" numPixelsY="32" width="2 pc" viewX="1 pc" viewY="0 pc" viewZ="0 pc" crossX="0 pc" crossY="0 pc" crossZ="0 pc" upX="0" upY="0" upZ="1" focal="0.5 pc"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
    <probeSystem type="ProbeSystem"><ProbeSystem/></probeSystem>
  </MonteCarloSimulation>
</skirt-simulation-hierarchy>
"""
    p = tmp_path / "cam.ski"
    p.write_text(ski)
    from skirt9_tpu.config.ski import load_ski
    sim = load_ski(str(p), num_packets=2000)
    assert getattr(sim.instruments[0], "is_perspective", False)
    _, accs = sim.run_primary(verbose=False)
    assert np.asarray(accs[0]["sky"]).sum() > 0
    paths = sim.write_outputs(accs, "cam", str(tmp_path))
    assert any(str(pp).endswith("cam_cam_total.fits") for pp in paths)
