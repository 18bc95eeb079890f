"""Gas line emission: 21 cm spin-flip maps with thermal + kinematic shifts."""

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources import gas_lines as gl
from skirt9_tpu.transport import lifecycle as lc
from skirt9_tpu.utils import constants as c

PC = 3.0857e16
KPC = 1e3 * PC


def test_spinflip_emission_line_profile():
    """Rotating HI slab: the 21 cm line splits into red/blue-shifted halves
    on opposite sides of an edge-on 'galaxy' (classic double-horn physics),
    and the total line flux matches the optically thin expectation."""
    grid = make_cartesian(((-KPC, KPC),) * 3, (12,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    n_HI = np.where(np.abs(centers[:, 2]) < 0.3 * KPC, 1e4, 0.0)  # 1e-2/cm3
    # solid-body rotation around z: v = omega x r
    v0 = 1e5  # 100 km/s at the edge
    vel = np.zeros((grid.ncells, 3))
    vel[:, 0] = -v0 * centers[:, 1] / KPC
    vel[:, 1] = v0 * centers[:, 0] / KPC
    T = np.full(grid.ncells, 100.0)

    med = msys.make_medium(grid, np.zeros(grid.ncells, np.float32),
                           np.array([0.1, 0.3]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)),
                           bulk_v=vel.astype(np.float32),
                           temperature=T.astype(np.float32))
    L_cell = gl.spinflip_luminosities(grid, n_HI)
    src = gl.prepare_line_source(grid, med, gl.LAM_21CM, L_cell,
                                 c.PROTON_MASS)
    # edge-on observer along +x: rotation shifts the y>0 side
    dl = gl.LAM_21CM * 8e-4
    borders = np.linspace(gl.LAM_21CM - dl, gl.LAM_21CM + dl, 33)
    inst = dinst.DistantInstrumentCfg(name="i", wave_borders=tuple(borders),
                                      inclination=np.pi / 2, azimuth=0.0,
                                      distance=100 * KPC,
                                      npx=24, npy=24, fovx=2.2 * KPC,
                                      fovy=2.2 * KPC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=2,
                               store_rf=False)
    sim = Simulation(grid=grid, medium=med, sources=[src],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=30_000, batch_size=1 << 13, seed=9)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    w = sed["wavelength"]
    f = np.asarray(sed["transparent"])
    assert f.sum() > 0
    # line is broadened well beyond a single bin by rotation (+-100 km/s)
    nonzero_bins = (f > f.max() * 1e-3).sum()
    assert nonzero_bins >= 8
    # total flux = L_tot/(4 pi d^2)
    dlam = np.diff(borders)
    total = float(np.sum(f * dlam)) * 4 * np.pi * (100 * KPC) ** 2
    assert total == pytest.approx(L_cell.sum(), rel=0.02)

    # the rotation signature: velocity field maps to wavelength centroid on
    # opposite sides of the frame
    frame = np.asarray(jax.device_get(accs[0]["frame"]))[dinst.KIND_TRANSPARENT]
    # frame (nb, ny, nx): centroid wavelength per column half
    prof_left = frame[:, :, :10].sum(axis=(1, 2))
    prof_right = frame[:, :, 14:].sum(axis=(1, 2))
    cen_l = np.sum(w * prof_left) / prof_left.sum()
    cen_r = np.sum(w * prof_right) / prof_right.sum()
    # opposite Doppler shifts, each a sizable fraction of v0
    dv = (cen_r - cen_l) / gl.LAM_21CM * c.C_LIGHT
    assert abs(dv) > 0.5 * v0
