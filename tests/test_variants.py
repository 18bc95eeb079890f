"""Life-cycle algorithm variants must agree within MC noise.

The reference's 12 execution flows (ref: MonteCarloSimulation.hpp:143-156)
differ in forced/non-forced propagation and implicit/explicit absorption —
all are unbiased estimators of the same flux, so their instrument outputs
must agree within Monte Carlo noise (the A/B strategy of SURVEY.md §4).
"""

import dataclasses

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16


def run_variant(force=True, explicit=False, bias=0.5, n=20_000, seed=0):
    R, box = PC, 1.2 * PC
    grid = make_cartesian(((-box, box),) * 3, (16,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, 1.0, sigma, R)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           np.array([[sigma, sigma]]),
                           np.full((1, 2), 0.6), np.full((1, 2), 0.4))
    inst = dinst.DistantInstrumentCfg(name="i", wave_borders=(0.5e-6, 0.6e-6),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=20,
                               force_scattering=force,
                               explicit_absorption=explicit,
                               path_length_bias=bias, store_rf=False)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=n, batch_size=1 << 13, seed=seed)
    _, accs = sim.run_primary(verbose=False)
    return dinst.calibrate_sed(inst, jax.device_get(accs[0]))


def test_nonforced_agrees_with_forced():
    ref = run_variant(force=True)
    alt = run_variant(force=False, bias=0.0, seed=5)
    assert alt["total"][0] == pytest.approx(ref["total"][0], rel=0.05)
    # direct component is deterministic per packet -> near-exact agreement
    assert alt["primarydirect"][0] == pytest.approx(ref["primarydirect"][0],
                                                    rel=1e-3)


def test_explicit_absorption_agrees():
    ref = run_variant(explicit=False)
    alt = run_variant(explicit=True, seed=7)
    assert alt["total"][0] == pytest.approx(ref["total"][0], rel=0.05)
    assert alt["primaryscattered"][0] == pytest.approx(
        ref["primaryscattered"][0], rel=0.08)


def test_path_length_bias_invariance():
    """Different path-length bias values are different estimators of the
    same integral (ref: PhotonPacketOptions pathLengthBias)."""
    a = run_variant(bias=0.5)
    b = run_variant(bias=0.0, seed=11)
    assert b["total"][0] == pytest.approx(a["total"][0], rel=0.05)
