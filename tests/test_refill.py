"""Lane refill (generation-based rebatching, SURVEY §7 hard part 1).

Per-lane RNG event counters make every packet's random streams independent
of WHICH batch/generation it runs in, so a refilled run must reproduce the
plain full-batch run almost exactly (same per-packet physics; only f32
accumulation order differs).
"""

import numpy as np
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16


def _sim(tau, albedo, refill_events, num_packets=4096, batch=1024,
         max_events=64):
    grid = make_cartesian(((-1.2 * PC, 1.2 * PC),) * 3, (12,) * 3)
    sigma = 1e-24
    nd = msys.uniform_density_sphere(grid, tau, sigma, PC)
    med = msys.make_medium(grid, nd, np.array([0.4e-6, 0.7e-6]),
                           sigma_ext=np.array([[sigma, sigma]]),
                           albedo=np.full((1, 2), albedo),
                           g=np.full((1, 2), 0.5))
    inst = dinst.DistantInstrumentCfg(
        name="i0", wave_borders=(0.5e-6, 0.6e-6), distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(),
                               max_events=max_events)
    return Simulation(grid=grid, medium=med,
                      sources=[PointSource(luminosity=1.0, lam0=0.55e-6)],
                      instruments=[inst], options=opts,
                      rf_borders=np.array([0.5e-6, 0.6e-6]),
                      num_packets=num_packets, batch_size=batch, seed=5,
                      refill_events=refill_events)


@pytest.mark.parametrize("tau,albedo", [(1.0, 0.6), (10.0, 0.9)])
def test_refill_matches_plain(tau, albedo):
    sim_a = _sim(tau, albedo, refill_events=0)
    rf_a, accs_a = sim_a.run_primary(verbose=False)
    sim_b = _sim(tau, albedo, refill_events=6)
    rf_b, accs_b = sim_b.run_primary(verbose=False)

    A = np.asarray(rf_a, np.float64)
    B = np.asarray(rf_b, np.float64)
    assert abs(B.sum() / A.sum() - 1.0) < 1e-4
    sa = np.asarray(accs_a[0]["sed"], np.float64)
    sb = np.asarray(accs_b[0]["sed"], np.float64)
    assert np.allclose(sb, sa, rtol=1e-4, atol=1e-8 * max(sa.max(), 1e-30))


def test_refill_beyond_max_events():
    """Refill mode has no hard per-lane event cap: at tau=10/albedo=0.9 the
    weight cutoff needs ~80+ events, which a max_events=24 plain run
    truncates but a refilled run completes (more scattered flux)."""
    sim_a = _sim(10.0, 0.9, refill_events=0, max_events=16,
                 num_packets=2048)
    _, accs_a = sim_a.run_primary(verbose=False)
    sim_b = _sim(10.0, 0.9, refill_events=16, max_events=16,
                 num_packets=2048)
    _, accs_b = sim_b.run_primary(verbose=False)
    sca_a = float(np.asarray(accs_a[0]["sed"])[dinst.KIND_PRIMARY_SCATTERED].sum())
    sca_b = float(np.asarray(accs_b[0]["sed"])[dinst.KIND_PRIMARY_SCATTERED].sum())
    assert sca_b > sca_a * 1.02  # the truncated tail is recovered
