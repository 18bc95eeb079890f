"""Lyman-alpha resonant transfer: Voigt opacity and wavelength
redistribution producing the classic double-peaked emergent profile."""

import numpy as np
import jax
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.media import system as msys
from skirt9_tpu.ops import lya as lyo
from skirt9_tpu.simulation import Simulation
from skirt9_tpu.sources.base import PointSource
from skirt9_tpu.transport import lifecycle as lc

PC = 3.0857e16
T4 = 1e4


def test_voigt_and_cross_section():
    import jax.numpy as jnp
    # H(a, 0) ~ 1, H(a, large x) ~ a/(sqrt(pi) x^2)
    a = float(lyo.damping_parameter(jnp.float32(T4)))
    assert a == pytest.approx(4.7e-4, rel=0.05)
    H0 = float(lyo.voigt_H(jnp.float32(a), jnp.float32(0.0)))
    assert H0 == pytest.approx(1.0, rel=1e-3)
    Hw = float(lyo.voigt_H(jnp.float32(a), jnp.float32(10.0)))
    assert Hw == pytest.approx(a / (np.sqrt(np.pi) * 100.0), rel=0.15)
    s0 = float(lyo.cross_section(jnp.float32(lyo.LAM0), jnp.float32(T4)))
    assert s0 == pytest.approx(5.9e-18, rel=0.05)


def test_parallel_velocity_distribution():
    """u_par ~ exp(-u^2)/((x-u)^2+a^2): for wing x, the resonant spike sits
    at u ~ x and the bulk follows the Gaussian core."""
    import jax.numpy as jnp
    from skirt9_tpu.ops import rng
    keys = rng.history_keys(jax.random.PRNGKey(0), jnp.arange(40_000))
    a = jnp.full((40_000,), 4.7e-4, jnp.float32)

    # compare the empirical mean against the analytic mean of
    # exp(-u^2)/((x-u)^2+a^2) for a core, intermediate and wing frequency
    for xv in [0.5, 3.0, 6.0]:
        x = jnp.full((40_000,), xv, jnp.float32)
        u = np.asarray(lyo.sample_parallel_velocity(keys, 5, a, x))
        assert np.isfinite(u).all()
        ug = np.linspace(-8, xv + 4, 200001)
        pdf = np.exp(-ug**2) / ((xv - ug) ** 2 + 4.7e-4**2)
        mean_true = np.trapezoid(ug * pdf, ug) / np.trapezoid(pdf, ug)
        assert u.mean() == pytest.approx(mean_true, abs=0.08)
    # symmetry: negative x mirrors
    xneg = jnp.full((40_000,), -3.0, jnp.float32)
    un = np.asarray(lyo.sample_parallel_velocity(keys, 5, a, xneg))
    assert un.mean() == pytest.approx(-2.41, abs=0.1)


def test_double_peaked_emergent_spectrum():
    """Static uniform HI sphere, central line-center source: the emergent
    profile is double-peaked with a dark core at line center (Neufeld/
    Dijkstra standard result; ref benchmark for LyaExtinctionOnly mode)."""
    R = 0.1 * PC
    box = 1.2 * R
    grid = make_cartesian(((-box, box),) * 3, (8,) * 3)
    tau0 = 1e5
    sigma0 = 5.9e-18
    nd_val = tau0 / (sigma0 * R)
    centers = np.asarray(grid.cell_centers(), np.float64)
    rr = np.linalg.norm(centers, axis=-1)
    nd = np.where(rr <= R, nd_val, 0.0).astype(np.float32)
    med = msys.make_medium(grid, nd, np.array([1.0e-7, 2.0e-7]),
                           np.zeros((1, 2)), np.zeros((1, 2)),
                           np.zeros((1, 2)),
                           temperature=np.full(grid.ncells, T4, np.float32))
    dl = lyo.LAM0 * 2.5e-3
    borders = np.linspace(lyo.LAM0 - dl, lyo.LAM0 + dl, 41)
    inst = dinst.DistantInstrumentCfg(name="i", wave_borders=tuple(borders),
                                      distance=100 * PC)
    opts = lc.TransportOptions(max_steps=grid.max_steps(), max_events=64,
                               lya=True, lya_xcrit=3.0, store_rf=False,
                               path_length_bias=0.0,
                               min_weight_reduction=1e30)
    sim = Simulation(grid=grid, medium=med,
                     sources=[PointSource(luminosity=1.0, lam0=lyo.LAM0)],
                     instruments=[inst], options=opts, rf_borders=None,
                     num_packets=8192, batch_size=4096, seed=5)
    _, accs = sim.run_primary(verbose=False)
    sed = dinst.calibrate_sed(inst, jax.device_get(accs[0]))
    f = np.asarray(sed["primaryscattered"])
    w = np.asarray(sed["wavelength"])
    assert f.sum() > 0
    center = len(f) // 2
    # dark core: line-center flux far below the peaks
    peak_blue = f[:center].max()
    peak_red = f[center:].max()
    core_flux = f[center - 1:center + 1].max()
    assert core_flux < 0.2 * max(peak_blue, peak_red)
    # two peaks on opposite sides, roughly symmetric (static medium)
    assert peak_blue > 0 and peak_red > 0
    assert peak_blue == pytest.approx(peak_red, rel=0.5)
    # photon conservation: escaped fraction is large with core skipping
    dlam = np.diff(borders)
    escaped = float(np.sum(f * dlam)) * 4 * np.pi * (100 * PC) ** 2
    # direct flux at line center is utterly extinguished (tau ~ 1e5)
    assert np.asarray(sed["primarydirect"]).sum() == pytest.approx(0.0, abs=1e-20)
    assert escaped > 0.5
