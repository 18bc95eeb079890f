"""Unit tests for units, sampling, phase functions, grid traversal."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.utils import units, constants as c
from skirt9_tpu.ops import sampling, phase, rng
from skirt9_tpu.grids.cartesian import make_cartesian


# ------------------------------------------------------------------- units

def test_unit_conversions():
    assert units.parse("length", "1 pc") == pytest.approx(c.PARSEC)
    assert units.parse("wavelength", "0.55 micron") == pytest.approx(0.55e-6)
    assert units.parse("bolluminosity", "1 Lsun") == pytest.approx(c.SOLAR_LUMINOSITY)
    assert units.from_si("angle", np.pi, "deg") == pytest.approx(180.0)
    assert units.parse("massvolumedensity", "1 g/cm3") == pytest.approx(1000.0)
    assert units.parse("dimensionless", "2.5") == 2.5


# ---------------------------------------------------------------- sampling

def test_cdf_linlin_uniform_density():
    xv = np.linspace(0.0, 2.0, 11)
    cdf, total = sampling.cdf_linlin(xv, np.ones_like(xv))
    assert total == pytest.approx(2.0)
    u = jnp.asarray(np.linspace(0.01, 0.99, 7))
    x = sampling.sample_cdf_linlin(u, jnp.asarray(xv), jnp.asarray(cdf))
    np.testing.assert_allclose(np.asarray(x), np.asarray(u) * 2.0, rtol=1e-5)


def test_cdf_loglog_powerlaw():
    # p(x) ~ x^-2 on [1, 100]: analytic cdf = (1 - 1/x)/(1 - 1/100)
    xv = np.geomspace(1.0, 100.0, 300)
    cdf, _ = sampling.cdf_loglog(xv, xv**-2.0)
    analytic = (1 - 1 / xv) / (1 - 0.01)
    np.testing.assert_allclose(cdf, analytic, atol=1e-6)


def test_interp_loglog():
    xv = jnp.asarray(np.geomspace(1e-7, 1e-4, 50))
    yv = 3.0 * (np.asarray(xv) / 1e-6) ** -1.5
    x = jnp.asarray([2e-6, 5e-6])
    y = sampling.interp_loglog(x, xv, jnp.asarray(yv))
    np.testing.assert_allclose(np.asarray(y), 3.0 * (np.asarray(x) / 1e-6) ** -1.5,
                               rtol=1e-4)


# ------------------------------------------------------------------- phase

def test_hg_phase_normalization():
    # integral of Phi over the sphere = 1
    mu = np.linspace(-1, 1, 20001)
    for g in [0.0, 0.3, 0.9, -0.5]:
        ph = np.asarray(phase.hg_phase(jnp.float32(g), jnp.asarray(mu)))
        integral = 2 * np.pi * np.trapezoid(ph, mu)
        assert integral == pytest.approx(1.0, rel=1e-3)


def test_hg_sampling_moments():
    u = jnp.asarray(np.random.default_rng(7).uniform(size=200_000).astype(np.float32))
    for g in [0.0, 0.4, 0.85]:
        ct = np.asarray(phase.hg_sample_costheta(jnp.float32(g), u))
        assert np.mean(ct) == pytest.approx(g, abs=5e-3)
        assert np.min(ct) >= -1 and np.max(ct) <= 1


def test_dipole_sampling_moments():
    u = jnp.asarray(np.random.default_rng(3).uniform(size=200_000).astype(np.float32))
    ct = np.asarray(phase.dipole_sample_costheta(u))
    # <cos> = 0, <cos^2> = 2/5 for (1+cos^2) phase function... compute:
    # int mu^2 (1+mu^2) / int (1+mu^2) = (2/3+2/5)/(2+2/3) = (16/15)/(8/3) = 2/5
    assert np.mean(ct) == pytest.approx(0.0, abs=5e-3)
    assert np.mean(ct**2) == pytest.approx(0.4, abs=5e-3)


def test_rotate_direction_unit_and_angle():
    k = jnp.asarray(np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32))
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    ct = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, 1000).astype(np.float32))
    phi = jnp.asarray(np.random.default_rng(2).uniform(0, 2 * np.pi, 1000).astype(np.float32))
    d = phase.rotate_direction(k, ct, phi)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(d) * np.asarray(k), axis=-1),
                               np.asarray(ct), atol=1e-4)


def test_isotropic_direction():
    keys = rng.history_keys(jax.random.PRNGKey(0), jnp.arange(100_000))
    d = np.asarray(rng.isotropic_direction(keys, 3))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.01


# -------------------------------------------------------------------- grid

def test_cartesian_locate():
    g = make_cartesian(((-1, 1), (-1, 1), (-1, 1)), (4, 4, 4))
    pos = jnp.asarray([[0.1, 0.1, 0.1], [-2.0, 0, 0], [0.9, -0.9, 0.0]])
    cells = np.asarray(g.locate(pos))
    assert cells[1] == -1
    assert cells[0] >= 0
    centers = np.asarray(g.cell_centers())
    # locate(cell_centers) must be the identity
    ids = np.asarray(g.locate(jnp.asarray(centers)))
    np.testing.assert_array_equal(ids, np.arange(g.ncells))


def test_cartesian_traversal_chord():
    """Stepping from inside to the boundary accumulates the correct chord."""
    g = make_cartesian(((-1, 1), (-1, 1), (-1, 1)), (7, 5, 6))
    rs = np.random.default_rng(5)
    pos = jnp.asarray(rs.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    d = rs.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    cell = g.locate(pos)

    total = jnp.zeros(64)
    p, c = pos, cell
    for _ in range(g.max_steps()):
        ds, c2, p2 = g.step(p, d, c)
        total = total + jnp.where(c >= 0, ds, 0.0)
        p, c = p2, c2
    assert np.all(np.asarray(c) == -1)  # everyone exits

    # analytic chord length to box boundary
    pos_n = np.asarray(pos)
    d_n = np.asarray(d)
    with np.errstate(divide="ignore"):
        t1 = (-1 - pos_n) / d_n
        t2 = (1 - pos_n) / d_n
    tmax = np.min(np.maximum(t1, t2), axis=-1)
    np.testing.assert_allclose(np.asarray(total), tmax, rtol=2e-4, atol=1e-5)


def test_move_inside():
    g = make_cartesian(((-1, 1), (-1, 1), (-1, 1)), (4, 4, 4))
    pos = jnp.asarray([[-5.0, 0.0, 0.0], [-5.0, 3.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    p2, c2, t = g.move_inside(pos, d)
    c2 = np.asarray(c2)
    assert c2[0] >= 0          # enters through the -x face
    assert c2[1] == -1         # misses the box
    assert c2[2] >= 0 and np.asarray(t)[2] == 0.0  # already inside


def test_finiteness_guards():
    """Failure-detection layer (ref: FatalError/SignalHandler mapping,
    SURVEY §5): non-finite accumulators raise a phase-named EngineError."""
    import pytest as _pt

    from skirt9_tpu.utils.guards import EngineError, check_finite

    ok = {"rf": jnp.ones((4, 2)), "accs": [{"sed": jnp.zeros((3,))}]}
    check_finite(ok, "test")  # no raise
    bad = {"rf": jnp.array([1.0, np.nan]), "accs": []}
    with _pt.raises(EngineError) as e:
        check_finite(bad, "primary emission")
    assert "primary emission" in str(e.value)
    assert "rf" in str(e.value)
