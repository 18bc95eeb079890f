"""Geometry decorators: mass conservation and coordinate transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.geometries.analytic import PlummerGeometry, UniformSphereGeometry
from skirt9_tpu.geometries import decorators as dec
from skirt9_tpu.ops import rng


def mc_mass(geom, extent=3.0, n=48):
    x = np.linspace(-extent, extent, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    pos = np.stack([X, Y, Z], -1).reshape(-1, 3)
    rho = geom.density_np(pos)
    dv = (x[1] - x[0]) ** 3
    return rho.sum() * dv


def sample_pts(geom, n=20000, seed=0):
    keys = rng.history_keys(jax.random.PRNGKey(seed), jnp.arange(n))
    return np.asarray(geom.sample(keys), np.float64)


def test_offset():
    g = dec.OffsetDecorator(PlummerGeometry(b=0.3), offset=(1.0, 0, 0))
    assert mc_mass(g) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    assert pts[:, 0].mean() == pytest.approx(1.0, abs=0.05)


def test_rotate_mass_and_alignment():
    base = dec.SpheroidalDecorator(PlummerGeometry(b=0.4), q=0.3)
    g = dec.RotateDecorator(base, beta=np.pi / 2)  # flatten along x now
    assert mc_mass(g) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    # flattened axis rotated from z to x
    assert pts[:, 0].std() < 0.5 * pts[:, 2].std()


def test_spheroidal_flattening():
    g = dec.SpheroidalDecorator(PlummerGeometry(b=0.4), q=0.25)
    # flattened core needs finer sampling for the mass integral
    assert mc_mass(g, n=96) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    # robust width ratio (Plummer tails make std noisy)
    iqr = lambda a: np.subtract(*np.percentile(a, [75, 25]))
    assert iqr(pts[:, 2]) == pytest.approx(0.25 * iqr(pts[:, 0]), rel=0.1)


def test_clip_sphere():
    base = UniformSphereGeometry(rmax=1.0)
    g = dec.SphereClipDecorator(base, remove_inside=True,
                                center=(0, 0, 0), radius=0.5)
    # inner 1/8 of the volume removed, mass renormalized to 1
    assert mc_mass(g, extent=1.2, n=64) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g, n=5000)
    r = np.linalg.norm(pts, axis=-1)
    assert (r > 0.499).all()
    d = g.density_np(np.array([[0.0, 0, 0.75], [0, 0, 0.25]]))
    assert d[0] > 0 and d[1] == 0


def test_combine():
    g = dec.CombineDecorator(
        dec.OffsetDecorator(PlummerGeometry(b=0.2), offset=(1, 0, 0)),
        dec.OffsetDecorator(PlummerGeometry(b=0.2), offset=(-1, 0, 0)),
        w1=3.0, w2=1.0)
    assert mc_mass(g) == pytest.approx(1.0, rel=0.05)
    pts = sample_pts(g)
    frac_right = (pts[:, 0] > 0).mean()
    assert frac_right == pytest.approx(0.75, abs=0.02)


def test_clumpy():
    g = dec.ClumpyDecorator(PlummerGeometry(b=0.5), clump_fraction=0.4,
                            num_clumps=30, clump_radius=0.08)
    assert mc_mass(g, extent=4.0, n=72) == pytest.approx(1.0, rel=0.1)
    pts = sample_pts(g, n=30000)
    # clumped positions cluster near the fixed clump centers
    from scipy.spatial import cKDTree
    t = cKDTree(g._centers)
    d, _ = t.query(pts)
    assert (d < 0.08).mean() == pytest.approx(0.4, abs=0.06)


def test_spiral_structure_mass_conserving():
    """The spiral perturbation azimuthally averages to 1 (c_N is chosen so),
    keeping total mass unchanged (ref: SpiralStructureGeometryDecorator.cpp:18)."""
    from skirt9_tpu.geometries.analytic import ExpDiskGeometry
    g = dec.SpiralStructureDecorator(
        ExpDiskGeometry(h_r=1.0, h_z=0.2), num_arms=3, pitch_angle=0.3,
        radius_zero_point=1.0, perturbation_weight=0.7, index=2)
    phi = np.linspace(0, 2 * np.pi, 2000, endpoint=False)
    for R in (0.3, 1.0, 2.5):
        pert = g.perturbation_np(np.full_like(phi, R), phi)
        assert pert.mean() == pytest.approx(1.0, abs=2e-3)
        assert pert.min() < 0.5 < 1.5 < pert.max()


def test_spiral_structure_sampling_matches_density():
    """Sampled azimuthal histogram tracks the density perturbation."""
    import jax
    from skirt9_tpu.geometries.analytic import ExpDiskGeometry
    from skirt9_tpu.ops import rng
    g = dec.SpiralStructureDecorator(
        ExpDiskGeometry(h_r=1.0, h_z=0.2), num_arms=2, pitch_angle=0.25,
        radius_zero_point=1.0, perturbation_weight=0.8, index=1)
    n = 1 << 16
    keys = rng.history_keys(jax.random.PRNGKey(0), np.arange(n))
    pts = np.asarray(g.sample(keys), np.float64)
    R = np.hypot(pts[:, 0], pts[:, 1])
    phi = np.arctan2(pts[:, 1], pts[:, 0])
    # fold out the radius-dependent phase: psi should follow f(psi)
    gamma = g._gamma(R)
    psi = np.mod(0.5 * g.num_arms * (gamma - phi), np.pi)
    hist, edges = np.histogram(psi, bins=16, range=(0, np.pi), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    w, cn = g.perturbation_weight, g._cn
    expect = ((1 - w) + w * cn * np.sin(centers) ** (2 * g.index)) / np.pi
    np.testing.assert_allclose(hist, expect, rtol=0.12)


def test_spiral_from_ski():
    import xml.etree.ElementTree as ET
    from skirt9_tpu.config.ski import build_geometry
    el = ET.fromstring("""
      <SpiralStructureGeometryDecorator numArms="2" pitchAngle="15 deg"
          radiusZeroPoint="2 pc" phaseZeroPoint="0 deg"
          perturbationWeight="0.5" index="3">
       <geometry type="Geometry">
        <ExpDiskGeometry scaleLength="1 pc" scaleHeight="0.2 pc"
            minRadius="0 pc" maxRadius="0 pc" maxZ="0 pc"/>
       </geometry>
      </SpiralStructureGeometryDecorator>""")
    g = build_geometry(el)
    assert isinstance(g, dec.SpiralStructureDecorator)
    assert g.num_arms == 2 and g.index == 3
    assert g.pitch_angle == pytest.approx(np.deg2rad(15))


def test_offset_clip_from_ski():
    import xml.etree.ElementTree as ET
    from skirt9_tpu.config.ski import build_geometry
    el = ET.fromstring("""
      <OffsetGeometryDecorator offsetX="1 pc" offsetY="0 pc" offsetZ="0 pc">
       <geometry type="Geometry">
        <PlummerGeometry scaleLength="0.5 pc"/>
       </geometry>
      </OffsetGeometryDecorator>""")
    g = build_geometry(el)
    assert isinstance(g, dec.OffsetDecorator)
    PC = 3.0857e16
    assert g.offset[0] == pytest.approx(PC, rel=1e-4)


def test_redistribute_spherical_power_law():
    """rho' = n rho r^-p; sampled positions follow the redistributed
    density (ref: SphePowerLawRedistributeGeometryDecorator)."""
    from skirt9_tpu.geometries.analytic import PlummerGeometry
    from skirt9_tpu.geometries.decorators import \
        SphePowerLawRedistributeDecorator

    b = 1.0
    base = PlummerGeometry(b=b)
    dec = SphePowerLawRedistributeDecorator(base=base, exponent=1.0,
                                            min_radius=0.2 * b)
    # density ratio follows r^-p (where defined)
    pts = np.array([[0.5, 0, 0], [1.0, 0, 0], [0, 2.0, 0]])
    ratio = dec.density_np(pts) / base.density_np(pts)
    r = np.linalg.norm(pts, axis=-1)
    expect = r ** -1.0
    np.testing.assert_allclose(ratio / ratio[0], expect / expect[0],
                               rtol=1e-6)
    # inside the clipping sphere the density vanishes
    assert dec.density_np(np.array([[0.05, 0, 0]]))[0] == 0.0
    # normalization: MC integral of the redistributed density ~ 1
    keys = rng.history_keys(jax.random.PRNGKey(3),
                            jnp.arange(1 << 15, dtype=jnp.int32))
    pts_b = np.asarray(base.sample(keys), np.float64)
    w = dec.density_np(pts_b) / np.maximum(base.density_np(pts_b), 1e-300)
    assert abs(w.mean() - 1.0) < 0.05
    # sampling matches the redistributed radial distribution: median radius
    # shifts INWARD vs the base (weight favors small r)
    pts_d = np.asarray(dec.sample(keys), np.float64)
    r_d = np.linalg.norm(pts_d, axis=-1)
    r_b = np.linalg.norm(pts_b, axis=-1)
    assert np.median(r_d) < 0.8 * np.median(r_b)
    assert (r_d > 0.2 * b * (1 - 1e-6)).mean() > 0.999


def test_redistribute_decorator_as_source_geometry():
    """The redistribute decorators sample with traced jax ops, so a ski
    using them as a SOURCE geometry works inside the jitted launch
    (round-3 advisory: np.random here raised TracerArrayConversionError)."""
    import jax
    import numpy as np

    from skirt9_tpu.geometries.analytic import PlummerGeometry
    from skirt9_tpu.geometries.decorators import (
        SphePowerLawRedistributeDecorator)
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.instruments import distant as dinst
    from skirt9_tpu.media import system as msys
    from skirt9_tpu.simulation import Simulation
    from skirt9_tpu.sources.base import GeometricSource
    from skirt9_tpu.transport import lifecycle as lc

    PC = 3.0857e16
    geom = SphePowerLawRedistributeDecorator(
        base=PlummerGeometry(b=0.3 * PC), exponent=1.0,
        min_radius=0.1 * PC)
    grid = make_cartesian(((-PC, PC),) * 3, (8,) * 3)
    med = msys.make_medium(grid, np.zeros(grid.ncells),
                           np.array([0.4e-6, 0.7e-6]), np.zeros((1, 2)),
                           np.zeros((1, 2)), np.zeros((1, 2)))
    inst = dinst.DistantInstrumentCfg(name="i",
                                      wave_borders=(0.5e-6, 0.6e-6),
                                      distance=100 * PC)
    sim = Simulation(grid=grid, medium=med,
                     sources=[GeometricSource(geometry=geom,
                                              luminosity=1.0)],
                     instruments=[inst],
                     options=lc.TransportOptions(
                         max_steps=grid.max_steps(), max_events=2),
                     num_packets=1024, batch_size=1024, seed=0)
    _, accs = sim.run_primary(verbose=False)
    assert float(np.asarray(accs[0]["sed"]).sum()) > 0
