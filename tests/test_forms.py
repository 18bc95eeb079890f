"""Forms and the probe system: projections, at-positions, When hooks.

(ref: ParallelProjectionForm, AllSkyProjectionForm, AtPositionsForm,
LinearCutForm, ProbeSystem probeAfter hooks)
"""

import os

import numpy as np
import pytest

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.probes import probes as pb
from skirt9_tpu.utils.fits import read_fits

PC = 3.0857e16


def make_grid_field():
    grid = make_cartesian(((-PC, PC),) * 3, (16,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    r = np.linalg.norm(centers, axis=-1)
    field = np.where(r < 0.8 * PC, 1.0, 0.0)  # unit field in a sphere
    return grid, field


def test_parallel_projection_integrates_chords(tmp_path):
    grid, field = make_grid_field()
    p = pb.parallel_projection_form(str(tmp_path / "proj.fits"), grid,
                                    field, inclination=0.0, npix=64,
                                    samples=256)
    img = read_fits(p)
    img = np.asarray(img[0] if isinstance(img, tuple) else img, np.float64)
    # central pixel: chord 2*0.8 PC of unit field
    c = img[32, 32]
    assert c == pytest.approx(2 * 0.8 * PC, rel=0.08)
    # corners: zero
    assert img[0, 0] == 0.0


def test_allsky_projection_uniform_sphere(tmp_path):
    grid, field = make_grid_field()
    p = pb.allsky_projection_form(str(tmp_path / "sky.fits"), grid, field,
                                  position=(0.0, 0.0, 0.0), npix=64,
                                  samples=256)
    img = read_fits(p)
    img = np.asarray(img[0] if isinstance(img, tuple) else img, np.float64)
    vals = img[img > 0]
    # every direction sees the same 0.8 PC column from the center
    assert np.median(vals) == pytest.approx(0.8 * PC, rel=0.1)
    assert vals.std() / vals.mean() < 0.1


def test_at_positions_and_linear_cut(tmp_path):
    grid, field = make_grid_field()
    pos = np.array([[0.0, 0, 0], [0.9 * PC, 0, 0], [0.5 * PC, 0, 0]])
    p = pb.at_positions_form(str(tmp_path / "at.dat"), grid, field, pos)
    vals = np.loadtxt(p)[:, 3]
    np.testing.assert_allclose(vals, [1.0, 0.0, 1.0])

    p2 = pb.linear_cut_form(str(tmp_path / "cut.dat"), grid, field,
                            (-PC, 0, 0), (PC, 0, 0), npts=200)
    d = np.loadtxt(p2)
    inside = d[:, 1] > 0.5
    # occupied length ~ 1.6 PC
    frac = inside.mean()
    assert frac == pytest.approx(0.8, abs=0.08)


def test_probe_system_when_hooks(tmp_path):
    """Probes parsed from a ski fire at their configured phase."""
    import jax
    from skirt9_tpu.config.ski import load_ski
    golden = os.path.join(os.path.dirname(__file__), "golden", "bench2.ski")
    sim = load_ski(golden, num_packets=2000)
    assert len(sim.probes) >= 2
    whens = {p.when for p in sim.probes}
    assert "Run" in whens
    setup_paths = pb.run_probe_system(sim, "Setup", "t", str(tmp_path))
    # Setup probes need no radiation field
    for p in setup_paths:
        assert os.path.exists(p)
    # Run probes with a zero RF still write files
    import jax.numpy as jnp
    rf = jnp.zeros((sim.grid.ncells, len(sim.rf_borders) - 1))
    run_paths = pb.run_probe_system(sim, "Run", "t", str(tmp_path), rf=rf)
    assert run_paths
    for p in run_paths:
        assert os.path.exists(p)


def test_meridional_cut_form(tmp_path):
    """MeridionalCutForm: samples a per-cell field along a meridian
    (ref: MeridionalCutForm.hpp)."""
    from skirt9_tpu.grids.cartesian import make_cartesian
    from skirt9_tpu.probes.probes import meridional_cut_form

    grid = make_cartesian(((-1.0, 1.0),) * 3, (16,) * 3)
    centers = np.asarray(grid.cell_centers(), np.float64)
    field = centers[:, 2]  # z-coordinate field
    p = tmp_path / "meri.dat"
    meridional_cut_form(str(p), grid, field, radius=0.8, azimuth=0.3,
                        npts=181)
    d = np.loadtxt(p)
    assert d.shape == (181, 2)
    # field == z == r cos(theta): check monotone decrease pole to pole
    theta = np.radians(d[:, 0])
    expect = 0.8 * np.cos(theta)
    assert np.corrcoef(d[:, 1], expect)[0, 1] > 0.99
