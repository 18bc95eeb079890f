"""Mesh family + WavelengthDistribution family.

(ref: NR.hpp:221-320 grid builders; PowMesh/SymPowMesh/LogMesh;
WavelengthDistribution hierarchy, DiscreteWavelengthDistribution.cpp:38-55)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt9_tpu.grids import meshes as msh
from skirt9_tpu.spectral import wdists


# ------------------------------------------------------------------- meshes

def test_pow_mesh_ratio():
    b = msh.pow_mesh(10, 8.0)
    assert b[0] == 0.0 and b[-1] == pytest.approx(1.0)
    w = np.diff(b)
    assert (w > 0).all()
    assert w[-1] / w[0] == pytest.approx(8.0, rel=1e-10)
    # ratio ~ 1 degenerates to linear
    np.testing.assert_allclose(msh.pow_mesh(10, 1.0), np.linspace(0, 1, 11))


@pytest.mark.parametrize("n", [8, 9])
def test_sym_pow_mesh(n):
    b = msh.sym_pow_mesh(n, 5.0)
    assert b[0] == pytest.approx(0.0) and b[-1] == pytest.approx(1.0)
    w = np.diff(b)
    assert (w > 0).all()
    # symmetric about the centre
    np.testing.assert_allclose(b + b[::-1], 1.0, atol=1e-12)
    # outermost/innermost width ratio == requested
    assert w[-1] / w.min() == pytest.approx(5.0, rel=1e-10)


def test_log_mesh():
    b = msh.log_mesh(6, 1e-3)
    assert b[0] == 0.0
    assert b[1] == pytest.approx(1e-3)
    assert b[-1] == pytest.approx(1.0)
    np.testing.assert_allclose(np.diff(np.log(b[1:])),
                               np.diff(np.log(b[1:]))[0])


def test_list_and_file_mesh(tmp_path):
    b = msh.list_mesh([0.5, 0.1, 1.0, 0.1])
    np.testing.assert_allclose(b, [0.0, 0.1, 0.5, 1.0])
    p = tmp_path / "mesh.dat"
    p.write_text("0.2\n0.6\n1.0\n")
    np.testing.assert_allclose(msh.file_mesh(str(p)), [0, 0.2, 0.6, 1.0])


def test_ski_grid_with_pow_mesh(tmp_path):
    """CartesianSpatialGrid with a PowMesh X axis builds the general grid
    with power-law borders."""
    import xml.etree.ElementTree as ET
    from skirt9_tpu.config.ski import build_grid
    el = ET.fromstring("""
     <CartesianSpatialGrid minX="-1 pc" maxX="1 pc" minY="-1 pc" maxY="1 pc"
         minZ="-1 pc" maxZ="1 pc">
      <meshX type="Mesh"><PowMesh numBins="8" ratio="4"/></meshX>
      <meshY type="Mesh"><LinMesh numBins="4"/></meshY>
      <meshZ type="Mesh"><LinMesh numBins="4"/></meshZ>
     </CartesianSpatialGrid>""")
    g = build_grid(el)
    xb = np.asarray(g.xb, np.float64)
    assert xb.size == 9
    w = np.diff(xb)
    assert w[-1] / w[0] == pytest.approx(4.0, rel=1e-4)
    assert g.ncells == 8 * 4 * 4


def test_ski_sphere_with_log_mesh():
    import xml.etree.ElementTree as ET
    from skirt9_tpu.config.ski import build_grid
    el = ET.fromstring("""
     <Sphere1DSpatialGrid maxRadius="1 pc">
      <meshRadial type="Mesh">
       <LogMesh numBins="16" centralBinFraction="0.01"/>
      </meshRadial>
     </Sphere1DSpatialGrid>""")
    g = build_grid(el)
    rb = np.asarray(g.rb, np.float64)
    PC = 3.0857e16
    assert rb[0] == 0.0
    assert rb[1] == pytest.approx(0.01 * PC, rel=1e-5)
    assert rb[-1] == pytest.approx(PC, rel=1e-5)


# ---------------------------------------------------- wavelength distributions

def _estimate_mean_lambda(bias_dist, xi=0.5, n=1 << 15):
    """Weighted estimator of <lam> under the SED must be bias-invariant."""
    from skirt9_tpu.ops import rng as prng
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.spectral import seds as sedlib
    src = PointSource(luminosity=1.0, sed=sedlib.blackbody(5000.0),
                      wavelength_bias=xi, bias_dist=bias_dist)
    tabs = src.tables()
    hk = prng.history_keys(jax.random.PRNGKey(0),
                           jnp.arange(n, dtype=jnp.int32))
    keys = prng.event_keys(hk, prng.LAUNCH_EVENT)
    out = src.launch(tabs, keys, n)
    lam = np.asarray(out["lam"], np.float64)
    w = np.asarray(out["lum"], np.float64) * n
    return float((lam * w).mean()), float(w.mean())


def test_bias_distributions_are_expectation_invariant():
    ref_mean, ref_w = _estimate_mean_lambda(None)
    assert ref_w == pytest.approx(1.0, rel=0.02)
    for dist in [
            wdists.lin_distribution(1e-7, 3e-6),
            wdists.log_distribution(1e-7, 3e-6),
            wdists.list_distribution([1e-7, 5e-7, 3e-6], [1.0, 2.0, 0.5])]:
        m, w = _estimate_mean_lambda(dist)
        assert w == pytest.approx(1.0, rel=0.05)
        assert m == pytest.approx(ref_mean, rel=0.05)


def test_discrete_distribution():
    borders = np.geomspace(2e-7, 2e-6, 9)
    dist = wdists.DiscreteWavelengthDistribution(borders)
    t = dist.tables()
    assert t["lams"].shape == (8,)
    m, w = _estimate_mean_lambda(dist, xi=0.5)
    ref_mean, _ = _estimate_mean_lambda(None)
    assert w == pytest.approx(1.0, rel=0.05)
    assert m == pytest.approx(ref_mean, rel=0.05)
    # with xi=1 every packet sits exactly on a grid wavelength
    from skirt9_tpu.ops import rng as prng
    from skirt9_tpu.sources.base import PointSource
    from skirt9_tpu.spectral import seds as sedlib
    src = PointSource(luminosity=1.0, sed=sedlib.blackbody(5000.0),
                      wavelength_bias=1.0, bias_dist=dist)
    hk = prng.history_keys(jax.random.PRNGKey(1),
                           jnp.arange(512, dtype=jnp.int32))
    keys = prng.event_keys(hk, prng.LAUNCH_EVENT)
    out = src.launch(src.tables(), keys, 512)
    lam = np.asarray(out["lam"], np.float64)
    lams = np.asarray(t["lams"], np.float64)
    d = np.abs(lam[:, None] - lams[None, :]).min(axis=1) / lam
    assert (d < 1e-5).all()


def test_ski_wavelength_bias_distribution(tmp_path):
    import xml.etree.ElementTree as ET
    el = ET.fromstring("""
      <PointSource positionX="0 m" positionY="0 m" positionZ="0 m"
          wavelengthBias="0.8">
       <sed type="SED"><BlackBodySED temperature="5000 K"/></sed>
       <normalization type="LuminosityNormalization">
        <IntegratedLuminosityNormalization wavelengthRange="Source"
            integratedLuminosity="1 Lsun"/>
       </normalization>
       <wavelengthBiasDistribution type="WavelengthDistribution">
        <LinWavelengthDistribution minWavelength="0.1 micron"
            maxWavelength="10 micron"/>
       </wavelengthBiasDistribution>
      </PointSource>""")
    from skirt9_tpu.config.ski import build_source
    src = build_source(el, lrange=(2e-7, 3e-6))
    assert src.wavelength_bias == 0.8
    assert src.bias_dist is not None
    t = src.bias_dist.tables()
    lam = np.asarray(t["lam"], np.float64)
    # intersected with the source range
    assert lam[0] == pytest.approx(2e-7)
    assert lam[-1] == pytest.approx(3e-6)


def test_symcos_and_tabulated_mesh():
    import xml.etree.ElementTree as ET

    from skirt9_tpu.grids import meshes as msh

    el = ET.fromstring('<SymCosMesh numBins="8"/>')
    b = msh.from_ski(el)
    assert b[0] == 0.0 and b[-1] == 1.0
    assert np.all(np.diff(b) > 0)
    # cosine packing: outermost bins narrower than central ones
    assert np.diff(b)[0] < np.diff(b)[len(b) // 2 - 1]

    el2 = ET.fromstring('<TabulatedMesh points="0.1, 0.4, 0.9"/>')
    b2 = msh.from_ski(el2)
    np.testing.assert_allclose(b2, [0.0, 0.1, 0.4, 0.9, 1.0])
