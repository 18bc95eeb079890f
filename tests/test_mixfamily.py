"""Per-cell material-mix families (ref: MaterialMixFamily /
SelectDustMixFamily / FragmentDustMixDecorator.hpp:39)."""

import jax
import numpy as np

from skirt9_tpu.grids.cartesian import make_cartesian
from skirt9_tpu.media import mixes as mx
from skirt9_tpu.media import mixfamily as mf
from skirt9_tpu.media import system as msys

PC = 3.0857e16


def _two_mixes():
    lam = np.geomspace(0.1e-6, 10e-6, 32)
    a = mx.tabulated(lam, np.full(32, 1e-24), np.full(32, 0.2),
                     np.zeros(32), mu=1e-29)
    b = mx.tabulated(lam, np.full(32, 5e-24), np.full(32, 0.8),
                     np.zeros(32), mu=1e-29)
    return a, b


def test_select_family_per_cell_dispatch():
    """Cells with parameter 1 get mix A's optics, parameter 2 mix B's."""
    grid = make_cartesian(((-PC, PC),) * 3, (4,) * 3)
    nc = grid.ncells
    nd_tot = np.full(nc, 1e6)
    param = np.ones(nc)
    param[nc // 2:] = 2.0
    fam = mf.SelectDustMixFamily(mixes=_two_mixes())
    med = mf.family_medium(grid, nd_tot, fam, param)
    assert med.ncomp == 2
    nd = np.asarray(med.nd)
    # density fully assigned to the selected component
    assert np.allclose(nd[: nc // 2, 0], 1e6) and \
        np.allclose(nd[: nc // 2, 1], 0.0)
    assert np.allclose(nd[nc // 2:, 1], 1e6)
    # per-cell opacity reflects the per-cell mix
    import jax.numpy as jnp
    opt = msys.optics_at(med, jnp.full((nc,), 1e-6))
    k = np.asarray(msys.opacity_ext(med, opt, jnp.arange(nc)))
    assert np.allclose(k[: nc // 2], 1e6 * 1e-24, rtol=1e-3)
    assert np.allclose(k[nc // 2:], 1e6 * 5e-24, rtol=1e-3)
    # per-cell albedo dispatch too
    alb = np.asarray(msys.albedo_for_scattering(med, opt,
                                                jnp.arange(nc)))
    assert np.allclose(alb[: nc // 2], 0.2, atol=1e-3)
    assert np.allclose(alb[nc // 2:], 0.8, atol=1e-3)


def test_fragment_decomposition_conserves_optics():
    """Fragments of a multi-grain mix sum back to the parent's extinction
    (ref: FragmentDustMixDecorator semantics)."""
    from skirt9_tpu.media import grains as gr

    mg = gr.mrn_mix(4)
    frags = mf.fragment_mixes(mg)
    assert len(frags) >= 2
    lam = np.asarray(mg.lam)
    total = sum(np.interp(lam, f.lam, f.sigma_ext) for f in frags)
    parent = np.interp(lam, mg.mix.lam, mg.mix.sigma_ext)
    np.testing.assert_allclose(total, parent, rtol=1e-6)
    # per-size-bin variant yields one fragment per bin
    frags_b = mf.fragment_mixes(mg, per_size_bin=True)
    assert len(frags_b) == mg.sigma_abs_bin.shape[0]
