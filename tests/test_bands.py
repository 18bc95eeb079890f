"""Broadband bands + band-grid instrument detection
(ref: SKIRT/core/Band.hpp, BandWavelengthGrid.hpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.spectral import bands as bnd


def test_band_properties():
    b = bnd.tophat_band("th", 0.5e-6, 0.6e-6, n=1024)
    assert abs(b.effective_width() - 0.1e-6) < 2e-9
    piv = b.pivot_wavelength()
    assert 0.5e-6 < piv < 0.6e-6
    g = bnd.gaussian_band("g", 1.0e-6, 0.2e-6)
    assert abs(g.pivot_wavelength() - 1.0e-6) < 0.02e-6  # pivot sits below center (1/lam^2 weighting)


def test_band_weights_overlap():
    bands = [bnd.tophat_band("b1", 0.4e-6, 0.6e-6),
             bnd.tophat_band("b2", 0.5e-6, 0.7e-6)]
    tabs = bnd.band_tables(bands)
    lam = jnp.asarray([0.45e-6, 0.55e-6, 0.65e-6, 0.9e-6], jnp.float32)
    w = np.asarray(bnd.band_weights(tabs, lam))
    assert w[0, 0] > 0.9 and w[0, 1] < 0.1      # only band 1
    assert w[1, 0] > 0.9 and w[1, 1] > 0.9      # overlap: both bands
    assert w[2, 0] < 0.1 and w[2, 1] > 0.9      # only band 2
    assert (w[3] < 1e-6).all()                   # outside all bands


def test_band_instrument_detect():
    bands = (bnd.tophat_band("b1", 0.4e-6, 0.6e-6),
             bnd.tophat_band("b2", 0.5e-6, 0.7e-6))
    cfg = dinst.DistantInstrumentCfg(
        name="bb", wave_borders=(0.4e-6, 0.7e-6), distance=3.0857e17,
        npx=8, npy=8, fovx=2.0, fovy=2.0, bands=bands)
    tabs = dinst.device_tables(cfg)
    acc = dinst.init_accumulators(cfg)
    assert acc["sed"].shape == (dinst.NUM_KINDS, 2)
    B = 256
    lam = jnp.full((B,), 0.55e-6, jnp.float32)   # in the overlap
    pos = jnp.zeros((B, 3), jnp.float32)
    contrib = jnp.ones((B,), jnp.float32)
    active = jnp.ones((B,), bool)
    acc = dinst.detect(cfg, tabs, acc, lam, pos, contrib,
                       dinst.KIND_PRIMARY_DIRECT, active)
    sed = np.asarray(acc["sed"])
    assert abs(sed[dinst.KIND_PRIMARY_DIRECT, 0] - B) < 1e-2 * B
    assert abs(sed[dinst.KIND_PRIMARY_DIRECT, 1] - B) < 1e-2 * B
    fr = np.asarray(acc["frame"])
    assert abs(fr.sum() - 2 * B) < 1e-2 * B      # both band frames
    cal = dinst.calibrate_sed(cfg, jax.device_get(acc))
    assert len(cal["wavelength"]) == 2
    assert np.isfinite(cal["total"]).all()
