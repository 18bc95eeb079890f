"""FITS-frame parity vs the reference binary (round-3: VERDICT weak #6).

Compares our calibrated IFU frames against the golden `*_total.fits`
(and Stokes Q/U for the polarized config) pixel-binned into superpixels,
with tolerances DERIVED from the recorded photon-statistics moments
(sum w^k, k=0..4 — the R statistic of Camps & Baes 2018,
ref: FluxRecorder.hpp:50-63): the per-superpixel allowed deviation scales
as R_bin * sqrt(F_total/F_superpixel) (MC noise grows as the inverse
square root of the flux share), combined for both runs.

Unit note: the reference writes W/m2/micron/arcsec2 (ExtragalacticUnits,
wavelength flux style); ours calibrates to W/m2/m/sr.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from skirt9_tpu.config.ski import load_ski
from skirt9_tpu.instruments import distant as dinst
from skirt9_tpu.utils.fits import read_fits

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ARCSEC2_PER_SR = (np.pi / 180.0 / 3600.0) ** 2  # sr per arcsec^2
TO_REF_UNITS = 1e-6 * ARCSEC2_PER_SR            # /m -> /micron; /sr -> /arcsec^2


def _run(ski, n_pk, **kw):
    sim = load_ski(os.path.join(GOLDEN, ski), num_packets=n_pk,
                   batch_size=1 << 14, **kw)
    sim.instruments = [dataclasses.replace(c, record_statistics=True)
                       for c in sim.instruments]
    sim.__post_init__()
    return sim


def _superpix(img, b=8):
    # offset the binning grid by b/2 so sources centered on the image (and
    # thus on superpixel corners) fall INSIDE a superpixel: sub-pixel
    # numeric jitter between the codes then cannot move flux across
    # superpixel borders
    h = b // 2
    img = img[..., h:, h:]
    ny, nx = img.shape[-2:]
    img = img[..., : ny // b * b, : nx // b * b]
    ny, nx = img.shape[-2:]
    return img.reshape(img.shape[:-2] + (ny // b, b, nx // b, b)).sum(
        axis=(-3, -1))


def _bin_R(acc):
    """Per-wavelength-bin relative error R = sqrt(sum w^2)/sum w."""
    st = np.asarray(acc["stats"], np.float64)
    return np.sqrt(np.maximum(st[2], 0.0)) / np.maximum(st[1], 1e-300)


def _assert_frame_parity(ours, golden, R, kfac=6.0, floor=2e-3, b=8):
    """ours/golden: (nb, ny, nx) in the same units."""
    for k in range(ours.shape[0]):
        gs = _superpix(golden[k], b)
        os_ = _superpix(ours[k], b)
        F = gs.sum()
        bright = gs > floor * gs.max()
        # MC noise per superpixel ~ R * sqrt(F_tot/F_sp) for each run;
        # golden ran with more packets — fold both via 1.5x
        tol = kfac * R[k] * np.sqrt(F / np.maximum(gs, 1e-300)) + 0.02
        rel = np.abs(os_ - gs) / np.maximum(gs, 1e-300)
        bad = bright & (rel > tol)
        assert bad.mean() < 0.02, (
            f"bin {k}: {bad.sum()} of {bright.sum()} bright superpixels "
            f"beyond tolerance (worst rel {rel[bright].max():.3f})")
        # integral agreement
        assert os_.sum() == pytest.approx(F, rel=max(5 * R[k], 0.02))


def test_bench1_frame_parity():
    gold, _ = read_fits(os.path.join(GOLDEN, "bench1_i0_total.fits"))
    sim = _run("bench1.ski", 1 << 18, max_events=24)
    _, accs = sim.run_primary(verbose=False)
    acc = jax.device_get(accs[0])
    ours = dinst.calibrate_frame(sim.instruments[0], acc) * TO_REF_UNITS
    _assert_frame_parity(ours, np.atleast_3d(gold).reshape(ours.shape),
                         _bin_R(acc))


def test_bench2_frame_parity():
    gold, _ = read_fits(os.path.join(GOLDEN, "bench2_i0_total.fits"))
    sim = _run("bench2.ski", 1 << 17, max_events=16)
    _, accs, _ = sim.run_with_dust_emission(verbose=False)
    acc = jax.device_get(accs[0])
    ours = dinst.calibrate_frame(sim.instruments[0], acc) * TO_REF_UNITS
    gold = gold.reshape(ours.shape)
    _assert_frame_parity(ours, gold, _bin_R(acc))


def test_bench5_frame_and_stokes_parity():
    gold, _ = read_fits(os.path.join(GOLDEN, "bench5_i0_total.fits"))
    goldQ, _ = read_fits(os.path.join(GOLDEN, "bench5_i0_stokesQ.fits"))
    sim = _run("bench5.ski", 1 << 17, max_events=12)
    _, accs = sim.run_primary(verbose=False)
    acc = jax.device_get(accs[0])
    cfg = sim.instruments[0]
    ours = dinst.calibrate_frame(cfg, acc) * TO_REF_UNITS
    _assert_frame_parity(ours, gold.reshape(ours.shape), _bin_R(acc))
    # Stokes Q frame: net Q integral matches within MC noise of the
    # polarized component (sign convention pinned by bench5 SED parity)
    oq = dinst.calibrate_stokes_frames(cfg, acc)[0] * TO_REF_UNITS
    gq = goldQ.reshape(oq.shape)
    scale = np.abs(gq).sum()
    assert scale > 0
    assert np.abs(oq.sum() - gq.sum()) < 0.15 * scale
    # spatial pattern: coarse 16x16-binned Q maps correlate strongly
    a = _superpix(oq[0], 16).ravel()
    bb = _superpix(gq[0], 16).ravel()
    corr = np.corrcoef(a, bb)[0, 1]
    assert corr > 0.9, corr
