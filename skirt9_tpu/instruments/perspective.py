"""Perspective instrument: an in-model camera with true 3D perspective.

Counterpart of the reference's PerspectiveInstrument (ref:
SKIRT/core/PerspectiveInstrument.cpp:20-90 setup transform, :132 detect):
the eye sits at distance `focal` behind the viewport origin along the
crosshair axis; peel-off directions point from each event to the eye; the
event position projects through the eye onto the viewport pixel grid; the
per-packet calibration uses the eye-frame depth (the reference passes the
transformed z as the detection distance). Designed for fly-through movies
of models.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import distant as dinst


@dataclasses.dataclass(frozen=True)
class PerspectiveInstrumentCfg:
    """Viewport origin `view`, aimed at `cross`; eye at distance `focal`
    behind the viewport (ref: PerspectiveInstrument.hpp properties)."""

    name: str
    wave_borders: tuple
    npx: int = 250
    npy: int = 250
    width: float = 1.0              # viewport physical width S_x [m]
    view: tuple = (0.0, 0.0, 0.0)   # viewport origin V [m]
    cross: tuple = (1.0, 0.0, 0.0)  # crosshair C [m]
    up: tuple = (0.0, 0.0, 1.0)
    focal: float = 1.0              # eye-to-viewport distance [m]
    record_statistics: bool = False
    stats_scale: float = 1.0

    @property
    def nbins(self) -> int:
        return len(self.wave_borders) - 1

    @property
    def is_local(self) -> bool:
        return True

    @property
    def is_perspective(self) -> bool:
        return True

    @property
    def pixel_size(self) -> float:
        return self.width / self.npx

    def frame(self):
        """(eye E, ex, ey, ez_front): eye position and the camera axes
        (ez_front points from the eye toward the crosshair;
        ref: PerspectiveInstrument.cpp:30-49)."""
        V = np.asarray(self.view, np.float64)
        C = np.asarray(self.cross, np.float64)
        kn = V - C
        n = np.linalg.norm(kn)
        if n < 1e-20:
            raise ValueError("crosshair too close to viewport origin")
        kn /= n
        E = V + self.focal * kn
        up = np.asarray(self.up, np.float64)
        ey = np.cross(kn, np.cross(up, kn))
        ny = np.linalg.norm(ey)
        if ny < 1e-20:
            raise ValueError("up direction parallel to viewing axis")
        ey /= ny
        ex = np.cross(ey, kn)
        return E, ex, ey, -kn


def device_tables(cfg: PerspectiveInstrumentCfg) -> dict:
    E, ex, ey, ez = cfg.frame()
    return {
        "obs": jnp.asarray(E, jnp.float32),     # peel-off target (the eye)
        "ex": jnp.asarray(ex, jnp.float32),
        "ey": jnp.asarray(ey, jnp.float32),
        "ez": jnp.asarray(ez, jnp.float32),
        "wave_borders": jnp.asarray(np.asarray(cfg.wave_borders),
                                    jnp.float32),
    }


def init_accumulators(cfg: PerspectiveInstrumentCfg) -> dict:
    return {"sky": jnp.zeros((dinst.NUM_KINDS, cfg.nbins, cfg.npy, cfg.npx),
                             jnp.float32)}


def detect(cfg: PerspectiveInstrumentCfg, tables: dict, acc: dict,
           lam: jax.Array, pos: jax.Array, dist: jax.Array,
           contrib: jax.Array, kind: int, active: jax.Array) -> dict:
    """Project event positions through the eye onto viewport pixels.

    `contrib` carries the caller's 1/dist^2 Euclidean factor; the
    reference calibrates local perspective detections by the EYE-FRAME
    DEPTH zp instead (PerspectiveInstrument.cpp:148 detect(pp, l, zp)), so
    the factor is converted to 1/zp^2 here.
    """
    borders = tables["wave_borders"]
    nb = cfg.nbins
    b = jnp.searchsorted(borders, lam, side="right") - 1
    q = pos - tables["obs"]
    xe = jnp.sum(q * tables["ex"], axis=-1)
    ye = jnp.sum(q * tables["ey"], axis=-1)
    ze = jnp.sum(q * tables["ez"], axis=-1)   # depth, positive in front
    s = cfg.pixel_size
    safe_z = jnp.where(jnp.abs(ze) < 1e-30, 1e-30, ze)
    i = jnp.floor(cfg.npx / 2 + (cfg.focal / s) * xe / safe_z).astype(
        jnp.int32)
    j = jnp.floor(cfg.npy / 2 + (cfg.focal / s) * ye / safe_z).astype(
        jnp.int32)
    ok = active & (b >= 0) & (b < nb) & (ze > s / 10) \
        & (i >= 0) & (i < cfg.npx) & (j >= 0) & (j < cfg.npy)
    # convert Euclidean-distance calibration to depth calibration
    c = jnp.where(ok, contrib * (dist * dist)
                  / jnp.maximum(ze * ze, 1e-30), 0.0)
    bq = jnp.clip(b, 0, nb - 1)
    iq = jnp.clip(i, 0, cfg.npx - 1)
    jq = jnp.clip(j, 0, cfg.npy - 1)
    acc = dict(acc)
    acc["sky"] = acc["sky"].at[kind, bq, jq, iq].add(c)
    return acc


def calibrate(cfg: PerspectiveInstrumentCfg, acc: dict) -> np.ndarray:
    """Surface-brightness cube (nb, npy, npx) [W/m^2/m/sr]: divide by bin
    width and the representative central-pixel solid angle
    (ref: PerspectiveInstrument.cpp:84-86)."""
    borders = np.asarray(cfg.wave_borders, np.float64)
    dlam = np.diff(borders)[:, None, None]
    alpha = 2.0 * np.arctan(0.5 * cfg.pixel_size / cfg.focal)
    omega = alpha * alpha
    sky = np.asarray(acc["sky"], np.float64)
    total = sky[dinst.KIND_PRIMARY_DIRECT] + sky[dinst.KIND_PRIMARY_SCATTERED] \
        + sky[dinst.KIND_SECONDARY_DIRECT] + sky[dinst.KIND_SECONDARY_SCATTERED]
    return total / (dlam * omega)
