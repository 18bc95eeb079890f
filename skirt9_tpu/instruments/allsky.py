"""All-sky instrument: an observer inside the model mapping the full sphere.

Counterpart of the reference's AllSkyInstrument + AllSkyProjection
(ref: SKIRT/core/AllSkyInstrument.hpp, MollweideProjection,
HammerAitoffProjection): peel-off directions point from each emission/
scattering event to the observer position; arrival directions project to
sky pixels via the Mollweide equal-area projection; contributions carry the
local-instrument 1/d^2 calibration (ref: FluxRecorder local instrument
per-packet distance calibration).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import distant as dinst


@dataclasses.dataclass(frozen=True)
class AllSkyInstrumentCfg:
    """Mollweide all-sky map observer at `position` [m]."""

    name: str
    wave_borders: tuple
    position: tuple = (0.0, 0.0, 0.0)
    npx: int = 250                  # pixels in x (2:1 aspect)
    record_statistics: bool = False
    stats_scale: float = 1.0
    projection: str = "mollweide"   # or "hammer"

    @property
    def nbins(self) -> int:
        return len(self.wave_borders) - 1

    @property
    def npy(self) -> int:
        return self.npx // 2

    @property
    def is_local(self) -> bool:
        return True


def device_tables(cfg: AllSkyInstrumentCfg) -> dict:
    return {
        "obs": jnp.asarray(np.asarray(cfg.position), jnp.float32),
        "wave_borders": jnp.asarray(np.asarray(cfg.wave_borders), jnp.float32),
    }


def init_accumulators(cfg: AllSkyInstrumentCfg) -> dict:
    return {"sky": jnp.zeros((dinst.NUM_KINDS, cfg.nbins, cfg.npy, cfg.npx),
                             jnp.float32)}


def observer_directions(tables: dict, pos: jax.Array):
    """(k_to_obs (B,3), distance (B,)) from event positions to the observer."""
    d = tables["obs"] - pos
    dist = jnp.linalg.norm(d, axis=-1)
    k = d / jnp.maximum(dist[..., None], 1e-30)
    return k, dist


def _mollweide_xy(lon, lat, iters: int = 6):
    """Mollweide forward projection to x in [-2,2], y in [-1,1]."""
    t = lat

    def newton(t, _):
        f = 2 * t + jnp.sin(2 * t) - jnp.pi * jnp.sin(lat)
        df = 2 + 2 * jnp.cos(2 * t)
        return t - f / jnp.maximum(df, 1e-6), None

    t, _ = jax.lax.scan(newton, t, None, length=iters)
    x = 2 / jnp.pi * lon * jnp.cos(t) * (2 / 2)
    y = jnp.sin(t)
    return x * (2 / 2), y  # x in [-2,2] (lon in [-pi,pi]), y in [-1,1]


def detect(cfg: AllSkyInstrumentCfg, tables: dict, acc: dict,
           lam: jax.Array, arrival_dir: jax.Array, contrib: jax.Array,
           kind: int, active: jax.Array) -> dict:
    """Record contributions arriving at the observer from direction
    `arrival_dir` (pointing from observer toward the event)."""
    borders = tables["wave_borders"]
    nb = cfg.nbins
    b = jnp.searchsorted(borders, lam, side="right") - 1
    ok = active & (b >= 0) & (b < nb) & (contrib > 0)
    bq = jnp.clip(b, 0, nb - 1)

    kx, ky, kz = arrival_dir[..., 0], arrival_dir[..., 1], arrival_dir[..., 2]
    lon = jnp.arctan2(ky, kx)              # [-pi, pi]
    lat = jnp.arcsin(jnp.clip(kz, -1, 1))  # [-pi/2, pi/2]
    x, y = _mollweide_xy(lon, lat)
    ix = jnp.clip(((x / 2 + 1) * 0.5 * cfg.npx).astype(jnp.int32),
                  0, cfg.npx - 1)
    iy = jnp.clip(((y + 1) * 0.5 * cfg.npy).astype(jnp.int32),
                  0, cfg.npy - 1)
    c = jnp.where(ok, contrib, 0.0)
    acc = dict(acc)
    acc["sky"] = acc["sky"].at[kind, bq, iy, ix].add(c)
    return acc


def calibrate(cfg: AllSkyInstrumentCfg, acc: dict) -> np.ndarray:
    """Surface brightness cube (nb, npy, npx) [W/m2/m/sr]: contributions
    already include 1/d^2; divide by bin width and pixel solid angle
    (equal-area projection: Omega_pix = 4 pi / (useful pixels))."""
    borders = np.asarray(cfg.wave_borders, np.float64)
    dlam = np.diff(borders)[:, None, None]
    # Mollweide ellipse fills pi/4 of the enclosing rectangle
    omega_pix = 4 * np.pi / (cfg.npx * cfg.npy * np.pi / 4)
    sky = np.asarray(acc["sky"], np.float64)
    total = sky[dinst.KIND_PRIMARY_DIRECT] + sky[dinst.KIND_PRIMARY_SCATTERED] \
        + sky[dinst.KIND_SECONDARY_DIRECT] + sky[dinst.KIND_SECONDARY_SCATTERED]
    return total / (dlam * omega_pix)
