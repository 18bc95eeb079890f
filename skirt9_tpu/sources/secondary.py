"""Secondary (thermal dust) source: launch packets from cell emission spectra.

Counterpart of the reference's SecondarySourceSystem + DustSecondarySource
(ref: SKIRT/core/SecondarySourceSystem.cpp:84 prepareForLaunch,
DustSecondarySource.hpp:24,42-73): packets are distributed over cells with
the composite luminosity/uniform spatial bias (xi = spatialBias), each packet
samples its wavelength from its cell's equilibrium emission spectrum cdf and
launches isotropically from a uniform random position inside the cell.

Unlike the reference (thread-local lazy per-cell spectra), the TPU design
precomputes the full (ncells, L) spectrum cdf table on device — the batched
equivalent, trading HBM for gather throughput; cell-chunked scheduling for
huge grids is a later optimization (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng


@dataclasses.dataclass(frozen=True)
class DustSecondarySource:
    """Static config; all device state lives in the tables dict
    (protocol: tables() -> dict consumed by launch(tabs, keys, n))."""

    luminosity: float          # total dust luminosity [W]
    spatial_bias: float = 0.5
    # wavelength support of the emission spectra — lets the Simulation build
    # bin-pure strata for the sweep engine even though there is no single
    # SED (per-cell spectra); see Simulation._strata_for
    lam_range: tuple = None
    _tables: dict = dataclasses.field(default=None, compare=False, hash=False,
                                      repr=False)

    def tables(self) -> dict:
        return self._tables

    def launch(self, tabs: dict, keys: jax.Array, n_total: int) -> dict:
        # --- cell selection with bias correction
        cell_cdf = tabs["cell_cdf"]
        u_cell = rng.uniform(keys, rng.LAUNCH_CELL)
        cell = jnp.clip(jnp.searchsorted(cell_cdf, u_cell, side="right"),
                        0, cell_cdf.shape[0] - 1).astype(jnp.int32)
        # total luminosity flows through the TRACED tables: segment runners
        # are jit-cached per flow and reused across self-absorption
        # iterations whose source luminosity changes — a closed-over python
        # float would go stale (round-3 bugfix)
        lum = (tabs["lum_total"] / n_total) * tabs["cell_weight"][cell]

        # --- wavelength from the cell's emission spectrum cdf
        rows = tabs["spec_cdf"][cell]                   # (B, L)
        u_lam = rng.uniform(keys, rng.EMISSION_LAMBDA)
        borders = tabs["lam_borders"]
        if "strata" in tabs:
            # stratified launch for wavelength-binned sweep deposits: lane i
            # draws from its cell's spectrum CONDITIONED on the stratum's
            # wavelength range, importance weight R * m_cell(stratum) (the
            # cell's spectral mass in the stratum) — unbiased, and the batch
            # becomes bin-pure so the Pallas deposit kernels apply to
            # secondary segments too (round-3 fix: these segments previously
            # fell back to the scan march)
            sb = tabs["strata"]
            B = u_lam.shape[0]
            R = sb.shape[0] - 1
            stratum = (jnp.arange(B, dtype=jnp.int32) * R) // B
            lo = jnp.clip(sb[stratum], borders[0], borders[-1])
            hi = jnp.clip(sb[stratum + 1], borders[0], borders[-1])

            def cdf_at(lam):
                from ..ops import sampling as _smp
                j = jnp.clip(_smp.searchsorted_right(borders, lam) - 1,
                             0, rows.shape[1] - 1)
                c0_ = jnp.where(j > 0, _smp.take_along_small(
                    rows, jnp.maximum(j - 1, 0)), 0.0)
                c1_ = _smp.take_along_small(rows, j)
                bj = _smp.take_small(borders, j)
                f = (lam - bj) / jnp.maximum(
                    _smp.take_small(borders, j + 1) - bj, 1e-30)
                return c0_ + jnp.clip(f, 0.0, 1.0) * (c1_ - c0_)

            clo = cdf_at(lo)
            chi = cdf_at(hi)
            m = jnp.maximum(chi - clo, 0.0)
            u_lam = clo + u_lam * m
            w = R * m
            if "strata_w" in tabs:
                w = w * tabs["strata_w"][stratum]
            lum = lum * w
        from ..ops import sampling as _smp
        li = jnp.sum((rows < u_lam[:, None]).astype(jnp.int32), axis=1)
        li = jnp.clip(li, 0, rows.shape[1] - 1)
        c0 = jnp.where(li > 0,
                       _smp.take_along_small(rows, jnp.maximum(li - 1, 0)),
                       0.0)
        c1 = _smp.take_along_small(rows, li)
        frac = jnp.where(c1 > c0, (u_lam - c0) / jnp.maximum(c1 - c0, 1e-30), 0.5)
        b0 = _smp.take_small(borders, li)
        b1 = _smp.take_small(borders, li + 1)
        lam = b0 + frac * (b1 - b0)
        if "strata" in tabs:
            # keep strictly inside the stratum against rounding
            lam = jnp.clip(lam, lo, hi * (1.0 - 1e-7))

        # --- uniform random position inside the cell
        # (ref: SpatialGrid::randomPositionInCell)
        u3 = jax.vmap(lambda k: jax.random.uniform(k, (3,)))(
            rng.purpose_key(keys, rng.LAUNCH_POSITION))
        lo = tabs["cell_lo"][cell]
        hi = tabs["cell_hi"][cell]
        pos = lo + u3 * (hi - lo)

        dirn = rng.isotropic_direction(keys, rng.LAUNCH_DIRECTION)
        return {"lam": lam, "lum": lum, "pos": pos, "dir": dirn}


def prepare(grid, L_cell, eps, ems_borders: np.ndarray,
            spatial_bias: float = 0.5) -> DustSecondarySource:
    """Build the secondary source from per-cell luminosities and spectra.

    L_cell (ncells,) bolometric dust luminosity; eps (ncells, L) emission
    spectrum (any per-cell normalization; only the shape matters for
    sampling). ems_borders (L+1,) wavelength borders.
    """
    L_np = np.asarray(L_cell, np.float64)
    total = float(L_np.sum())
    nonzero = L_np > 0
    n_nonzero = max(int(nonzero.sum()), 1)

    # composite bias over luminous cells (ref: SecondarySourceSystem.cpp:84):
    wl = np.where(nonzero, L_np / max(total, 1e-300), 0.0)
    xi = spatial_bias
    w = (1 - xi) * wl + xi * nonzero / n_nonzero
    wsum = w.sum()
    if wsum <= 0:
        w = np.full_like(w, 1.0 / len(w))
        wsum = 1.0
    w = w / wsum
    cdf = np.cumsum(w)
    weight = np.where(w > 0, wl / np.maximum(w, 1e-300), 0.0)

    # per-cell spectrum cdf over emission bins (bin-integrated weights)
    eps_np = np.asarray(eps, np.float64)
    dlam = np.diff(ems_borders)
    wspec = np.maximum(eps_np, 0.0) * dlam[None, :]
    tot = wspec.sum(axis=1, keepdims=True)
    spec_cdf = np.cumsum(wspec, axis=1) / np.maximum(tot, 1e-300)

    lo, hi = cell_bounds(grid)

    tables = {
        "lum_total": jnp.asarray(total, jnp.float32),
        "cell_cdf": jnp.asarray(cdf, jnp.float32),
        "cell_weight": jnp.asarray(weight, jnp.float32),
        "lam_borders": jnp.asarray(ems_borders, jnp.float32),
        "spec_cdf": jnp.asarray(spec_cdf, jnp.float32),
        "cell_lo": jnp.asarray(lo, jnp.float32),
        "cell_hi": jnp.asarray(hi, jnp.float32),
    }
    return DustSecondarySource(luminosity=total, spatial_bias=spatial_bias,
                               lam_range=(float(ems_borders[0]),
                                          float(ems_borders[-1])),
                               _tables=tables)


def prepare_device(grid, L_cell, eps, ems_borders: np.ndarray,
                   spatial_bias: float = 0.5,
                   bounds_dev=None) -> DustSecondarySource:
    """Device-resident variant of prepare(): the emission spectra stay on
    device (only the (ncells,) luminosities cross the link for the exact
    f64 launch cdf). bounds_dev: cached (cell_lo, cell_hi) device arrays.
    """
    L_np = np.asarray(L_cell, np.float64)       # small pull
    total = float(L_np.sum())
    nonzero = L_np > 0
    n_nonzero = max(int(nonzero.sum()), 1)
    wl = np.where(nonzero, L_np / max(total, 1e-300), 0.0)
    xi = spatial_bias
    w = (1 - xi) * wl + xi * nonzero / n_nonzero
    wsum = w.sum()
    if wsum <= 0:
        w = np.full_like(w, 1.0 / len(w))
        wsum = 1.0
    w = w / wsum
    cdf = np.cumsum(w)
    weight = np.where(w > 0, wl / np.maximum(w, 1e-300), 0.0)

    emsb = jnp.asarray(ems_borders, jnp.float32)
    dlam = emsb[1:] - emsb[:-1]
    wspec = jnp.maximum(eps, 0.0) * dlam[None, :]
    tot = jnp.sum(wspec, axis=1, keepdims=True)
    spec_cdf = jnp.cumsum(wspec, axis=1) / jnp.maximum(tot, 1e-30)

    if bounds_dev is None:
        lo, hi = cell_bounds(grid)
        bounds_dev = (jnp.asarray(lo, jnp.float32),
                      jnp.asarray(hi, jnp.float32))
    tables = {
        "lum_total": jnp.asarray(total, jnp.float32),
        "cell_cdf": jnp.asarray(cdf, jnp.float32),
        "cell_weight": jnp.asarray(weight, jnp.float32),
        "lam_borders": emsb,
        "spec_cdf": spec_cdf,
        "cell_lo": bounds_dev[0],
        "cell_hi": bounds_dev[1],
    }
    return DustSecondarySource(luminosity=total, spatial_bias=spatial_bias,
                               lam_range=(float(ems_borders[0]),
                                          float(ems_borders[-1])),
                               _tables=tables)


def cell_bounds(grid):
    """Axis-aligned bounds per cell for position sampling. Grids with
    non-box cells provide their own cell_bounds()."""
    if hasattr(grid, "cell_bounds"):
        return grid.cell_bounds()
    nx, ny, nz = grid.shape
    xb = np.asarray(grid.xb, np.float64)
    yb = np.asarray(grid.yb, np.float64)
    zb = np.asarray(grid.zb, np.float64)
    lo = np.stack(np.meshgrid(xb[:-1], yb[:-1], zb[:-1], indexing="ij"),
                  axis=-1).reshape(-1, 3)
    hi = np.stack(np.meshgrid(xb[1:], yb[1:], zb[1:], indexing="ij"),
                  axis=-1).reshape(-1, 3)
    return lo, hi
