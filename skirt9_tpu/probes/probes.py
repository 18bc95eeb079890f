"""Probes: outputs of internal simulation state.

TPU-native counterpart of the reference's ProbeSystem + Probe + Form stack
(ref: SKIRT/core/ProbeSystem.hpp:60, Probe.hpp:29, ProbeFormBridge.hpp:23,
the ~55 probe classes of SURVEY.md §2.9): a probe is a function of the
simulation state producing text/FITS artifacts through a "form" — per-cell
dump, planar cut, or parallel projection — mirroring the reference's
orthogonal probe x form design without the class lattice.

Probes implemented here cover the most-used reference set: density,
opacity, temperature, radiation field, convergence (gridded vs input-model
column density), spatial grid properties, luminosity per source.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import fits as fitsio


# -------------------------------------------------------------------- forms

def per_cell_form(path: str, grid, quantities: dict[str, np.ndarray],
                  unit_note: str = "") -> str:
    """Text dump of per-cell values with cell centers
    (ref: PerCellForm / SpatialCellPropertiesProbe)."""
    centers = np.asarray(grid.cell_centers(), np.float64)
    cols = [centers[:, 0], centers[:, 1], centers[:, 2]]
    names = ["x", "y", "z"]
    for k, v in quantities.items():
        cols.append(np.asarray(v, np.float64))
        names.append(k)
    header = ("# skirt9_tpu per-cell probe\n# columns: " + " ".join(names)
              + ("\n# " + unit_note if unit_note else ""))
    arr = np.column_stack(cols)
    with open(path, "w") as f:
        f.write(header + "\n")
        np.savetxt(f, arr)
    return path


def planar_cut_form(path: str, grid, values_fn, axis: str = "z",
                    offset: float = 0.0, npix: int = 256,
                    extent=None) -> str:
    """FITS image of a scalar field on a planar cut through the domain
    (ref: DefaultCutsForm / PlanarCutsForm): values_fn(pos (N,3)) -> (N,)."""
    import jax.numpy as jnp
    if extent is None:
        lo = [float(grid.xb[0]), float(grid.yb[0]), float(grid.zb[0])] \
            if hasattr(grid, "xb") else np.asarray(grid.box_lo, float)
        hi = [float(grid.xb[-1]), float(grid.yb[-1]), float(grid.zb[-1])] \
            if hasattr(grid, "xb") else np.asarray(grid.box_hi, float)
    else:
        lo, hi = extent
    ax = {"x": 0, "y": 1, "z": 2}[axis]
    a1, a2 = [i for i in range(3) if i != ax]
    u = np.linspace(lo[a1], hi[a1], npix)
    v = np.linspace(lo[a2], hi[a2], npix)
    U, V = np.meshgrid(u, v)
    pos = np.zeros((npix * npix, 3))
    pos[:, a1] = U.ravel()
    pos[:, a2] = V.ravel()
    pos[:, ax] = offset
    vals = np.asarray(values_fn(jnp.asarray(pos, jnp.float32)), np.float64)
    fitsio.write_fits(path, vals.reshape(npix, npix).astype(np.float32),
                      {"CUTAXIS": axis, "CUTOFFS": offset})
    return path


def cell_scalar_fn(grid, per_cell: np.ndarray):
    """Lift a per-cell array to a position-valued function for cuts."""
    import jax.numpy as jnp
    vals = jnp.asarray(np.asarray(per_cell, np.float32))

    def fn(pos):
        c = grid.locate(pos)
        return jnp.where(c >= 0, vals[jnp.maximum(c, 0)], 0.0)
    return fn


# ------------------------------------------------------------------- probes

def density_probe(sim, prefix: str, outdir: str = ".", cuts: bool = True):
    """Per-cell number density + midplane cuts per component
    (ref: DensityProbe)."""
    nd = np.asarray(sim.medium.nd, np.float64)
    paths = []
    q = {f"nd_{h}": nd[:, h] for h in range(nd.shape[1])}
    paths.append(per_cell_form(os.path.join(outdir, f"{prefix}_density.dat"),
                               sim.grid, q, "number density [1/m3]"))
    if cuts:
        for h in range(nd.shape[1]):
            fn = cell_scalar_fn(sim.grid, nd[:, h])
            for axis in "xyz":
                paths.append(planar_cut_form(
                    os.path.join(outdir, f"{prefix}_density_{h}_{axis}.fits"),
                    sim.grid, fn, axis=axis))
    return paths


def opacity_probe(sim, lam: float, prefix: str, outdir: str = "."):
    """Per-cell extinction opacity k [1/m] at a wavelength
    (ref: OpacityProbe)."""
    import jax.numpy as jnp
    from ..media import system as msys
    med = sim.medium
    opt = msys.optics_at(med, jnp.full((1,), lam, jnp.float32))
    se = np.asarray(opt.sigma_ext, np.float64)[0]  # (H,)
    nd = np.asarray(med.nd, np.float64)
    k = (nd * se).sum(axis=1)
    return [per_cell_form(os.path.join(outdir, f"{prefix}_opacity.dat"),
                          sim.grid, {"k_ext": k}, f"opacity [1/m] at {lam} m")]


def temperature_probe(sim, rf, prefix: str, outdir: str = "."):
    """Indicative equilibrium dust temperature per cell + cuts
    (ref: TemperatureProbe)."""
    T = np.asarray(sim.dust_temperature(rf), np.float64)
    paths = [per_cell_form(os.path.join(outdir, f"{prefix}_temperature.dat"),
                           sim.grid, {f"T_{h}": T[:, h]
                                      for h in range(T.shape[1])},
                           "equilibrium dust temperature [K]")]
    fn = cell_scalar_fn(sim.grid, T[:, 0])
    paths.append(planar_cut_form(
        os.path.join(outdir, f"{prefix}_temperature_z.fits"), sim.grid, fn))
    return paths


def radiation_field_probe(sim, rf, prefix: str, outdir: str = "."):
    """Mean intensity J_lambda per cell per RF bin [W/m2/m/sr]
    (ref: RadiationFieldProbe)."""
    rf64 = np.asarray(rf, np.float64) * sim.rf_scale
    vols = np.asarray(sim.grid.volumes(), np.float64)
    dlam = np.diff(np.asarray(sim.rf_borders, np.float64))
    J = rf64 / (4 * np.pi * vols[:, None] * dlam[None, :])
    q = {f"J_{i}": J[:, i] for i in range(J.shape[1])}
    return [per_cell_form(os.path.join(outdir, f"{prefix}_radiationfield.dat"),
                          sim.grid, q, "mean intensity [W/m2/m/sr]")]


def convergence_probe(sim, components, prefix: str, outdir: str = "."):
    """Gridded vs input-model column density along the axes + total mass
    (ref: ConvergenceInfoProbe): quantifies grid discretization quality.

    components: the (geometry, mix, normalization) list used to build the
    medium (for the input-model side).
    """
    import jax.numpy as jnp
    from ..media import geometric as gm
    lines = ["# skirt9_tpu convergence info",
             "# columns: quantity gridded input_model rel_error"]
    nd = np.asarray(sim.medium.nd, np.float64)
    vols = np.asarray(sim.grid.volumes(), np.float64)

    for h, (geom, mix, norm) in enumerate(components):
        factor = norm.number_factor(geom, mix)
        # total number of entities
        n_grid = float((nd[:, h] * vols).sum())
        n_model = factor  # density profiles integrate to 1
        lines.append(f"total_number_{h} {n_grid:.6e} {n_model:.6e} "
                     f"{abs(n_grid - n_model) / max(n_model, 1e-300):.4e}")
        # column along +z
        rmax = getattr(geom, "rmax", None)
        if rmax:
            zs = np.linspace(1e-6 * rmax, rmax, 10001)
            pos = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1)
            cells = np.asarray(sim.grid.locate(jnp.asarray(pos, jnp.float32)))
            col_grid = float(np.trapezoid(
                np.where(cells >= 0, nd[np.maximum(cells, 0), h], 0.0), zs))
            col_model = factor * float(np.trapezoid(geom.density_np(pos), zs))
            lines.append(f"column_z_{h} {col_grid:.6e} {col_model:.6e} "
                         f"{abs(col_grid - col_model) / max(col_model, 1e-300):.4e}")
    path = os.path.join(outdir, f"{prefix}_convergence.dat")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return [path]


def grid_probe(sim, prefix: str, outdir: str = "."):
    """Spatial grid statistics (ref: SpatialCellPropertiesProbe /
    TreeSpatialGridTopologyProbe companion info)."""
    vols = np.asarray(sim.grid.volumes(), np.float64)
    lines = [
        "# skirt9_tpu spatial grid properties",
        f"ncells {sim.grid.ncells}",
        f"min_cell_volume_m3 {vols.min():.6e}",
        f"max_cell_volume_m3 {vols.max():.6e}",
        f"total_volume_m3 {vols.sum():.6e}",
    ]
    path = os.path.join(outdir, f"{prefix}_grid.dat")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return [path]


def luminosity_probe(sim, prefix: str, outdir: str = "."):
    """Per-source luminosities and packet allocation
    (ref: LuminosityProbe / LaunchedPacketsProbe)."""
    counts, weights = sim._source_allocation(sim.num_packets)
    lines = ["# skirt9_tpu source luminosities",
             "# columns: source luminosity_W packets lum_weight"]
    for i, s in enumerate(sim.sources):
        lines.append(f"{i} {float(getattr(s, 'luminosity', 1.0)):.6e} "
                     f"{int(counts[i])} {float(weights[i]):.6e}")
    path = os.path.join(outdir, f"{prefix}_luminosities.dat")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return [path]
