"""Monte Carlo simulation orchestrator.

TPU-native counterpart of the reference's MonteCarloSimulation state machine
(ref: SKIRT/core/MonteCarloSimulation.cpp:58 runSimulation, :104
runPrimaryEmission): phases launch packet batches through the jitted life
cycle, accumulating the radiation field and instrument records on device;
cross-device reduction (the reference's MPI allreduce,
MediumSystem.cpp:1304) is a psum when running under a device mesh.

The orchestrator is deliberately thin host Python: all hot work happens in
one compiled function per (batch shape, options) combination.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from .instruments import distant as dinst
from .media import system as msys
from .sources import base as src
from .transport import lifecycle as lc
from .utils import fits as fitsio


@dataclasses.dataclass
class Simulation:
    """A configured simulation: grid + medium + sources + instruments.

    Equivalent role to the reference's Configuration + subsystem wiring
    (ref: SKIRT/core/Configuration.hpp:32).
    """

    grid: object
    medium: msys.MediumTables
    sources: list
    instruments: list  # list[DistantInstrumentCfg]
    options: lc.TransportOptions
    rf_borders: np.ndarray | None = None  # radiation-field wavelength bins
    num_packets: int = 100_000
    batch_size: int = 16_384
    seed: int = 0

    def __post_init__(self):
        self._inst_tabs = [dinst.device_tables(c) for c in self.instruments]
        self._src_tabs = [s.tables() for s in self.sources]
        self._rf_borders_dev = (jnp.asarray(self.rf_borders, jnp.float32)
                                if self.rf_borders is not None else None)

    # -------------------------------------------------------------- internals

    def _source_allocation(self, n: int, source_bias: float = 0.5):
        """History-index allocation over sources with the composite
        luminosity/uniform bias (ref: SourceSystem.cpp:75 prepareForLaunch)."""
        ls = np.array([getattr(s, "luminosity", 1.0) for s in self.sources],
                      np.float64)
        wl = ls / ls.sum()
        m = len(self.sources)
        w = (1.0 - source_bias) * wl + source_bias / m
        counts = np.floor(w * n).astype(np.int64)
        counts[0] += n - counts.sum()
        # per-packet luminosity weight: (L_s / L_tot) / w_s corrects bias
        lum_weights = np.where(w > 0, wl / np.maximum(w, 1e-300), 0.0)
        return counts, lum_weights

    @functools.cached_property
    def _run_batch(self):
        grid = self.grid
        med = self.medium
        opts = self.options
        cfgs = tuple(self.instruments)
        tabs = self._inst_tabs
        rfb = self._rf_borders_dev

        def step(src_idx: int, n_src: int, lum_weight: float,
                 seed_key, history, rf, accs):
            source = self.sources[src_idx]
            stabs = self._src_tabs[src_idx]
            pkt = src.launch_batch(source, stabs, grid, seed_key, history, n_src)
            pkt = pkt._replace(lum=pkt.lum * lum_weight,
                               lum0=pkt.lum0 * lum_weight)
            return lc.life_cycle(grid, med, opts, cfgs, tabs, rfb,
                                 pkt, rf, accs)

        return jax.jit(step, static_argnums=(0, 1, 2), donate_argnums=(5, 6))

    # ------------------------------------------------------------------- runs

    def run_primary(self, verbose: bool = True):
        """Primary-emission segment (ref: MonteCarloSimulation.cpp:104).

        Returns (rf, accs): radiation field (ncells, nrf) absorbed-energy
        path-length sums [W m], instrument accumulators.
        """
        ncells = self.grid.ncells
        rf = (jnp.zeros((ncells, len(self.rf_borders) - 1), jnp.float32)
              if self.rf_borders is not None and self.options.store_rf else None)
        accs = [dinst.init_accumulators(c) for c in self.instruments]
        seed_key = jax.random.PRNGKey(self.seed)

        counts, lum_w = self._source_allocation(self.num_packets)
        B = self.batch_size
        t0 = time.perf_counter()
        launched = 0
        hist_base = 0
        for si, n_src in enumerate(counts):
            n_src = int(n_src)
            if n_src == 0:
                continue
            nb = -(-n_src // B)
            for b in range(nb):
                history = hist_base + b * B + jnp.arange(B, dtype=jnp.int32)
                # histories beyond this source's allocation launch dead
                rf, accs = self._run_batch(si, n_src, float(lum_w[si]),
                                           seed_key, history, rf, accs)
                launched += min(B, n_src - b * B)
            hist_base += n_src
        if accs:
            jax.block_until_ready(accs[0]["sed"])
        elif rf is not None:
            jax.block_until_ready(rf)
        dt = time.perf_counter() - t0
        if verbose:
            print(f"[skirt9_tpu] primary emission: {launched} packets in "
                  f"{dt:.2f} s ({launched/dt:,.0f} packets/s)")
        self.last_rate = launched / dt
        return rf, accs

    # ----------------------------------------------------------------- output

    def write_outputs(self, accs, prefix: str, outdir: str = ".") -> list[str]:
        """Calibrate and write instrument outputs (SED text + frame FITS),
        the analog of InstrumentSystem::write (root-only in the reference)."""
        import os
        paths = []
        for cfg, acc in zip(self.instruments, accs):
            sed = dinst.calibrate_sed(cfg, jax.device_get(acc))
            p = os.path.join(outdir, f"{prefix}_{cfg.name}_sed.dat")
            cols = ["wavelength", "total", "transparent", "primarydirect",
                    "primaryscattered", "secondarydirect", "secondaryscattered"]
            if "R" in sed:
                cols.append("R")
            header = ("# skirt9_tpu SED output\n# columns: "
                      + " ".join(cols) + "\n# wavelength [m], F_lambda [W/m2/m]\n")
            arr = np.column_stack([sed[c] for c in cols])
            with open(p, "w") as f:
                f.write(header)
                np.savetxt(f, arr)
            paths.append(p)
            if cfg.has_frame:
                cube = dinst.calibrate_frame(cfg, jax.device_get(acc))
                p2 = os.path.join(outdir, f"{prefix}_{cfg.name}_total.fits")
                fitsio.write_fits(p2, cube.astype(np.float32), {
                    "BUNIT": "W/m2/m/sr",
                    "CDELT1": cfg.fovx / cfg.npx,
                    "CDELT2": cfg.fovy / cfg.npy,
                })
                paths.append(p2)
        return paths
