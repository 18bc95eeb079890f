"""Export a turnkey multi-grain dust mix as a MeanFileDustMix text table.

The reference binary cannot load its resource-backed mixes in this
environment (no resource packs); this exporter writes our Mie-integrated
mean optical properties (media/grains.py) in the 4-column format of
MeanFileDustMix (ref: SKIRT/core/MeanFileDustMix.hpp:18-27 — wavelength
[micron], kappa_ext [m2/kg], albedo, asymmetry), unblocking A/B parity and
baseline runs on panchromatic + dust-emission configs (BASELINE.md 2-5).

Usage: python tools/export_dustmix.py [mrn|draineli|zubko|wd|themis] out.txt
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from skirt9_tpu.media import grains as gr  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mrn"
    out = sys.argv[2] if len(sys.argv) > 2 else f"{name}_mean.txt"
    mg = {"mrn": gr.mrn_mix, "draineli": gr.draine_li_mix,
          "zubko": gr.zubko_mix, "wd": gr.weingartner_draine_mix,
          "themis": gr.themis_mix}[name]()
    mix = mg.mix
    kappa = mix.sigma_ext / mix.mu  # m2 per kg of dust
    with open(out, "w") as f:
        f.write("# Mean dust properties exported from skirt9_tpu "
                f"({name} multi-grain mix, Mie-integrated)\n")
        f.write("# column 1: wavelength (micron)\n")
        f.write("# column 2: extinction mass coefficient (m2/kg)\n")
        f.write("# column 3: scattering albedo (1)\n")
        f.write("# column 4: asymmetry parameter (1)\n")
        for lam, k, a, g in zip(mix.lam, kappa, mix.albedo, mix.g):
            f.write(f"{lam*1e6:.8e} {k:.8e} {a:.8e} {g:.8e}\n")
    print(f"wrote {out}: {mix.lam.size} rows, "
          f"kappa_V={np.interp(0.55e-6, mix.lam, kappa):.1f} m2/kg")


if __name__ == "__main__":
    main()
