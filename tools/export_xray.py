"""Export our built-in X-ray atomic data in the reference's resource format.

The reference's XRayAtomicGasMix loads XRay_MA.txt (30 rows: atomic mass
[amu], default abundance), XRay_PA.txt (Verner+96 photo-absorption fit
records: Z n l Eth Emax E0 sigma0 ya P yw y0 y1) and XRay_FL.txt
(fluorescence: Z n l yield E[eV] W[eV]) from its resource packs
(ref: XRayAtomicGasMix.cpp:814-831 loadStruct calls). The packs are not
downloadable in this environment, so this script writes files holding OUR
built-in data (media/xray.py: exact Verner H/He + approximate Fe K) —
dropping them into the reference's resource directory pins IDENTICAL
atomic physics on both sides of the parity benchmark, the same bridge
pattern as tools/export_dustmix.py for the MRN dust table.

Usage: python tools/export_xray.py OUTDIR
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from skirt9_tpu.media import xray as xr  # noqa: E402


def export(outdir: str) -> list[str]:
    os.makedirs(outdir, exist_ok=True)
    paths = []

    p = os.path.join(outdir, "XRay_MA.txt")
    with open(p, "w") as f:
        f.write("# atomic mass [amu], default abundance (rel. H) "
                "for Z = 1..30\n")
        for w, ab in zip(xr.ATOMIC_WEIGHTS, xr.SOLAR_ABUNDANCES):
            f.write(f"{w:.6g} {ab:.8g}\n")
    paths.append(p)

    p = os.path.join(outdir, "XRay_PA.txt")
    with open(p, "w") as f:
        f.write("# Z n l Eth[eV] Emax[eV] E0[eV] sigma0[Mb] ya P yw y0 y1\n")
        for s in list(xr.BUILTIN_SHELLS) + [xr.FE_K_SHELL]:
            f.write(f"{s.Z} {s.n} {s.l} {s.Eth:.6g} {s.Emax:.6g} "
                    f"{s.E0:.6g} {s.sigma0:.6g} {s.ya:.6g} {s.P:.6g} "
                    f"{s.yw:.6g} {s.y0:.6g} {s.y1:.6g}\n")
    paths.append(p)

    p = os.path.join(outdir, "XRay_FL.txt")
    with open(p, "w") as f:
        f.write("# Z n l yield E[eV] W[eV]\n")
        for ln in xr.FE_K_LINES:
            f.write(f"{ln.Z} {ln.n} {ln.l} {ln.yield_:.6g} "
                    f"{ln.E_line:.6g} {ln.width:.6g}\n")
    paths.append(p)
    return paths


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "."
    for p in export(out):
        print(p)
