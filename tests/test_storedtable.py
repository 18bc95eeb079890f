"""Stored-table (.stab) binary format round trip and mix construction."""

import numpy as np
import pytest

from skirt9_tpu.utils.storedtable import read_stored_table, write_stored_table
from skirt9_tpu.media import mixes as mx


def test_roundtrip_2d(tmp_path):
    lam = np.geomspace(1e-7, 1e-4, 12)
    a = np.geomspace(1e-9, 1e-6, 5)
    vals = np.zeros((5, 12, 2))  # (n2, n1, nq)
    for j in range(5):
        vals[j, :, 0] = lam * (j + 1)
        vals[j, :, 1] = lam ** 0.5
    p = str(tmp_path / "t.stab")
    write_stored_table(p, [("lambda", "m", "log", lam),
                           ("a", "m", "log", a)],
                       [("Qabs", "1", "log"), ("Qsca", "1", "log")], vals)
    t = read_stored_table(p)
    assert t.axes_names == ["lambda", "a"]
    assert t.quantity_names == ["Qabs", "Qsca"]
    np.testing.assert_allclose(t.axes_points[0], lam)
    np.testing.assert_allclose(t.values, vals)
    # interpolation at a grid point is exact
    v = t.interp("Qabs", **{"lambda": lam[3], "a": a[2]})
    assert v == pytest.approx(vals[2, 3, 0])


def test_mix_from_stab(tmp_path):
    lam = np.geomspace(1e-7, 1e-3, 30)
    sabs = 1e-24 * (lam / 1e-6) ** -1.0
    ssca = 0.5 * sabs
    g = np.full(30, 0.4)
    vals = np.stack([sabs, ssca, g], axis=-1)
    p = str(tmp_path / "mix.stab")
    write_stored_table(p, [("lambda", "m", "log", lam)],
                       [("sigmaabs", "m2/H", "log"),
                        ("sigmasca", "m2/H", "log"),
                        ("g", "1", "lin")], vals)
    mix = mx.from_stored_table(p, mu=1e-20)
    se, al, gg = mix.at(1e-6)
    assert se == pytest.approx(1.5e-24, rel=1e-6)
    assert al == pytest.approx(1.0 / 3.0, rel=1e-6)
    assert gg == pytest.approx(0.4)
