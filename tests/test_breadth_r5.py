"""Round-5 item-tail breadth: Band/Line/Specific luminosity
normalizations (ref: BandLuminosityNormalization.hpp:18,
LineLuminosityNormalization.hpp:20, SpecificLuminosityNormalization)."""

import xml.etree.ElementTree as ET

import numpy as np

from skirt9_tpu.config.ski import build_source, source_luminosity

C = 2.99792458e8


def _el(xml):
    return ET.fromstring(xml)


def _planck_density(lam, T):
    h, kB = 6.62607015e-34, 1.380649e-23
    return 2 * h * C ** 2 / lam ** 5 / np.expm1(h * C / (lam * kB * T))


def test_band_luminosity_normalization():
    src = _el("""
      <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc">
        <sed type="SED"><BlackBodySED temperature="6000 K"/></sed>
        <normalization type="LuminosityNormalization">
          <BandLuminosityNormalization specificLuminosity="2e25 W/micron"
              unitStyle="wavelengthmonluminosity">
            <band type="Band">
              <ListBand wavelengths="0.5 micron, 0.55 micron, 0.6 micron"
                        transmissionValues="1,1,1"/>
            </band>
          </BandLuminosityNormalization>
        </normalization>
      </PointSource>""")
    lrange = (0.3e-6, 1.0e-6)
    L = source_luminosity(src, lrange)
    # expected: L * <p>_band = user L_lambda, p = normalized BB density
    lam = np.linspace(*lrange, 4001)
    p = _planck_density(lam, 6000.0)
    p = p / np.trapezoid(p, lam)
    lg = np.linspace(0.5e-6, 0.6e-6, 801)
    mean = np.trapezoid(np.interp(lg, lam, p), lg) / (0.1e-6)
    np.testing.assert_allclose(L * mean, 2e25 * 1e6, rtol=2e-2)
    s = build_source(src, lrange)
    np.testing.assert_allclose(s.luminosity, L, rtol=1e-12)


def test_line_luminosity_normalization():
    src = _el("""
      <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc">
        <sed type="SED">
          <ListLineSED wavelengths="0.5 micron, 0.7 micron"
                       luminosities="1 W, 3 W"/>
        </sed>
        <normalization type="LuminosityNormalization">
          <LineLuminosityNormalization wavelength="0.7 micron"
                                       luminosity="6 W"/>
        </normalization>
      </PointSource>""")
    # line at 0.7 um carries 3/4 of the SED -> L_total = 6 / 0.75 = 8 W
    np.testing.assert_allclose(source_luminosity(src), 8.0, rtol=1e-6)


def test_specific_luminosity_normalization_styles():
    tmpl = """
      <PointSource positionX="0 pc" positionY="0 pc" positionZ="0 pc">
        <sed type="SED"><BlackBodySED temperature="6000 K"/></sed>
        <normalization type="LuminosityNormalization">
          <SpecificLuminosityNormalization wavelength="0.55 micron"
              specificLuminosity="{L}" unitStyle="{style}"/>
        </normalization>
      </PointSource>"""
    lrange = (0.3e-6, 1.0e-6)
    lam0 = 0.55e-6
    L_w = source_luminosity(
        _el(tmpl.format(L="1e25 W/micron",
                        style="wavelengthmonluminosity")), lrange)
    # frequency style: L_nu = L_lambda * lam^2 / c at the same wavelength
    L_nu_val = 1e25 * 1e6 * lam0 ** 2 / C
    L_f = source_luminosity(
        _el(tmpl.format(L=f"{L_nu_val} W/Hz",
                        style="frequencymonluminosity")), lrange)
    np.testing.assert_allclose(L_f, L_w, rtol=1e-6)
    # neutral style: lambda * L_lambda
    L_n = source_luminosity(
        _el(tmpl.format(L=f"{1e25 * 1e6 * lam0} W",
                        style="neutralmonluminosity")), lrange)
    np.testing.assert_allclose(L_n, L_w, rtol=1e-6)
    # sanity: the SED density at 0.55 um ties L_total to L_lambda
    lam = np.linspace(*lrange, 4001)
    p = _planck_density(lam, 6000.0)
    p = p / np.trapezoid(p, lam)
    p0 = np.interp(lam0, lam, p)
    np.testing.assert_allclose(L_w * p0, 1e25 * 1e6, rtol=2e-2)
