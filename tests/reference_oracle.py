"""Independent float64 NumPy oracle for the reference physics.

Implements the dispersion relation and environment models directly from the
published equations (Stix parameters in raw angular-frequency form, exactly
the algebraic path of RayMain.jl:125-264 / RayTrace_lat.jl:44-194) --
deliberately a *different* formulation than the production ratio-form +
normalization path in raytrace_tpu.ops.dispersion, so agreement is a real
cross-check rather than a tautology.
"""

import numpy as np

C = 2.99792458e8
RE = 6.3712e6
E = 1.602e-19
ME = 9.1093e-31
MP = 1.6726219e-27
EPS0 = 8.854e-12


def stix_rlp(ne_m3, bmag, f):
    w = 2.0 * np.pi * f
    we2 = ne_m3 * E * E / (EPS0 * ME)
    wp2 = ne_m3 * E * E / (EPS0 * MP)
    oe = E * bmag / ME
    op = E * bmag / MP
    r = 1.0 - (we2 / w**2) * (w / (w - oe)) - (wp2 / w**2) * (w / (w + op))
    l = 1.0 - (we2 / w**2) * (w / (w + oe)) - (wp2 / w**2) * (w / (w - op))
    p = 1.0 - we2 / w**2 - wp2 / w**2
    return r, l, p


def mu_dmudpsi(ne_m3, bmag, f, psi, root=+1.0):
    """(mu, dmu/dpsi) via the reference's exact quadratic-formula path."""
    r, l, p = stix_rlp(ne_m3, bmag, f)
    d = (r - l) / 2.0
    s = (r + l) / 2.0
    a = s * np.sin(psi) ** 2 + p * np.cos(psi) ** 2
    b = r * l * np.sin(psi) ** 2 + p * s * (1.0 + np.cos(psi) ** 2)
    f2 = (r * l - p * s) ** 2 * np.sin(psi) ** 4 + 4.0 * (p * d * np.cos(psi)) ** 2
    fd = np.sqrt(f2)
    mu2 = (b + root * fd) / (2.0 * a)
    mu = np.sqrt(np.abs(mu2))
    dadpsi = 2.0 * (s - p) * np.sin(psi) * np.cos(psi)
    dbdpsi = 2.0 * (r * l - p * s) * np.sin(psi) * np.cos(psi)
    dfdpsi = (
        1.0
        / (2.0 * fd)
        * (
            (r * l - p * s) ** 2 * 4.0 * np.sin(psi) ** 3 * np.cos(psi)
            - 8.0 * (p * d) ** 2 * np.sin(psi) * np.cos(psi)
        )
    )
    dmudpsi = (
        1.0
        / (2.0 * mu)
        * (
            (dbdpsi + root * dfdpsi) / (2.0 * a)
            - 2.0 * dadpsi * (b + root * fd) / (2.0 * a**2)
        )
    )
    return mu, dmudpsi


def ne_raymain_m3(r_re):
    """RayMain.jl:153 ionosphere-only density, m^-3 (r in RE)."""
    return 1.0e6 * 1.8e5 * np.exp(-4.183119 * (r_re - 1.0471))


def bmag_lat(r_re, lat, b0):
    return b0 * np.sqrt(1.0 + 3.0 * np.sin(lat) ** 2) / r_re**3


def mu_lat_raymain_env(r_re, lat, chi, f, b0=3.0696381e-5):
    """RayMain-medium refractive index in the latitude frame."""
    dip = np.arctan(2.0 * np.tan(lat))
    psi = np.pi / 2.0 + dip + chi
    return mu_dmudpsi(ne_raymain_m3(r_re), bmag_lat(r_re, lat, b0), f, psi)
