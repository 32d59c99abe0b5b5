"""Isotropic exponential ionosphere electron-density fits.

Two fit variants exist in the reference:
  - the traced variant n = 1.8e5 exp(-4.183119 (r - 1.0471)) cm^-3
    (RayMain.jl:153, RayTrace_lat.jl:70, RayTrace_3D.jl:106)
  - an alternative eyeballed-IRI dayside fit n = 1e5 exp(-10 (r - 1.0471))
    (plasmasphere.jl:115, active variant in ionosphere_eq)
Both are instances of n0 * exp(-k (r - r0)) and are selected by parameters.
r is in units of RE.
"""

import jax.numpy as jnp

# (n0 [cm^-3], decay k, offset r0 [RE]) for the two reference fits
TRACED_FIT = (1.8e5, 4.183119, 1.0471)
IRI_DAYSIDE_FIT = (1.0e5, 10.0, 1.0471)
# nightside companion to the dayside IRI fit: one decade lower peak
# density with a slightly softer topside falloff, matching the shape of
# the nightside profile in the source the reference eyeballed its dayside
# fit from (Sousa dissertation p32; the reference's own next steps were
# "more careful fits to dayside and nightside" + "interpolate between
# these based on input MLT", plasmasphere.jl:110-113 -- never built there,
# implemented here)
IRI_NIGHTSIDE_FIT = (1.0e4, 8.0, 1.0471)


def ne_iono_cm3(r, n0, decay, r0):
    """Ionospheric electron density in cm^-3 at radius r (RE)."""
    return n0 * jnp.exp(-decay * (r - r0))


def day_weight(mlt):
    """Smooth dayside weight in [0, 1] from magnetic local time (hours).

    1 at local noon (mlt = 12), 0 at midnight, cosine in between --
    the MLT interpolation step the reference planned
    (plasmasphere.jl:111-112)."""
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * mlt / 24.0))


def ne_iono_mlt_cm3(r, mlt, day_fit=IRI_DAYSIDE_FIT,
                    night_fit=IRI_NIGHTSIDE_FIT):
    """Day/night-interpolated ionosphere density at radius r (RE)."""
    w = day_weight(mlt)
    return w * ne_iono_cm3(r, *day_fit) + (1.0 - w) * ne_iono_cm3(
        r, *night_fit
    )
