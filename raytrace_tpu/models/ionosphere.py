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


def ne_iono_cm3(r, n0, decay, r0):
    """Ionospheric electron density in cm^-3 at radius r (RE)."""
    return n0 * jnp.exp(-decay * (r - r0))
