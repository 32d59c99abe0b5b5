"""Debug gates: NaN trapping and domain checking (SURVEY.md section 5.2).

The reference's failure handling is a try/catch DomainError around
sqrt(mu^2) with an unphysical abs() fallback (RayMain.jl:212-238) and
commented-out println probes. Here:
  - enable_nan_debugging(): flip jax_debug_nans so the first NaN-producing
    primitive raises with a traceback (the sanitizer-style gate);
  - checked_mu_2d_lat(): a checkify-wrapped dispersion eval that reports
    evanescent-root and non-finite conditions as structured errors instead
    of silently abs()-guarding -- for interactive medium exploration, not
    for the hot loop (the traced framework carries per-ray status codes
    there instead).
"""

import jax
from jax.experimental import checkify

from ..models import medium
from ..ops import dispersion


def enable_nan_debugging(on=True):
    """Raise on the first NaN produced inside any jitted computation."""
    jax.config.update("jax_debug_nans", on)


def checked_mu_2d_lat(r, lat, chi, f, env: medium.EnvParams, root=1.0):
    """(error, mu): checkified dispersion evaluation.

    error.throw() raises with a message if the selected root is evanescent
    (mu^2 < 0 -- the condition the reference papers over with abs(),
    'abs() is not physical! for test only', RayMain.jl:213) or if mu is
    non-finite (the DomainError class it catches)."""

    import jax.numpy as jnp

    r, lat, chi, f = (jnp.asarray(x) for x in (r, lat, chi, f))

    def f_checked(r, lat, chi, f):
        sinpsi, cospsi = dispersion.psi_trig_lat(lat, chi)
        ne = medium.ne_total_m3(r, lat, env)
        b = medium.b_mag(r, lat, env)
        rr, ll, pp = dispersion.stix_rlp(ne, b, f)
        mu2 = dispersion.mu2_signed_trig(rr, ll, pp, sinpsi, cospsi, root)
        checkify.check(
            mu2 >= 0.0,
            "evanescent root: mu^2 = {mu2} < 0 at r={r}, lat={lat}",
            mu2=mu2, r=r, lat=lat,
        )
        mu = dispersion.mu_from_mu2(mu2)
        checkify.check(
            jax.numpy.isfinite(mu), "non-finite mu at r={r}, lat={lat}",
            r=r, lat=lat,
        )
        return mu

    checked = checkify.checkify(f_checked)
    return checked(r, lat, chi, f)
