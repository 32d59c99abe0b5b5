"""Centered-dipole geomagnetic field.

Scalar magnitude (reference: RayMain.jl:150, RayTrace_lat.jl:66) and vector
components (reference: RayTrace_3D.jl:54-66). All radii are in units of RE.
"""

import jax.numpy as jnp


def b_mag_lat(r, lat, b0):
    """|B|(r, lat) = b0 / r^3 * sqrt(1 + 3 sin^2(lat)).

    r in RE, lat = magnetic latitude (rad). Reference: RayTrace_lat.jl:66.
    """
    s = jnp.sin(lat)
    return b0 * jnp.sqrt(1.0 + 3.0 * s * s) / (r * r * r)


def b_mag_colat(r, theta, b0):
    """|B|(r, theta) with colatitude theta (rad). Reference: RayMain.jl:150."""
    c = jnp.cos(theta)
    return b0 * jnp.sqrt(1.0 + 3.0 * c * c) / (r * r * r)


def b_vec_colat(r, theta, phi, b0):
    """Vector dipole field (B_r, B_theta, B_phi) at (r, theta, phi).

    r in RE, theta = colatitude. Valid L ~ 2-5 per the reference comment.
    Reference: RayTrace_3D.jl:54-66 (Br = -2 b0 sin(lat)/r^3,
    Btheta = -b0 cos(lat)/r^3, Bphi = 0, with lat = pi/2 - theta).
    """
    lat = jnp.pi / 2.0 - theta
    inv_r3 = 1.0 / (r * r * r)
    br = -2.0 * b0 * inv_r3 * jnp.sin(lat)
    btheta = -b0 * inv_r3 * jnp.cos(lat)
    bphi = jnp.zeros_like(br)
    return br, btheta, bphi


def moment_unit(tilt, phi0):
    """Unit dipole-moment vector (Cartesian) tilted by `tilt` (rad) from
    the -z axis toward geographic longitude `phi0`.

    tilt = 0 reproduces the centered axial dipole (moment along -z, the
    b_vec_colat convention); Earth's real moment is tilted ~11.5 deg."""
    st, ct = jnp.sin(tilt), jnp.cos(tilt)
    return st * jnp.cos(phi0), st * jnp.sin(phi0), -ct


def b_vec_tilted(r, theta, phi, b0, tilt, phi0=0.0):
    """Tilted-dipole field (B_r, B_theta, B_phi) at geographic
    (r, theta, phi) -- the first non-axial field model (the reference
    only ever planned "realistic" field/medium upgrades, RayMain.jl:99).

    Exact point-dipole formula B = (b0/r^3)(3 (m.rhat) rhat - m) projected
    on the local spherical basis:
        B_r     =  2 (b0/r^3) (m . rhat)
        B_theta = -(b0/r^3) (m . thetahat)
        B_phi   = -(b0/r^3) (m . phihat)
    With tilt = 0 this reduces exactly to b_vec_colat. Breaks the
    meridional symmetry, so it is a 3D-frame-only medium (guarded in
    models/medium.py)."""
    mx, my, mz = moment_unit(tilt, phi0)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    m_r = mx * st * cp + my * st * sp + mz * ct
    m_t = mx * ct * cp + my * ct * sp - mz * st
    m_p = -mx * sp + my * cp
    k = b0 / (r * r * r)
    return 2.0 * k * m_r, -k * m_t, -k * m_p


def mlat_sin_tilted(theta, phi, tilt, phi0=0.0):
    """sin(magnetic latitude) in the tilted frame: sin(lat_m) = -(m . rhat).

    For tilt = 0 this is cos(theta) = sin(lat), matching the centered
    dipole. The density models are organized by MAGNETIC latitude (the
    plasmasphere rides the field), so this feeds ne_total in the tilted
    medium."""
    mx, my, mz = moment_unit(tilt, phi0)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return -(mx * st * jnp.cos(phi) + my * st * jnp.sin(phi) + mz * ct)


def dip_angle_lat(lat):
    """Dip angle between the horizontal and B, latitude form.

    Reference: RayTrace_lat.jl:47 (dip = atan(2 tan(lat)))."""
    return jnp.arctan(2.0 * jnp.tan(lat))


def dip_angle_colat(theta):
    """Dip angle, colatitude form. Reference: RayMain.jl:128 (atan(2 cot))."""
    return jnp.arctan(2.0 / jnp.tan(theta))


def l_shell(r, lat):
    """McIlwain L-shell of the dipole line through (r, lat), r in RE.

    Reference: RayTrace_lat.jl:69 (L = r / (re cos^2 lat))."""
    c = jnp.cos(lat)
    return r / (c * c)
