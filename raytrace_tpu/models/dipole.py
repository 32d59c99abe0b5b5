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


def mlon_tilted(theta, phi, tilt, phi0=0.0):
    """Magnetic longitude at geographic (theta, phi) in the tilted frame.

    Convention: the magnetic frame is the geodesic rotation carrying the
    geographic pole z-hat onto the magnetic north axis z_m = -moment_unit
    (Rz(phi0) Ry(-tilt) Rz(-phi0) under the active convention
    Ry(t) z-hat = (sin t, 0, cos t) -- it moves points the shortest way);
    phi_m = atan2(y_m . rhat, x_m . rhat) with x_m = R x-hat,
    y_m = R y-hat. tilt = 0 reduces phi_m to phi up to rounding (~1 ulp:
    the value still passes through atan2 of the rotated components); the
    truly bitwise tilt->0 reduction lives in medium.mlon_3d, whose
    b_model="dipole" branch returns phi itself.

    The value is 2 pi-discontinuous across the atan2 cut, but every
    consumer (medium.mlt_ps_params) reads it only through sin/cos of
    ang = a0 + phi_m, which are smooth and periodic; gradients are
    regular everywhere except the magnetic poles themselves (a
    measure-zero axis no traced ray occupies)."""
    s, c = jnp.sin(tilt), jnp.cos(tilt)
    s0, c0 = jnp.sin(phi0), jnp.cos(phi0)
    # R x-hat and R y-hat, closed form of Rz(phi0) Ry(-tilt) Rz(-phi0)
    xm = (c * c0 * c0 + s0 * s0, (c - 1.0) * s0 * c0, s * c0)
    ym = ((c - 1.0) * s0 * c0, c * s0 * s0 + c0 * c0, s * s0)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    rx = st * jnp.cos(phi)
    ry = st * jnp.sin(phi)
    rz = ct
    return jnp.arctan2(
        ym[0] * rx + ym[1] * ry + ym[2] * rz,
        xm[0] * rx + xm[1] * ry + xm[2] * rz,
    )


# ---------------------------------------------------------------------------
# IGRF-truncation internal field (degrees 1-3)
#
# The next rung past the tilted dipole on the "realistic field" ladder the
# reference only planned (RayMain.jl:99): the internal geomagnetic field as
# a degree-3 spherical-harmonic truncation of IGRF. Schmidt
# quasi-normalized coefficients, IGRF-13 epoch 2020.0, in nT, ordered
# (g10, g11, h11, g20, g21, h21, g22, h22,
#  g30, g31, h31, g32, h32, g33, h33).
# Degree 1 alone is the tilted centered dipole; degrees 2-3 add the
# quadrupole/octupole asymmetries (South Atlantic anomaly scale structure).

IGRF13_2020 = (
    -29404.8, -1450.9, 4652.5,
    -2499.6, 2982.0, -2991.6, 1677.0, -734.6,
    1363.2, -2381.2, -82.1, 1236.2, 241.9, 525.7, -543.4,
)


def igrf_dipole(coeffs):
    """(b0 [T], tilt [rad], phi0 [rad]) of the degree-1 (centered-dipole)
    part of an IGRF coefficient set -- organizes the density models.

    The moment direction follows moment_unit's convention (tilt from -z
    toward longitude phi0): for a purely axial negative g10 (Earth-like)
    tilt = 0."""
    import numpy as np

    g10, g11, h11 = (float(c) for c in coeffs[:3])
    b0 = np.sqrt(g10 * g10 + g11 * g11 + h11 * h11) * 1.0e-9
    # matching Br: b0 * m_hat = 1e-9 * (g11, h11, g10); moment_unit has
    # m_z = -cos(tilt), m_x = sin(tilt) cos(phi0), m_y = sin(tilt) sin(phi0)
    tilt = np.arccos(np.clip(-g10 * 1.0e-9 / b0, -1.0, 1.0))
    phi0 = np.arctan2(h11, g11)
    return b0, tilt, phi0


def b_vec_igrf(r, theta, phi, coeffs):
    """(B_r, B_theta, B_phi) in T of the degree-3 IGRF truncation at
    geographic (r [RE], theta colat, phi) -- B = -grad V with
    V = a sum_n (a/r)^(n+1) sum_m (g cos m phi + h sin m phi) P_nm.

    Closed-form Schmidt quasi-normalized P_nm for n <= 3 (no recursion:
    a static 15-term sum XLA fuses into the RHS). Validated against
    -autodiff(V) and the axial/tilted dipole limits in
    tests/test_igrf.py."""
    (g10, g11, h11, g20, g21, h21, g22, h22,
     g30, g31, h31, g32, h32, g33, h33) = coeffs
    s, c = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    s2p = 2.0 * sp * cp               # sin 2phi
    c2p = cp * cp - sp * sp           # cos 2phi
    s3p = s2p * cp + c2p * sp         # sin 3phi
    c3p = c2p * cp - s2p * sp         # cos 3phi

    rt3, rt6, rt15, rt10 = 1.7320508075688772, 2.449489742783178, \
        3.872983346207417, 3.1622776601683795

    # Schmidt P_nm and d P_nm / d theta
    p10, d10 = c, -s
    p11, d11 = s, c
    p20, d20 = 1.5 * c * c - 0.5, -3.0 * s * c
    p21, d21 = rt3 * s * c, rt3 * (c * c - s * s)
    p22, d22 = 0.5 * rt3 * s * s, rt3 * s * c
    p30, d30 = 2.5 * c * c * c - 1.5 * c, -1.5 * s * (5.0 * c * c - 1.0)
    p31 = 0.25 * rt6 * s * (5.0 * c * c - 1.0)
    d31 = 0.25 * rt6 * (c * (5.0 * c * c - 1.0) - 10.0 * c * s * s)
    p32, d32 = 0.5 * rt15 * s * s * c, 0.5 * rt15 * (2.0 * s * c * c - s ** 3)
    p33, d33 = 0.25 * rt10 * s ** 3, 0.75 * rt10 * s * s * c

    inv_r = 1.0 / r
    f1 = inv_r * inv_r * inv_r        # (a/r)^(n+2) with a = 1 RE
    f2 = f1 * inv_r
    f3 = f2 * inv_r

    # per-degree azimuthal sums of (g cos + h sin) P / dP, and the
    # phi-derivative sums m (g sin - h cos) P
    t1 = g10 * p10 + (g11 * cp + h11 * sp) * p11
    dt1 = g10 * d10 + (g11 * cp + h11 * sp) * d11
    pt1 = (g11 * sp - h11 * cp) * p11
    t2 = g20 * p20 + (g21 * cp + h21 * sp) * p21 + (g22 * c2p + h22 * s2p) * p22
    dt2 = g20 * d20 + (g21 * cp + h21 * sp) * d21 + (g22 * c2p + h22 * s2p) * d22
    pt2 = (g21 * sp - h21 * cp) * p21 + 2.0 * (g22 * s2p - h22 * c2p) * p22
    t3 = (g30 * p30 + (g31 * cp + h31 * sp) * p31
          + (g32 * c2p + h32 * s2p) * p32 + (g33 * c3p + h33 * s3p) * p33)
    dt3 = (g30 * d30 + (g31 * cp + h31 * sp) * d31
           + (g32 * c2p + h32 * s2p) * d32 + (g33 * c3p + h33 * s3p) * d33)
    pt3 = ((g31 * sp - h31 * cp) * p31 + 2.0 * (g32 * s2p - h32 * c2p) * p32
           + 3.0 * (g33 * s3p - h33 * c3p) * p33)

    nt = 1.0e-9
    br = nt * (2.0 * f1 * t1 + 3.0 * f2 * t2 + 4.0 * f3 * t3)
    btheta = -nt * (f1 * dt1 + f2 * dt2 + f3 * dt3)
    bphi = nt / jnp.maximum(s, 1.0e-12) * (f1 * pt1 + f2 * pt2 + f3 * pt3)
    return br, btheta, bphi


def igrf_potential(r, theta, phi, coeffs):
    """Scalar potential V (T * RE) whose -gradient is b_vec_igrf -- the
    autodiff oracle for the closed forms above (tests only)."""
    (g10, g11, h11, g20, g21, h21, g22, h22,
     g30, g31, h31, g32, h32, g33, h33) = coeffs
    s, c = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    rt3, rt6, rt15, rt10 = 1.7320508075688772, 2.449489742783178, \
        3.872983346207417, 3.1622776601683795
    p10, p11 = c, s
    p20, p21, p22 = 1.5 * c * c - 0.5, rt3 * s * c, 0.5 * rt3 * s * s
    p30 = 2.5 * c ** 3 - 1.5 * c
    p31 = 0.25 * rt6 * s * (5.0 * c * c - 1.0)
    p32 = 0.5 * rt15 * s * s * c
    p33 = 0.25 * rt10 * s ** 3
    c2p, s2p = jnp.cos(2 * phi), jnp.sin(2 * phi)
    c3p, s3p = jnp.cos(3 * phi), jnp.sin(3 * phi)
    t1 = g10 * p10 + (g11 * cp + h11 * sp) * p11
    t2 = (g20 * p20 + (g21 * cp + h21 * sp) * p21
          + (g22 * c2p + h22 * s2p) * p22)
    t3 = (g30 * p30 + (g31 * cp + h31 * sp) * p31
          + (g32 * c2p + h32 * s2p) * p32 + (g33 * c3p + h33 * s3p) * p33)
    inv_r = 1.0 / r
    return 1.0e-9 * (
        inv_r * inv_r * t1 + inv_r ** 3 * t2 + inv_r ** 4 * t3
    )


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
