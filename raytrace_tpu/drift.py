"""Bounce-averaged azimuthal drift and MLT drift-averaging.

The third adiabatic timescale, completing the gyro < bounce < drift
hierarchy the diffusion tier is built on: trapped electrons
gradient-curvature drift eastward around Earth, sampling every MLT
sector's wave population once per drift period -- so on timescales
longer than T_drift (minutes-hours, far shorter than the diffusion
times fokker_planck evolves) the effective diffusion tensor is the
drift-orbit average of the per-sector bounce-averaged tensors. This
module supplies both halves: the drift rate itself, derived from
guiding-center theory on the framework's own dipole (no empirical fit
constants -- the classic Hamlin-style pitch-angle factor comes OUT of
the bounce average here, it is not quoted), and the weighted average
that combines per-MLT-sector diffusion maps.

Physics (derivation): in a curl-free field the gradient and curvature
drifts combine into

    v_d = (gamma m / (q B^3)) (v_par^2 + v_perp^2 / 2) (B x grad B).

For the centered dipole B = (B0/r^3) sqrt(1+3 s^2) (s = sin lambda,
c = cos lambda; r in RE), with unit field direction
b = (-2s, c)/sqrt(1+3s^2) and grad B = (-3B/r, 3 B s c / (r(1+3s^2)))
in (r^hat, lambda^hat), the azimuthal component of b x grad B is

    (b x grad B)_phi = 3 B c (1 + s^2) / (r (1+3s^2)^{3/2}),

so the angular drift rate at latitude lambda (azimuthal radius r c --
its c cancels the one in (b x grad B)_phi) is

    dphi/dt = 3 gamma m v^2 (cos^2 a + sin^2 a / 2) (1 + s^2)
              / (q B r^2 (1+3s^2)^{3/2}),

and the bounce average uses the same dt = ds/(v |cos a|) weighting as
diffusion.bounce_averaged. The equatorial limit reproduces the textbook
closed form Omega_d = 3 gamma m v^2 L / (2 q B0 RE^2) exactly, and a
relativistic Boris push through the full 3D dipole (no guiding-center
approximation) confirms the bounce-averaged rate to a few percent
(tests/test_drift.py).

Sign convention: rates are returned as positive magnitudes; electrons
(q < 0) drift EASTWARD (with corotation), ions westward.

Like radial.py, the grids here are ~10^2 points and host-trivial; the
value is the coupling to the framework's own bounce-average chain.
"""

import math

import numpy as np

from .constants import C_LIGHT, M_E, Q_E, RE, B0_3D
from .diffusion import kinematics, mirror_latitude


def drift_rate(e_kev, alpha_eq_rad, l_shell, b0=B0_3D, n_lat=96,
               n_bisect=60):
    """Bounce-averaged drift angular frequency <dphi/dt> [rad/s].

    e_kev / alpha_eq_rad broadcast together; l_shell and b0 are scalars
    (one field line family). Returns a dict:
      omega_d     -- <dphi/dt> magnitude [rad/s]
      t_drift_s   -- full drift period 2 pi / omega_d [s]
      mirror_lat_rad

    The integrand is the guiding-center rate derived in the module
    docstring; the mirror-point 1/cos a singularity is integrable and
    handled by the lam = lam_m sin(x) substitution, exactly as in
    diffusion.bounce_averaged."""
    e_kev, alpha_eq = np.broadcast_arrays(
        np.asarray(e_kev, np.float64),
        np.asarray(alpha_eq_rad, np.float64))
    gamma, v, _ = kinematics(e_kev)
    lam_m = mirror_latitude(alpha_eq, n_bisect=n_bisect)

    x = (np.arange(n_lat) + 0.5) * (0.5 * math.pi / n_lat)
    lam = lam_m[..., None] * np.sin(x)
    dlam = lam_m[..., None] * np.cos(x) * (0.5 * math.pi / n_lat)

    s, c = np.sin(lam), np.cos(lam)
    one3s2 = 1.0 + 3.0 * s * s
    b_ratio = np.sqrt(one3s2) / c**6                  # B / B_eq
    s2a = np.clip(np.sin(alpha_eq[..., None]) ** 2 * b_ratio, 0.0, 1.0)
    cosa = np.sqrt(np.clip(1.0 - s2a, 0.0, None))

    L = float(l_shell)
    r_re = L * c * c                                  # radius [RE]
    b_t = (float(b0) / r_re**3) * np.sqrt(one3s2)     # |B| [T]
    r_m = r_re * RE

    # dphi/dt at latitude: v_phi / (r c) -- the c in (b x grad B)_phi
    # cancels the azimuthal-radius c exactly; v_par^2 + v_perp^2/2 =
    # v^2 (1 - s2a/2) since sin^2 a = s2a
    pitch_fac = 1.0 - 0.5 * s2a
    rate = (3.0 * gamma[..., None] * M_E * v[..., None] ** 2 * pitch_fac
            * (1.0 + s * s)
            / (Q_E * b_t * r_m * r_m * one3s2 ** 1.5))

    # bounce-average weights dt = ds / (v |cos a|); v constant cancels
    jarc = L * c * np.sqrt(one3s2) * RE
    wline = jarc * dlam / np.maximum(cosa, 1.0e-12)
    omega = (rate * wline).sum(axis=-1) / wline.sum(axis=-1)

    return {
        "omega_d": omega,
        "t_drift_s": 2.0 * math.pi / np.maximum(omega, 1.0e-300),
        "mirror_lat_rad": lam_m,
    }


def drift_average(sector_maps, weights=None):
    """Drift-orbit average of per-MLT-sector bounce-averaged tensors.

    sector_maps: sequence of dicts as returned by
    diffusion.bounce_averaged / bounce_averaged_jax (any common numeric
    keys are averaged; daa/dap/dpp is the intended use). weights:
    occupancy fraction of each sector along the drift orbit -- for the
    centered dipole the drift rate is azimuthally uniform, so the
    occupancy IS the sector's MLT width / 24 h (the default: equal
    weights). Weights are normalized here.

    Valid on timescales >> T_drift (drift phase mixing), which holds by
    orders of magnitude against the diffusion times fokker_planck
    evolves -- T_drift is minutes-hours, lifetimes are days."""
    if not sector_maps:
        raise ValueError("sector_maps must be non-empty")
    if weights is None:
        w = np.full(len(sector_maps), 1.0 / len(sector_maps))
    else:
        w = np.asarray(weights, np.float64)
        if w.shape[0] != len(sector_maps) or (w < 0.0).any():
            raise ValueError("weights must be >= 0, one per sector")
        w = w / w.sum()
    keys = set(sector_maps[0])
    for m in sector_maps[1:]:
        keys &= set(m)
    out = {}
    for k in sorted(keys):
        try:
            out[k] = sum(wi * np.asarray(m[k], np.float64)
                         for wi, m in zip(w, sector_maps))
        except TypeError:
            continue    # non-numeric entry
    return out
