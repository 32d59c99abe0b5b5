"""Per-step diagnostics: the SavingCallback channel, TPU-shaped.

The reference records [mu, dmu/dpsi, dip, psi] at every accepted step via
a SavingCallback (RayTrace_lat.jl:318-327) and plots them afterwards
(RayTrace_lat.jl:357-378). Here the same quantities are computed by a pure
`save_fn(u, f)` passed to integrate.trace(..., save_every=k, save_fn=...),
which emits fixed-shape snapshots from the scan.
"""

import jax.numpy as jnp

from ..models import dipole, medium
from ..ops import analytic, dispersion


def make_save_fn_2d_lat(env: medium.EnvParams):
    """save_fn returning (mu, dmudpsi, dip, psi) like the reference's
    save_func (RayTrace_lat.jl:318-324); dmudpsi is the reference's
    closed form, matching what its SavedValues contain."""

    def save_fn(u, f):
        r, lat, chi = u[0], u[1], u[2]
        mu, dmudpsi = analytic.mu_dmudpsi_2d_lat(r, lat, chi, f, env)
        dip = dipole.dip_angle_lat(lat)
        psi = dispersion.psi_lat(lat, chi)
        return jnp.stack([mu, dmudpsi, dip, psi])

    return save_fn


def trajectory_xy(traj_u, frame="2d_lat"):
    """(x, y) in RE for plotting: x = r cos(lat), y = r sin(lat)
    (RayTrace_lat.jl:351-352); colatitude frame uses x = r sin(theta),
    y = r cos(theta) (RayMain.jl:400-401)."""
    r = traj_u[..., 0]
    a = traj_u[..., 1]
    if frame == "2d_lat":
        return r * jnp.cos(a), r * jnp.sin(a)
    return r * jnp.sin(a), r * jnp.cos(a)
