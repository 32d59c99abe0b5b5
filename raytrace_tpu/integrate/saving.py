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


def make_save_fn_2d_colat(env: medium.EnvParams):
    """Colatitude-frame SavedValues channel (the RayMain config; the
    reference only built the callback for the lat script, but the saved
    quantities are frame-agnostic). dip/psi use the colat geometry
    (RayMain.jl:128-131)."""

    def save_fn(u, f):
        r, theta, chi = u[0], u[1], u[2]
        lat = jnp.pi / 2.0 - theta
        mu, dmudpsi = analytic.mu_dmudpsi_2d_lat(r, lat, chi, f, env)
        dip = dipole.dip_angle_colat(theta)
        psi = dispersion.psi_colat(theta, chi)
        return jnp.stack([mu, dmudpsi, dip, psi])

    return save_fn


def make_save_fn_3d(env: medium.EnvParams):
    """3D SavedValues channel -- the callback the reference left TODO
    (RayTrace_3D.jl:374-387): (mu, dmudpsi, dip, psi) with psi from the
    B.rho vector geometry (RayTrace_3D.jl:136-141)."""

    def save_fn(u, f):
        r, theta = u[0], u[1]
        rho = (u[3], u[4], u[5])
        lat = jnp.pi / 2.0 - theta
        psi = dispersion.psi_3d(r, theta, u[2], *rho, env)
        ne = medium.ne_total_m3(r, lat, env)
        b = medium.b_mag(r, lat, env)
        mu, dmudpsi = analytic.mu_and_dmudpsi(ne, b, f, psi)
        dip = dipole.dip_angle_colat(theta)
        return jnp.stack([mu, dmudpsi, dip, psi])

    return save_fn


def save_fn_for(frame: str, env: medium.EnvParams):
    """Diagnostics save_fn for a frame name ('2d_lat'|'2d_colat'|'3d')."""
    return {
        "2d_lat": make_save_fn_2d_lat,
        "2d_colat": make_save_fn_2d_colat,
        "3d": make_save_fn_3d,
    }[frame](env)


def stream_trajectory(
    rhs_fn,
    u0,
    f,
    *,
    cfg,
    spec,
    group_idx=3,
    adaptive=True,
    stepper="dopri5",
    chunk_steps=1024,
    n_chunks=32,
    save_every=16,
    save_fn=None,
):
    """Long-trajectory capture with bounded device memory (SURVEY.md 5.7).

    Device memory holds only ONE chunk of snapshots at a time
    (chunk_steps/save_every frames); each chunk is fetched to host and the
    integration resumes exactly from the chunk's RayCarry. This is the
    framework's answer to 'scaling the long axis' for trajectory output
    (the reference keeps everything in the REPL; tspans up to 5e10 at
    scratch.jl:390 would not fit a device trajectory buffer).

    Returns (final TraceResult, host dict of concatenated snapshots)."""
    import numpy as np

    from .solve import trace

    carry = None
    chunks = []
    result = None
    for _ in range(n_chunks):
        result = trace(
            rhs_fn, u0, f, cfg=cfg, spec=spec, group_idx=group_idx,
            adaptive=adaptive, stepper=stepper, max_steps=chunk_steps,
            save_every=save_every, save_fn=save_fn, carry0=carry,
        )
        carry = result.carry
        chunks.append({k: np.asarray(v) for k, v in result.traj.items()})
        if not bool((np.asarray(carry.status) == 0).any()):
            break
    traj = {
        k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]
    }
    return result, traj


def trajectory_xy(traj_u, frame="2d_lat"):
    """(x, y) in RE for plotting: x = r cos(lat), y = r sin(lat)
    (RayTrace_lat.jl:351-352); colatitude frame uses x = r sin(theta),
    y = r cos(theta) (RayMain.jl:400-401)."""
    r = traj_u[..., 0]
    a = traj_u[..., 1]
    if frame == "2d_lat":
        return r * jnp.cos(a), r * jnp.sin(a)
    return r * jnp.sin(a), r * jnp.cos(a)
