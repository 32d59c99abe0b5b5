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
from . import events


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
    B.rho vector geometry (RayTrace_3D.jl:136-141).

    Field-model-general: |B| comes from the vector field (b_vec -- valid
    for the tilted/IGRF models, where the dipole-only b_mag would raise)
    and the density is organized by the MAGNETIC latitude (mlat_3d), the
    same composition the 3D compute path itself uses (ops/dispersion.py
    mu_3d). dip is the dipole dip at magnetic latitude -- exact for
    "dipole"/"tilted", the degree-1 approximation for "igrf"."""

    def save_fn(u, f):
        r, theta, phi = u[0], u[1], u[2]
        rho = (u[3], u[4], u[5])
        psi = dispersion.psi_3d(r, theta, phi, *rho, env)
        mlat = medium.mlat_3d(r, theta, phi, env)
        ne = medium.ne_total_m3(r, mlat, env)
        br, bt, bp = medium.b_vec(r, theta, phi, env)
        b = jnp.sqrt(br * br + bt * bt + bp * bp)
        mu, dmudpsi = analytic.mu_and_dmudpsi(ne, b, f, psi)
        dip = dipole.dip_angle_lat(mlat)
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
        # MAX_STEPS = chunk budget exhausted, still integrable: the next
        # chunk's trace(carry0=...) resumes those rays
        status = np.asarray(carry.status)
        if not bool(np.isin(status, (events.ACTIVE, events.MAX_STEPS)).any()):
            break
    traj = {
        k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]
    }
    return result, traj


def resample_trajectory(rhs_fn, traj, f, t_query, u0=None):
    """Continuous-solution interface: evaluate a recorded trajectory at
    arbitrary phase-path points by cubic Hermite interpolation -- the
    dense `sol(t)` output a DifferentialEquations.jl user gets from the
    reference's solve (RayMain.jl:387 returns a continuous solution;
    its plots sample it). Endpoint derivatives are re-evaluated with the
    actual RHS at every snapshot, so the interpolant is genuine O(h^4)
    between snapshots, not a polyline.

    rhs_fn: the (u, f) -> du/dt used for the trace.
    traj:   dict from trace(..., save_every>0): "u" (S, B, n), "t" (S, B).
    f:      (B,) frequencies.
    t_query: (Q,) shared, or (B, Q) per-ray, phase-path points.

    u0: optional (B, n) initial states; snapshots start at attempted-step
    save_every, so pass u0 to make the interpolant cover [0, t_end] (the
    t = 0 anchor is prepended).

    Returns (B, Q, n). Queries outside a ray's recorded span clamp to its
    first/last snapshot (termination freezes t, so the landing state is
    what out-of-range queries return)."""
    import jax
    import numpy as np

    u_s = np.asarray(traj["u"])            # (S, B, n)
    t_s = np.asarray(traj["t"])            # (S, B)
    if u0 is not None:
        u_s = np.concatenate([np.asarray(u0)[None], u_s], axis=0)
        t_s = np.concatenate([np.zeros((1, t_s.shape[1]), t_s.dtype), t_s])
    S, B, n = u_s.shape
    f = np.asarray(f)
    k_s = np.asarray(
        jax.vmap(jax.vmap(rhs_fn, in_axes=(0, 0)), in_axes=(0, None))(
            u_s, f
        )
    )                                       # (S, B, n)

    t_query = np.asarray(t_query, t_s.dtype)
    if t_query.ndim == 1:
        t_query = np.broadcast_to(t_query, (B, t_query.size))
    out = np.empty((B, t_query.shape[1], n), u_s.dtype)
    for b in range(B):
        tb = t_s[:, b]
        # frozen-t tail after termination: keep the strictly increasing
        # prefix (+1 so the landing snapshot stays reachable). argmax, not
        # searchsorted: the boolean diff array need not be False..True
        # sorted (t can fail to advance over one mid-flight save interval
        # during an all-rejected stretch and then resume), and a binary
        # search over an unsorted array could truncate mid-flight.
        non_inc = tb[1:] - tb[:-1] <= 0.0
        last = int(np.argmax(non_inc)) + 1 if non_inc.any() else tb.size
        if last < 2:  # terminated before the first snapshot interval
            out[b] = u_s[0, b]
            continue
        tb = tb[:last]
        tq = np.clip(t_query[b], tb[0], tb[-1])
        j = np.clip(np.searchsorted(tb, tq, side="right") - 1, 0, last - 2)
        t0, t1 = tb[j], tb[j + 1]
        h = np.where(t1 > t0, t1 - t0, 1.0)
        s = np.clip((tq - t0) / h, 0.0, 1.0)[:, None]
        u0, u1 = u_s[j, b], u_s[j + 1, b]
        k0, k1 = k_s[j, b], k_s[j + 1, b]
        s2, s3 = s * s, s * s * s
        out[b] = (
            (2.0 * s3 - 3.0 * s2 + 1.0) * u0
            + ((s3 - 2.0 * s2 + s) * h[:, None]) * k0
            + (-2.0 * s3 + 3.0 * s2) * u1
            + ((s3 - s2) * h[:, None]) * k1
        )
    return out


def trajectory_xy(traj_u, frame="2d_lat"):
    """(x, y) in RE for plotting: x = r cos(lat), y = r sin(lat)
    (RayTrace_lat.jl:351-352); colatitude frame uses x = r sin(theta),
    y = r cos(theta) (RayMain.jl:400-401)."""
    r = traj_u[..., 0]
    a = traj_u[..., 1]
    if frame == "2d_lat":
        return r * jnp.cos(a), r * jnp.sin(a)
    return r * jnp.sin(a), r * jnp.cos(a)
