"""Visualization: ray paths, solver diagnostics, refractive-index surfaces,
environment maps (mirrors reference components C22-C25, SURVEY.md sec. 2).

Matplotlib on host after device->host transfer -- the TPU-side replacement
for the reference's Plots/plotly and CairoMakie layers (RayMain.jl:389-404,
RayTrace_lat.jl:340-416, RayTrace_3D.jl:421-586, plasmasphere.jl:120-233).
All functions return the matplotlib Figure; pass `path` to also save it.
"""

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..models import dipole, medium  # noqa: E402
from ..ops import dispersion  # noqa: E402


def _finish(fig, path):
    if path:
        fig.savefig(path, dpi=130, bbox_inches="tight")
        plt.close(fig)
    return fig


def _earth(ax):
    th = np.linspace(0, 2 * np.pi, 256)
    ax.plot(np.cos(th), np.sin(th), "k-", lw=1, label="Earth")


def _field_lines(ax, l_values=(1.5, 2, 3, 4, 5, 6)):
    """Dipole field lines r = L cos^2(lat) (scratch.jl:434-462)."""
    lat = np.linspace(-np.pi / 2, np.pi / 2, 301)
    for L in l_values:
        r = L * np.cos(lat) ** 2
        m = r >= 1.0
        ax.plot(r[m] * np.cos(lat[m]), r[m] * np.sin(lat[m]),
                color="0.75", lw=0.6, zorder=0)


def plot_ray_paths(traj_u, traj_status=None, frame="2d_lat", path=None,
                   title="whistler ray paths"):
    """Ray paths over the Earth disk + dipole field lines.

    traj_u: (S, B, n) snapshot stack or (S, n) single ray.
    Reference: RayMain.jl:403-404, RayTrace_lat.jl:354-355."""
    u = np.asarray(traj_u)
    if u.ndim == 2:
        u = u[:, None, :]
    r, a = u[..., 0], u[..., 1]
    if frame == "2d_lat":
        x, y = r * np.cos(a), r * np.sin(a)
    else:
        x, y = r * np.sin(a), r * np.cos(a)
    fig, ax = plt.subplots(figsize=(7, 7))
    _earth(ax)
    _field_lines(ax)
    for b in range(x.shape[1]):
        ax.plot(x[:, b], y[:, b], lw=0.9)
    ax.set_aspect("equal")
    ax.set_xlabel("x (RE)")
    ax.set_ylabel("y (RE)")
    ax.set_title(title)
    return _finish(fig, path)


def plot_diagnostics(traj_t, extras, path=None):
    """mu, dmu/dpsi, dip, psi and step size vs time -- the reference's
    saved-value plots (RayTrace_lat.jl:357-378)."""
    t = np.asarray(traj_t)
    e = np.asarray(extras)  # (S, 4) = mu, dmudpsi, dip, psi
    fig, axes = plt.subplots(5, 1, figsize=(7, 11), sharex=False)
    names = ["mu", "dmu/dpsi", "dip (deg)", "psi (deg)"]
    scale = [1.0, 1.0, 180 / np.pi, 180 / np.pi]
    for i, (name, sc) in enumerate(zip(names, scale)):
        axes[i].plot(t, e[:, i] * sc, lw=0.9)
        axes[i].set_ylabel(name)
    dt = np.diff(t)
    axes[4].plot(np.arange(len(dt)), dt, lw=0.9)
    axes[4].set_ylabel("dt (step size)")
    axes[4].set_xlabel("step number")
    axes[0].set_title("solver diagnostics")
    return _finish(fig, path)


def plot_refractive_surface(r, lat, f, env: medium.EnvParams, path=None,
                            n_psi=6284):
    """mu(psi) surface at fixed (r, lat, f), B-aligned and x-y frames.

    Reference: RayTrace_lat.jl:380-416 (psi sweep 0:0.001:2pi, the repo's
    only vectorized call -- here a trivial vmap)."""
    import jax
    import jax.numpy as jnp

    psi = np.linspace(0.0, 2 * np.pi, n_psi)
    dip = float(dipole.dip_angle_lat(lat))
    chi = -psi + 3 * np.pi / 2 - dip  # RayTrace_lat.jl:391
    mu = np.asarray(
        jax.vmap(lambda c: dispersion.mu_2d_lat(r, lat, c, f, env))(
            jnp.asarray(chi)
        )
    )
    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    axes[0].plot(mu * np.sin(psi), mu * np.cos(psi), lw=0.8)
    axes[0].set_title("mu surface (B-aligned frame)")
    axes[1].plot(mu * np.sin(chi - (np.pi / 2 - lat)),
                 mu * np.cos(chi - (np.pi / 2 - lat)), lw=0.8)
    axes[1].set_title("mu surface (x-y frame)")
    for ax in axes:
        ax.set_aspect("equal")
    return _finish(fig, path)


def plot_environment(env: medium.EnvParams, path=None, extent=4.0, n=400):
    """log10 n_e(x, y) heatmap with L-shell contours + Earth disk.

    Reference: RayTrace_3D.jl:544-586, plasmasphere.jl:157-206."""
    import jax
    import jax.numpy as jnp

    x = np.linspace(-extent, extent, n)
    y = np.linspace(-extent, extent, n)
    X, Y = np.meshgrid(x, y)
    r = np.sqrt(X**2 + Y**2)
    lat = np.arctan2(Y, X)
    ne = np.asarray(
        jax.vmap(lambda rr, ll: medium.ne_total_m3(rr, ll, env))(
            jnp.asarray(r.ravel()), jnp.asarray(lat.ravel())
        )
    ).reshape(r.shape)
    ne = np.where(r >= 1.0, ne, np.nan)
    fig, axes = plt.subplots(1, 2, figsize=(13, 6))
    im = axes[0].imshow(
        np.log10(ne * 1e-6), origin="lower", extent=[-extent, extent] * 2,
        cmap="magma", vmin=-1, vmax=5,
    )
    fig.colorbar(im, ax=axes[0], label="log10 n_e (cm^-3)")
    L = np.where(np.abs(np.cos(lat)) > 1e-6, r / np.cos(lat) ** 2, np.inf)
    axes[0].contour(X, Y, L, levels=np.arange(1, 6.5, 0.5),
                    colors="w", linewidths=0.4)
    axes[0].add_patch(plt.Circle((0, 0), 1.0, color="k"))
    axes[0].set_title("electron density + L-shells")

    b = np.asarray(
        jax.vmap(lambda rr, ll: medium.b_mag(rr, ll, env))(
            jnp.asarray(r.ravel()), jnp.asarray(lat.ravel())
        )
    ).reshape(r.shape)
    b = np.where(r >= 1.0, b, np.nan)
    im2 = axes[1].imshow(
        np.log10(b), origin="lower", extent=[-extent, extent] * 2,
        cmap="viridis",
    )
    fig.colorbar(im2, ax=axes[1], label="log10 |B| (T)")
    axes[1].add_patch(plt.Circle((0, 0), 1.0, color="k"))
    axes[1].set_title("dipole field magnitude")
    # day/night terminator: nightside semicircle overlay
    # (plasmasphere.jl:208-233)
    th = np.linspace(np.pi / 2, 3 * np.pi / 2, 100)
    for ax in axes:
        ax.fill(
            np.concatenate([0.95 * np.cos(th), [0.0]]),
            np.concatenate([0.95 * np.sin(th), [0.0]]),
            color="w", alpha=0.9, zorder=3,
        )
    for ax in axes:
        ax.set_aspect("equal")
        ax.set_xlabel("x (RE)")
    return _finish(fig, path)


def plot_density_profile(env: medium.EnvParams, path=None):
    """Equatorial n_e(L) component profiles (plasmasphere.jl:134-155)."""
    import jax
    import jax.numpy as jnp

    from ..models import ionosphere, plasmasphere

    r = np.linspace(1.0, 7.0, 2000)
    L = r  # equatorial: L = r
    ne_i = np.asarray(ionosphere.ne_iono_cm3(
        jnp.asarray(r), env.iono_n0, env.iono_decay, env.iono_r0))
    ne_p = np.asarray(plasmasphere.ne_plasma_cm3(
        jnp.asarray(L), env.lppi, env.lppo, env.ne_lppi, env.ps_season,
        env.ps_trough))
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.semilogy(L, ne_i, label="ionosphere")
    ax.semilogy(L, ne_p, label="plasmasphere (CA1992)")
    ax.semilogy(L, ne_i + ne_p, label="total")
    ax.axvline(env.lppi, color="0.6", ls="--", lw=0.8, label="Lppi")
    ax.axvline(env.lppo, color="0.4", ls="--", lw=0.8, label="Lppo")
    ax.set_ylim(1e-1, 1e6)
    ax.set_xlabel("L (RE)")
    ax.set_ylabel("n_e (cm^-3)")
    ax.legend()
    ax.set_title("equatorial density profile")
    return _finish(fig, path)
