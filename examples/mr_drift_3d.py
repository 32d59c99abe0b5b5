"""Magnetospheric reflection in 3D: bouncing whistlers drift across MLT.

The 2D picture (examples/magnetospheric_reflection.py) shows WHY
unducted whistlers below the lower-hybrid resonance mirror instead of
precipitating (Kimura 1966; the Bortnik thesis the reference's 3D
script cites at RayTrace_3D.jl:5). This example shows what only the
7-state frame can: the bounce path is not closed. Each mirror leg
samples the MLT-resolved plasmasphere's longitude gradient
(d mu/d phi != 0 through the density alone), so the ray DRIFTS in
magnetic local time while it bounces -- wave energy injected at one
local time is delivered at another, and the delivery point depends on
where in the teardrop the ray was born.

Everything is the production stack: `mr_fan_3d`-class launches
(low-altitude, near-radial wave normals, ~1 kHz), the MLT-resolved
CA1992 medium (`ps_mlt=True` -- the derived-LCE Fourier teardrop +
day/night trough), `consistent_rho_3d` on-shell launch, and the same
f = f_LHR mirror surface (`analysis.f_lhr`, the S = 0 root of the
traced Stix coefficients) the tests pin against the C++ oracle
(tests/test_mr3d.py). The figure:

  1. meridional projection of the SAME (lat0, chi, f) launch cell at
     three local times: in the nightside MR band it bounces 4 times,
     near noon it is marginal (2 bounces), and in the dusk plume the
     band is CLOSED and the ray lands directly -- the MR band itself
     moves with MLT;
  2. the equatorial drift view: the same rays seen from above the
     north pole, longitude drift laid over the plasmapause teardrop
     (lppi(phi) / lppo(phi) from medium.mlt_ps_params);
  3. the mechanism trace for the night ray: f_LHR/f along the path vs
     group delay, latitude reversals marked -- mirrors happen where
     the surface closes (f_LHR/f >= 1).

Writes examples/output/mr_drift_3d.png. CPU ~2 min (three single-ray
traces with trajectory channels).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

# the exemplar MR cell from tests/test_mr3d.py, repeated at three local
# times (phi is magnetic longitude = geographic for the centered
# dipole; MLT = 12 + 12 (ps_mlt_a0 + phi)/pi, the convention
# plume_crossing_3d.py and convection.py pin: dusk 18 h at
# ang = +pi/2). Longitudes chosen from a measured 17-point phi sweep
# of this cell: the MR band is open around midnight (4 bounces),
# marginal just past noon (2 bounces), and CLOSED inside the dusk
# plume bulge (direct landing) -- the band itself moves with local
# time, which is the point of the figure.
R0_ALT_M = 1.0e6
LAT0, CHI0, F0 = 1.10, 0.0, 1000.0
PHIS = (-0.39, -2.09, 2.75)
LABELS = ("MLT 0.5 (midnight: in the MR band)",
          "MLT 18.0 (dusk plume: band closed)",
          "MLT 12.5 (noon: marginal)")
COLORS = ("#1f77b4", "#d62728", "#2ca02c")


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import analysis
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import medium as M
    from raytrace_tpu.ops import dispersion as D
    from raytrace_tpu.ops import rhs as RHS

    os.makedirs(OUT, exist_ok=True)
    env = M.make_env(b0=3.12e-5, ps_mlt=True)
    r0 = (RE + R0_ALT_M) / RE

    def launch(phi):
        th0 = np.pi / 2 - LAT0
        khat = (np.cos(CHI0), np.sin(CHI0), 0.0)
        rho0 = D.consistent_rho_3d(r0, th0, phi, khat, F0, env)
        return np.array([r0, th0, phi, *map(float, rho0), 0.0])

    u0 = jnp.asarray([launch(p) for p in PHIS])
    f = jnp.full((len(PHIS),), F0)
    print(f"tracing {len(PHIS)} MR rays (f = {F0:.0f} Hz, "
          f"lat0 = {np.degrees(LAT0):.0f} deg) ...")
    res = trace(
        lambda u, ff: RHS.rhs_3d(u, ff, env),
        u0, f,
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4, dt_max=1e6 / RE),
        spec=StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=10.0,
                      lat_sign=-1.0, lat_offset=np.pi / 2),
        max_steps=300000, save_every=20, group_idx=6,
    )
    tu = np.asarray(res.traj["u"])          # (rows, rays, 7)

    fig, axes = plt.subplots(1, 3, figsize=(16.5, 5.2))

    # --- 1. meridional projection + the exemplar's LHR mirror surface ---
    ax = axes[0]
    lat_g = np.linspace(-1.2, 1.2, 241)
    r_g = np.linspace(1.0, 4.0, 241)
    Rg, Lg = np.meshgrid(r_g, lat_g)
    # the mirror surface is itself MLT-dependent: draw it in the
    # midnight sector (where the shown bounces happen) and in the dusk
    # plume sector -- the surface moves with local time
    for ph, ls, lab in ((PHIS[0], "--", "midnight"), (PHIS[1], ":", "dusk")):
        fl = analysis.f_lhr(Rg.ravel(), Lg.ravel(), env,
                            phi=np.full(Rg.size, ph)).reshape(Rg.shape)
        ax.contour(Rg * np.cos(Lg), Rg * np.sin(Lg), fl, levels=[F0],
                   colors="k", linewidths=1.0, linestyles=ls)
        ax.plot([], [], "k" + ls, lw=1.0,
                label=f"f_LHR = {F0:.0f} Hz ({lab})")
    for i, (lab, col) in enumerate(zip(LABELS, COLORS)):
        u = tu[:, i]
        u = u[u[:, 0] > 1.0005]
        lat = np.pi / 2 - u[:, 1]
        ax.plot(u[:, 0] * np.cos(lat), u[:, 0] * np.sin(lat),
                color=col, lw=0.9, label=lab)
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.85", zorder=3)
    ax.plot(np.cos(th), np.sin(th), color="0.4", lw=0.8, zorder=4)
    ax.set_xlabel("r cos(lat) [RE]")
    ax.set_ylabel("r sin(lat) [RE]")
    ax.set_title("meridional bounce paths\n(same launch cell, three "
                 "local times)")
    ax.set_aspect("equal")
    ax.legend(loc="lower right", fontsize=8)

    # --- 2. polar drift view over the plasmapause teardrop ---
    ax = axes[1]
    phis = np.linspace(-np.pi, np.pi, 361)
    pp = np.array([M.mlt_ps_params(p, env)[:2] for p in phis])
    for bound, ls, lab in ((pp[:, 0], "-", "lppi(phi)"),
                           (pp[:, 1], ":", "lppo(phi)")):
        ax.plot(bound * np.cos(phis), bound * np.sin(phis), "0.5",
                ls=ls, lw=1.2, label=lab)
    for i, (lab, col) in enumerate(zip(LABELS, COLORS)):
        u = tu[:, i]
        u = u[u[:, 0] > 1.0005]
        lat = np.pi / 2 - u[:, 1]
        req = u[:, 0] * np.cos(lat)          # cylindrical radius
        ax.plot(req * np.cos(u[:, 2]), req * np.sin(u[:, 2]),
                color=col, lw=0.9)
        ax.plot(req[0] * np.cos(u[0, 2]), req[0] * np.sin(u[0, 2]),
                "o", color=col, ms=5)
        ax.plot(req[-1] * np.cos(u[-1, 2]), req[-1] * np.sin(u[-1, 2]),
                "x", color=col, ms=7, mew=2)
        dphi = u[-1, 2] - u[0, 2]
        print(f"  {lab}: drift {np.degrees(dphi):+.1f} deg of longitude, "
              f"final status {int(np.asarray(res.status)[i])}")
    ax.fill(np.cos(th), np.sin(th), color="0.85", zorder=3)
    # noon direction: ang = a0 + phi = 0
    a0 = float(env.ps_mlt_a0)
    ax.annotate("noon", xy=(3.6 * np.cos(-a0), 3.6 * np.sin(-a0)),
                fontsize=8, color="0.3", ha="center")
    ax.set_xlabel("x [RE]")
    ax.set_ylabel("y [RE]")
    ax.set_title("drift across local time\n(o = launch, x = landing; "
                 "grey: plasmapause teardrop)")
    ax.set_aspect("equal")
    ax.legend(loc="lower left", fontsize=8)

    # --- 3. the mechanism: f_LHR/f along the in-band (midnight) ray,
    # evaluated in the ray's OWN local-time sector ---
    ax = axes[2]
    i = 0
    u = tu[:, i]
    u = u[u[:, 0] > 1.0005]
    lat = np.pi / 2 - u[:, 1]
    arr = np.stack([u[:, 0], lat, u[:, 2], u[:, 6]], axis=1)
    n_rev, idx = analysis.count_lat_reversals(arr, r_min=1.3)
    fl_path = analysis.f_lhr(u[:, 0], lat, env, phi=u[:, 2])
    T = u[:, 6]                              # group delay [s] (state units)
    ax.plot(T, fl_path / F0, color=COLORS[i], lw=1.0)
    ax.axhline(1.0, color="k", lw=0.8, ls="--")
    for j in idx:
        ax.axvline(T[j], color="0.7", lw=0.7)
    ax.set_xlabel("group delay [s]")
    ax.set_ylabel("f_LHR / f along the ray")
    ax.set_title(f"midnight ray: {n_rev} latitude reversals\n(mirrors "
                 "where the surface closes, f_LHR/f > 1)")
    print(f"  midnight ray: {n_rev} bounces over {T[-1]:.2f} s group delay")

    fig.suptitle(
        "3D magnetospheric reflection over the MLT-resolved plasmasphere "
        "(mr_fan_3d physics; tests/test_mr3d.py)", y=1.02)
    fig.tight_layout()
    path = os.path.join(OUT, "mr_drift_3d.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
