"""Rays crossing the dusk plume: the MLT-resolved 3D plasmasphere.

The reference's 3D script freezes MLT as a scalar even though the frame
carries longitude as a state (RayTrace_3D.jl:108-117 -- mlt enters only
the trough constant at :114), so its medium is axisymmetric and
d mu/d phi comes only from the field model. Here `make_env(ps_mlt=True)`
makes the traced density longitude-resolved: the plasmapause follows the
drift-derived last-closed-equipotential teardrop (convection.lppi_at_mlt,
smoothed to a low-order Fourier shape so autodiff and the fused chain
stay exact), and the trough level gets the day-night modulation of the
term the reference holds frozen.

This demo launches the same knee-crossing whistler fan in the dusk and
dawn meridians and against the axisymmetric control, showing:
  1. the equatorial density map with the dusk plume (the knee sits
     ~1.5-1.7x farther out at 18 MLT than at 6 MLT),
  2. the meridional paths: at dusk the fan still rides INSIDE the
     expanded plasmasphere where the axisymmetric control has already
     crossed the knee into the trough,
  3. azimuthal deflection from density alone: with a centered dipole and
     rho_phi(0) = 0 the control stays exactly in its meridian; the dusk
     and dawn meridians are the teardrop's SYMMETRY AXES (d mu/d phi = 0
     there by symmetry), so the flank meridians (15 / 21 MLT) carry the
     maximal longitudinal gradient and their rays deflect in opposite
     senses, toward the plume.

Writes examples/output/plume_crossing_3d.png. Runs anywhere (CPU ~2 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

LATS = (0.95, 1.0, 1.05, 1.1)   # launch magnetic latitudes, rad (knee fan)
FREQ = 1000.0                   # Hz


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
    from raytrace_tpu.models import medium as M
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    os.makedirs(OUT, exist_ok=True)
    env_mlt = M.make_env(b0=3.12e-5, ps_mlt=True)
    env_axi = M.make_env(b0=3.12e-5)
    # longitudes whose local time is 18 h (dusk) / 6 h (dawn)
    dusk = np.pi / 2 - float(env_mlt.ps_mlt_a0)
    dawn = -np.pi / 2 - float(env_mlt.ps_mlt_a0)

    r0 = (RE + 1.0e6) / RE
    cfg = SolverConfig(rtol=1e-7, atol=1e-11, dt0=1e-4, ds_max=2.0e6 / RE)
    spec = StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)

    def run_fan(env, phi0):
        rows = []
        for lat in LATS:
            th = np.pi / 2 - lat
            rho = consistent_rho_3d(r0, th, phi0, (1.0, 1.0, 0.0), FREQ, env)
            rows.append([r0, th, phi0, *map(float, rho), 0.0])
        res = trace(lambda u, ff: rhs.rhs_3d(u, ff, env),
                    jnp.asarray(np.asarray(rows)),
                    jnp.full(len(LATS), FREQ), cfg=cfg, spec=spec,
                    group_idx=6, max_steps=12288, save_every=16)
        return (np.asarray(res.traj["u"]), np.asarray(res.traj["t"]),
                np.asarray(res.u), np.asarray(res.status))

    # flank meridians: maximal d mu/d phi (dusk/dawn are symmetry axes)
    mlt15 = 15.0 * np.pi / 12.0 - np.pi - float(env_mlt.ps_mlt_a0)
    mlt21 = 21.0 * np.pi / 12.0 - np.pi - float(env_mlt.ps_mlt_a0)
    print("tracing dusk fan (MLT medium) ...")
    u_dusk, t_dusk, uf_dusk, st_dusk = run_fan(env_mlt, dusk)
    print("tracing dawn fan (MLT medium) ...")
    u_dawn, t_dawn, uf_dawn, st_dawn = run_fan(env_mlt, dawn)
    print("tracing flank fans (15 / 21 MLT) ...")
    u_f15, t_f15, _, st_f15 = run_fan(env_mlt, mlt15)
    u_f21, t_f21, _, st_f21 = run_fan(env_mlt, mlt21)
    print("tracing axisymmetric control ...")
    u_ctrl, t_ctrl, uf_ctrl, st_ctrl = run_fan(env_axi, dusk)
    for st in (st_dusk, st_dawn, st_f15, st_f21, st_ctrl):
        assert (st == events.HIT_EARTH).all(), st

    fig = plt.figure(figsize=(15.5, 4.8))

    # --- panel 1: equatorial density map (the teardrop plume) ---------
    ax = fig.add_subplot(1, 3, 1, projection="polar")
    rr = np.linspace(1.2, 7.0, 160)
    pp = np.linspace(-np.pi, np.pi, 241)
    Rg, Pg = np.meshgrid(rr, pp)
    ne = np.asarray(jax.vmap(jax.vmap(
        lambda r, p: M.ne_total_m3(r, 0.0, env_mlt, phi=p)))(
            jnp.asarray(Rg), jnp.asarray(Pg)))
    # plot against LOCAL TIME angle so dusk reads at the left (18 h)
    mlt_ang = Pg + float(env_mlt.ps_mlt_a0)
    pc = ax.pcolormesh(mlt_ang, Rg, np.log10(ne / 1e6), cmap="viridis",
                       shading="auto", rasterized=True)
    for ang, name in ((np.pi / 2, "18 MLT (dusk)"),
                      (-np.pi / 2, "6 MLT (dawn)")):
        ax.plot([ang, ang], [1.2, 7.0], "w--", lw=1.0)
        ax.text(ang, 7.3, name, color="k", ha="center", fontsize=8)
    ax.set_title("equatorial $n_e$: the dusk plume\n"
                 "(drift-derived knee, smooth Fourier shape)", fontsize=10)
    fig.colorbar(pc, ax=ax, pad=0.12,
                 label="$\\log_{10} n_e$ [cm$^{-3}$]")

    # --- panel 2: meridional paths, dusk vs control --------------------
    ax = fig.add_subplot(1, 3, 2)
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.85")
    for b in range(len(LATS)):
        x_d = u_dusk[:, b, 0] * np.sin(u_dusk[:, b, 1])
        y_d = u_dusk[:, b, 0] * np.cos(u_dusk[:, b, 1])
        x_c = u_ctrl[:, b, 0] * np.sin(u_ctrl[:, b, 1])
        y_c = u_ctrl[:, b, 0] * np.cos(u_ctrl[:, b, 1])
        ax.plot(x_c, y_c, color="0.5", lw=1.0,
                label="axisymmetric control" if b == 0 else None)
        ax.plot(x_d, y_d, color="C3", lw=1.3,
                label="dusk meridian (plume)" if b == 0 else None)
    ax.set_aspect("equal")
    ax.set_xlabel("$r \\sin\\theta$ [$R_E$]")
    ax.set_ylabel("$r \\cos\\theta$ [$R_E$]")
    lat_land_d = np.degrees(np.pi / 2 - uf_dusk[:, 1])
    lat_land_c = np.degrees(np.pi / 2 - uf_ctrl[:, 1])
    ax.set_title("same launch fan, dusk vs control\n"
                 f"landing shift {np.abs(lat_land_d - lat_land_c).max():.2f}"
                 "$^\\circ$ max", fontsize=10)
    ax.legend(fontsize=8, loc="lower left")

    # --- panel 3: azimuthal deflection from density alone --------------
    ax = fig.add_subplot(1, 3, 3)
    for b in range(len(LATS)):
        ax.plot(t_ctrl[:, b], np.zeros_like(t_ctrl[:, b]), color="0.5",
                lw=1.0, label="control ($d\\mu/d\\phi \\equiv 0$)"
                if b == 0 else None)
        ax.plot(t_dusk[:, b], u_dusk[:, b, 2] - dusk, color="0.2", lw=0.8,
                ls=":", label="18 MLT (symmetry axis)" if b == 0 else None)
        ax.plot(t_f15[:, b], u_f15[:, b, 2] - mlt15, color="C3", lw=1.2,
                label="15 MLT (dusk flank)" if b == 0 else None)
        ax.plot(t_f21[:, b], u_f21[:, b, 2] - mlt21, color="C0", lw=1.2,
                label="21 MLT (dusk flank)" if b == 0 else None)
    ax.set_xlabel("phase path [$R_E$]")
    ax.set_ylabel("$\\phi - \\phi_0$ [rad]")
    ax.grid(alpha=0.3)
    ax.set_title("azimuthal deflection, centered dipole:\n"
                 "density-only $d\\mu/d\\phi$ steers flank rays", fontsize=10)
    ax.legend(fontsize=8)

    fig.tight_layout()
    path = os.path.join(OUT, "plume_crossing_3d.png")
    fig.savefig(path, dpi=120)
    print(path)
    print("landing lat (deg): dusk", np.round(lat_land_d, 3),
          "control", np.round(lat_land_c, 3))


if __name__ == "__main__":
    main()
