"""3D ray + SavedValues diagnostics in a TILTED dipole field.

The tilted moment breaks meridional symmetry, which is exactly what the
3D frame exists for (models/dipole.b_vec_tilted; the reference's 3D
script stays on the centered dipole, RayTrace_3D.jl:54-66, and left its
SavedValues channel TODO at :374-387). This demo traces a small fan of
3D rays launched at different longitudes through the tilted-field
medium -- the same geographic launch sees a different magnetic latitude
at each longitude, so the path families fan apart -- and records the
field-model-general diagnostics channel (|B| from the vector field,
density organized by magnetic latitude; integrate/saving.make_save_fn_3d).

Writes examples/output/tilted_3d_diagnostics.png. Runs anywhere
(CPU ~1 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

TILT = 0.2007          # Earth's ~11.5 degree moment tilt, rad
PHIS = (0.0, 1.0, 2.0, 3.0)  # launch longitudes, rad


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
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.integrate.saving import save_fn_for
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import rhs

    os.makedirs(OUT, exist_ok=True)
    env = make_env(b_model="tilted", b_tilt=TILT, b_tilt_phi=0.0)

    n = len(PHIS)
    u0 = np.zeros((n, 7))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = np.pi / 4          # geographic colatitude
    u0[:, 2] = PHIS
    u0[:, 3] = 1.0
    u0[:, 4] = 1.0
    f = np.full(n, 1000.0)

    res = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env),
        jnp.asarray(u0), jnp.asarray(f),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=2048, save_every=4,
        save_fn=save_fn_for("3d", env),
    )
    u = np.asarray(res.traj["u"])        # (S, B, 7)
    t = np.asarray(res.traj["t"])        # (S, B)
    e = np.asarray(res.traj["extras"])   # (S, B, 4): mu, dmudpsi, dip, psi

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.6))
    ax = axes[0]
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.8")
    for b, phi in enumerate(PHIS):
        # meridional projection (r, theta) of each longitude's ray
        x = u[:, b, 0] * np.sin(u[:, b, 1])
        y = u[:, b, 0] * np.cos(u[:, b, 1])
        ax.plot(x, y, label=f"$\\phi_0$ = {phi:.1f} rad")
    ax.set_aspect("equal")
    ax.set_xlabel("$r \\sin\\theta$ [$R_E$]")
    ax.set_ylabel("$r \\cos\\theta$ [$R_E$]")
    ax.set_title(f"tilted dipole ({np.degrees(TILT):.1f}$^\\circ$): "
                 "same launch, four longitudes")
    ax.legend(fontsize=8)

    for ax, col, name in ((axes[1], 0, "$\\mu$"), (axes[2], 3, "$\\psi$ [rad]")):
        for b, phi in enumerate(PHIS):
            ax.plot(t[:, b], e[:, b, col], label=f"$\\phi_0$ = {phi:.1f}")
        ax.set_xlabel("phase path [$R_E$]")
        ax.set_ylabel(name)
        ax.grid(alpha=0.3)
    axes[1].set_yscale("log")
    axes[1].set_title("refractive index along each ray")
    axes[2].set_title("wave-normal angle (vector-B geometry)")
    fig.tight_layout()
    path = os.path.join(OUT, "tilted_3d_diagnostics.png")
    fig.savefig(path, dpi=120)
    print(path)


if __name__ == "__main__":
    main()
