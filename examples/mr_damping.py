"""Why MR whistlers die: Landau damping along the multi-bounce path.

The companion to examples/magnetospheric_reflection.py, closing the
energy-budget question the reference's lineage poses (Bortnik's thesis,
RayTrace_3D.jl:5): a magnetospherically reflecting whistler survives
the mirrors but NOT the suprathermal electrons. After the first
reflection the wave normal stays highly oblique, k_par shortens, and
the Landau (m = 0) resonance velocity drops into the suprathermal
population -- so every post-MR traversal drains the wave. This script
drives the framework's fully oblique kinetic rate (`growth.gamma_oblique`:
cyclotron AND Landau resonances at the exact cold oblique root, derived
symbolically in tools/derive_growth_oblique.py) along a traced 39-
equator-crossing MR ray via `growth.path_gain(kinetics="oblique")`:

  1. cumulative amplitude gain [dB] vs group delay: -10 dB by T ~ 4.5 s
     and -14 dB (amplitude x0.2) over the 39-crossing bounce sequence --
     the classic result that unducted whistler energy is absorbed
     within seconds unless ducted;
  2. the local rate gamma with the wave-normal angle: the loss
     concentrates where |psi| rides near the resonance cone (the
     Landau-resonant segments), and the early hops lose a small
     fraction of the total (pinned in tests/test_mr.py);
  3. the meridional path colored by surviving amplitude.

Hot population: isotropic 1 keV suprathermals at n_h/n_e = 1e-3 (pure
damping: with A = 0 no cyclotron growth is possible, so everything
shown is loss). Writes examples/output/mr_damping.png. CPU ~2 min.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

FREQ = 700.0
LAUNCH = (2.5, 0.25, -0.6)      # r0 [RE], lat0 [rad], chi0 [rad]
HOT_ETA = 1.0e-3
HOT_TEV = 1.0e3


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import analysis, growth
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    os.makedirs(OUT, exist_ok=True)
    env = make_env_lat()
    r0, lat0, chi0 = LAUNCH
    u0 = np.array([[r0, lat0, chi0, 0.0]])
    print(f"tracing the MR ray ({FREQ:.0f} Hz from r={r0} RE) ...")
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray([FREQ]),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4, dt_max=1e6 / RE),
        spec=StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=60.0),
        max_steps=300000, save_every=50,
    )
    tu = np.asarray(res.traj["u"])[:, 0]
    alive = tu[:, 0] > 1.0005
    m = int(alive.sum())
    tu = tu[:m]

    hot = growth.HotElectrons(eta=HOT_ETA, t_par_ev=HOT_TEV, anisotropy=0.0)
    print("evaluating gamma_oblique along the path "
          f"({m} snapshots, cyclotron + Landau) ...")
    pg = growth.path_gain(tu, FREQ, env, hot, frame="2d_lat",
                          kinetics="oblique")
    gam = pg["gamma"]            # (S,) rad/s
    gdb = pg["gain_db"]          # cumulative dB
    T = pg["t"]

    # bounce structure: equator crossings of the path
    s = np.sign(tu[:, 1])
    s[s == 0] = 1
    crossings = np.nonzero(np.abs(np.diff(s)) > 1)[0]

    fig, axes = plt.subplots(1, 3, figsize=(16, 4.9))

    ax = axes[0]
    ax.plot(T, gdb, color="C3", lw=1.2)
    for c in crossings:
        ax.axvline(T[c], color="0.8", lw=0.5, zorder=0)
    for db, label in ((-10.0, "-10 dB"), (-30.0, "-30 dB")):
        if gdb.min() < db:
            i = int(np.argmax(gdb < db))
            ax.plot(T[i], gdb[i], "o", color="k", ms=4)
            ax.annotate(f" {label} at T={T[i]:.2f} s", (T[i], gdb[i]),
                        fontsize=8)
    ax.set_xlabel("group delay $T$ [s]")
    ax.set_ylabel("cumulative amplitude gain [dB]")
    ax.grid(alpha=0.3)
    ax.set_title(f"Landau absorption of an MR whistler\n"
                 f"(isotropic {HOT_TEV / 1e3:.0f} keV suprathermals, "
                 f"$n_h/n_e$ = {HOT_ETA:g}; gray: equator crossings)",
                 fontsize=10)

    ax = axes[1]
    from raytrace_tpu.ops import dispersion as D
    psi = np.degrees(np.asarray(D.psi_lat(tu[:, 1], tu[:, 2])))
    psi_w = (psi + 180.0) % 360.0 - 180.0
    ax.plot(T, gam, color="C0", lw=0.8, label="$\\gamma$ [rad/s]")
    ax.set_xlabel("group delay $T$ [s]")
    ax.set_ylabel("$\\gamma$ [rad/s]", color="C0")
    ax2 = ax.twinx()
    ax2.plot(T, np.abs(psi_w), color="0.6", lw=0.6,
             label="$|\\psi|$ [deg]")
    ax2.set_ylabel("$|\\psi|$ [deg]", color="0.4")
    ax.grid(alpha=0.3)
    ax.set_title("damping tracks obliquity: the loss concentrates\n"
                 "on the near-resonance-cone (Landau) segments",
                 fontsize=10)

    ax = axes[2]
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.85")
    amp = 10.0 ** (gdb / 20.0)
    sc = ax.scatter(tu[:, 0] * np.cos(tu[:, 1]),
                    tu[:, 0] * np.sin(tu[:, 1]),
                    c=np.maximum(gdb, -60.0), s=2.0, cmap="inferno")
    fig.colorbar(sc, ax=ax, label="cumulative gain [dB]")
    ax.set_aspect("equal")
    ax.set_xlabel("$r \\cos\\lambda$ [$R_E$]")
    ax.set_ylabel("$r \\sin\\lambda$ [$R_E$]")
    ax.set_title("where the wave dies along the bounce path", fontsize=10)

    fig.tight_layout()
    path = os.path.join(OUT, "mr_damping.png")
    fig.savefig(path, dpi=120)
    print(path)
    print(f"{len(crossings)} equator crossings; final gain {gdb[-1]:.1f} dB; "
          f"amplitude ratio {amp[-1]:.2e}")


if __name__ == "__main__":
    main()
