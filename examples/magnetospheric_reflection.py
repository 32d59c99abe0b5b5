"""Magnetospheric reflection: unducted whistlers mirroring at the LHR.

The defining behavior of NON-ducted whistlers (Kimura 1966; the Bortnik
thesis the reference's 3D script cites at RayTrace_3D.jl:5): once a
whistler's frequency drops below the local lower-hybrid resonance
frequency the refractive-index surface closes, and instead of
precipitating the ray mirrors and bounces between hemispheres --
the mechanism that turns one lightning stroke into long-lived
magnetospherically-reflected wave energy (and, via the framework's
diffusion tier, into electron loss over days rather than one pass).

Nothing here is prescribed: the mirror emerges from the same traced
dispersion (the proton term of stix_rlp) the 2D scripts integrate, and
`analysis.f_lhr` derives the mirror surface from those same Stix
coefficients (S = 0). The figure shows:
  1. meridional ray paths at three frequencies with each frequency's
     f = f_LHR mirror surface overlaid -- turning points sit on their
     own surface;
  2. local f_LHR along the 1 kHz ray vs group delay, mirror crossings
     marked;
  3. the wave-normal angle swinging across 90 deg at every reflection
     (the surface closing and reopening).

Writes examples/output/magnetospheric_reflection.png. CPU ~1 min.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

FREQS = (750.0, 1000.0, 1500.0)


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
    from raytrace_tpu.integrate.saving import save_fn_for
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    os.makedirs(OUT, exist_ok=True)
    env = make_env_lat()

    n = len(FREQS)
    u0 = np.zeros((n, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = np.pi / 4 + 0.15
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray(FREQS),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4, dt_max=1e6 / RE),
        spec=StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=20.0),
        max_steps=160000, save_every=20, save_fn=save_fn_for("2d_lat", env),
    )
    tu = np.asarray(res.traj["u"])        # (S, n, 4)
    ex = np.asarray(res.traj["extras"])   # (S, n, 4): mu, dmudpsi, dip, psi

    fig, axes = plt.subplots(1, 3, figsize=(16, 5.0))

    # --- panel 1: meridional paths + per-frequency mirror surfaces ------
    ax = axes[0]
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.85")
    rg = np.linspace(1.02, 4.5, 180)
    lg = np.linspace(-1.25, 1.25, 181)
    Rg, Lg = np.meshgrid(rg, lg)
    FL = np.asarray(analysis.f_lhr(Rg.ravel(), Lg.ravel(), env)
                    ).reshape(Rg.shape)
    X, Y = Rg * np.cos(Lg), Rg * np.sin(Lg)
    colors = ("C0", "C3", "C2")
    for b, (f, c) in enumerate(zip(FREQS, colors)):
        alive = tu[:, b, 0] > 1.0005
        m = max(int(alive.sum()), 2)
        x = tu[:m, b, 0] * np.cos(tu[:m, b, 1])
        y = tu[:m, b, 0] * np.sin(tu[:m, b, 1])
        ax.plot(x, y, color=c, lw=0.9, label=f"{f:.0f} Hz")
        ax.contour(X, Y, FL, levels=[f], colors=[c], linewidths=0.8,
                   linestyles="--")
        _, idx = analysis.count_lat_reversals(tu[:m, b], r_min=1.5)
        fl_rev = np.asarray(analysis.f_lhr(tu[idx, b, 0], tu[idx, b, 1],
                                           env))
        on = idx[np.abs(fl_rev - f) / f < 0.15]
        ax.plot(tu[on, b, 0] * np.cos(tu[on, b, 1]),
                tu[on, b, 0] * np.sin(tu[on, b, 1]), "o", color=c, ms=5,
                mfc="none")
    ax.set_aspect("equal")
    ax.set_xlabel("$r \\cos\\lambda$ [$R_E$]")
    ax.set_ylabel("$r \\sin\\lambda$ [$R_E$]")
    ax.set_title("unducted whistlers mirroring at their own\n"
                 "$f = f_{LHR}$ surface (dashed; circles: mirrors)",
                 fontsize=10)
    ax.legend(fontsize=8, loc="lower right")

    # --- panel 2: f_LHR along the 1 kHz ray -----------------------------
    ax = axes[1]
    b = 1
    alive = tu[:, b, 0] > 1.0005
    m = max(int(alive.sum()), 2)
    fl_path = np.asarray(analysis.f_lhr(tu[:m, b, 0], tu[:m, b, 1], env))
    T = tu[:m, b, 3]
    ax.semilogy(T, fl_path, color="C3", lw=1.0,
                label="local $f_{LHR}$ along the ray")
    ax.axhline(FREQS[b], color="k", lw=0.8, label=f"wave: {FREQS[b]:.0f} Hz")
    _, idx = analysis.count_lat_reversals(tu[:m, b], r_min=1.5)
    fl_rev = np.asarray(analysis.f_lhr(tu[idx, b, 0], tu[idx, b, 1], env))
    on = idx[np.abs(fl_rev - FREQS[b]) / FREQS[b] < 0.15]
    ax.plot(T[on], fl_path[on], "o", color="C3", mfc="none", ms=7,
            label="LHR mirrors")
    ax.set_xlabel("group delay $T$ [s]")
    ax.set_ylabel("$f_{LHR}$ [Hz]")
    ax.grid(alpha=0.3, which="both")
    ax.set_title("the ray turns exactly where its frequency\n"
                 "meets the local LHR", fontsize=10)
    ax.legend(fontsize=8)

    # --- panel 3: wave-normal angle across the mirrors ------------------
    ax = axes[2]
    psi = np.degrees(ex[:m, b, 3])
    ax.plot(T, psi, color="C3", lw=0.9)
    ax.axhline(90.0, color="k", lw=0.6, ls=":")
    ax.axhline(-90.0, color="k", lw=0.6, ls=":")
    for i in on:
        ax.axvline(T[i], color="0.6", lw=0.6)
    ax.set_xlabel("group delay $T$ [s]")
    ax.set_ylabel("wave-normal angle $\\psi$ [deg]")
    ax.grid(alpha=0.3)
    ax.set_title("$\\psi$ swings across the resonance cone\n"
                 "at each reflection (vertical lines: mirrors)",
                 fontsize=10)

    fig.tight_layout()
    path = os.path.join(OUT, "magnetospheric_reflection.png")
    fig.savefig(path, dpi=120)
    print(path)
    print(f"1 kHz ray: {len(idx)} high-altitude turning points, "
          f"{len(on)} on the LHR surface (<15%)")


if __name__ == "__main__":
    main()
