"""Ducted whistler propagation demo.

Traces the same launch fan through the canonical plasmasphere with and
without a field-aligned density crest duct (Smith 1961; Helliwell 1965;
models/plasmasphere.py::duct_factor) and plots both path families over
the dipole field lines, plus the equatorial density profile showing the
duct. The guided family hugs the duct field line; the unducted family
spreads. This is the guided-propagation study the reference's planned
frequency ensembles point at (RayMain.jl:32-52).

Writes examples/output/ducted_paths.png. Runs anywhere (CPU ~1 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

DUCT_L0 = 2.6
DUCT_AMP = 0.8
DUCT_W = 0.25


def trace_fan(env, u0, f):
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.ops import rhs

    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=20000, save_every=25,
    )
    # trajectory snapshots: (n_snap, B, ...) -> per-ray (x, y) paths
    u_t = np.asarray(res.traj["u"])
    st_t = np.asarray(res.traj["status"])
    paths = []
    for b in range(u_t.shape[1]):
        alive = st_t[:, b] <= 1  # up to first post-terminal snapshot
        r, lat = u_t[alive, b, 0], u_t[alive, b, 1]
        paths.append((r * np.cos(lat), r * np.sin(lat)))
    return paths, np.asarray(res.u), np.asarray(res.status)


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.models import make_env, medium

    os.makedirs(OUT, exist_ok=True)

    env0 = make_env()
    envd = make_env(duct_amp=DUCT_AMP, duct_l0=DUCT_L0, duct_w=DUCT_W)

    # a fan of rays straddling the duct foot
    n = 7
    lats = np.linspace(0.76, 0.92, n)  # straddle the duct foot (lat 0.84)
    u0 = np.zeros((n, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = lats
    f = np.full((n,), 5000.0)

    paths0, _, _ = trace_fan(env0, u0, f)
    pathsd, _, _ = trace_fan(envd, u0, f)

    fig, axes = plt.subplots(1, 2, figsize=(13, 6), sharex=True, sharey=True)
    lat_line = np.linspace(-np.pi / 2, np.pi / 2, 200)
    for ax, paths, title in (
        (axes[0], paths0, "no duct"),
        (axes[1], pathsd,
         f"crest duct at L = {DUCT_L0} (+{int(DUCT_AMP * 100)}%)"),
    ):
        for L in (2.0, 3.0, 4.0, 5.0):
            xl = L * np.cos(lat_line) ** 3
            yl = L * np.cos(lat_line) ** 2 * np.sin(lat_line)
            ax.plot(xl, yl, color="0.8", lw=0.7, zorder=0)
        # the duct cross-section (shaded between L0 +- w)
        if "duct" in title:
            for Ld in (DUCT_L0 - DUCT_W, DUCT_L0 + DUCT_W):
                ax.plot(Ld * np.cos(lat_line) ** 3,
                        Ld * np.cos(lat_line) ** 2 * np.sin(lat_line),
                        color="tab:orange", lw=0.9, ls="--", zorder=1)
        th = np.linspace(0, 2 * np.pi, 100)
        ax.fill(np.cos(th), np.sin(th), color="0.6", zorder=2)
        for x, y in paths:
            ax.plot(x, y, lw=1.0, zorder=3)
        ax.set_title(title)
        ax.set_xlim(0, 5.2)
        ax.set_ylim(-0.5, 3.4)
        ax.set_aspect("equal")
        ax.set_xlabel("x (RE)")
    axes[0].set_ylabel("y (RE)")
    fig.suptitle("Whistler fan, 5 kHz: field-aligned density duct guiding")
    fig.tight_layout()
    path = os.path.join(OUT, "ducted_paths.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)

    # equatorial profile with and without the duct
    rr = np.linspace(1.2, 5.5, 400)
    ne0 = np.array([float(medium.ne_total_m3(r, 0.0, env0)) for r in rr])
    ned = np.array([float(medium.ne_total_m3(r, 0.0, envd)) for r in rr])
    fig2, ax = plt.subplots(figsize=(7, 4.5))
    ax.semilogy(rr, ne0 * 1e-6, label="no duct")
    ax.semilogy(rr, ned * 1e-6, label="with duct")
    ax.set_xlabel("equatorial distance (RE = L)")
    ax.set_ylabel("n$_e$ (cm$^{-3}$)")
    ax.legend()
    ax.set_title("Equatorial density profile")
    fig2.tight_layout()
    path2 = os.path.join(OUT, "ducted_profile.png")
    fig2.savefig(path2, dpi=120)
    print("wrote", path2)


if __name__ == "__main__":
    main()
