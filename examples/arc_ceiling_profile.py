"""Arc-length vs phase-path step ceiling along the canonical whistler ray.

The reference caps the integrator's PHASE-PATH step at dtmax = 1e6 m
(RayTrace_lat.jl:338), but the cap's physical job is spatial
resolution -- and the spatial rate |dx/dtau| = ds/dtau ~ 1/mu varies
~100x along a whistler ray, so a fixed phase ceiling over-resolves
space exactly where the plasma is densest (low altitude, mu ~ 50-100).
`SolverConfig.ds_max` caps the ARC LENGTH per step instead (computed
from the FSAL derivative carry at zero extra cost, integrate/solve.py).

This figure traces the canonical RayTrace_lat ray under both ceilings
(CPU float64, rtol 1e-7) and shows:
  (a) the two trajectories overlap exactly (landing within the event-
      sensitivity envelope) -- the ceiling is not an accuracy knob here;
  (b) accepted step size dt vs phase path: the phase-ceiling run is
      PINNED at dtmax for most of the flight, while the arc-ceiling
      run's dt scales with mu (bigger phase steps in dense plasma);
  (c) arc length per step: the phase-ceiling run collapses to ~1e-3 RE
      spatial steps in the ionosphere (over-resolution the error
      estimator never asked for), the arc run holds ~ds_max until the
      estimator takes over near the reflection/landing.

On the 10,240-ray headline the same trade is 21.5M -> 4.9M attempted
steps at equal landing statistics (benchmarks/perf_r03f.json).

Writes examples/output/arc_ceiling_profile.png. Runs anywhere (CPU ~1 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def trace_profile(cfg):
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    u0 = jnp.array([[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
        cfg=cfg, spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=6000, save_every=1,
    )
    u_t = np.asarray(res.traj["u"])[:, 0]        # (n_snap, 4)
    t_t = np.asarray(res.traj["t"])[:, 0]
    st_t = np.asarray(res.traj["status"])[:, 0]
    alive = st_t == 0
    # include the terminal snapshot
    n = int(alive.sum()) + 1
    u_t, t_t = u_t[:n], t_t[:n]
    # per-snapshot (== per-attempt at save_every=1) phase + arc steps;
    # rejected attempts contribute zero -- drop them
    dt = np.diff(t_t)
    x = u_t[:, 0] * np.cos(u_t[:, 1])
    y = u_t[:, 0] * np.sin(u_t[:, 1])
    ds = np.hypot(np.diff(x), np.diff(y))
    keep = dt > 0
    return dict(
        x=x, y=y, t=t_t[1:][keep], dt=dt[keep], ds=ds[keep],
        final=np.asarray(res.u)[0], n_accept=int(res.n_accept[0]),
    )


def main():
    import jax

    # diagnostic figure: always use the CPU float64 oracle path (on the
    # tunneled-TPU host the default backend would be f32, whose
    # tolerance floor muddies the dt profile at rtol 1e-7)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig

    DTMAX = 1.0e6 / RE
    DSMAX = 1.0e6 / RE
    phase = trace_profile(SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4))
    arc = trace_profile(SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4,
                                     dt_max=1e9, ds_max=DSMAX))

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.6))

    ax = axes[0]
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.85", zorder=0)
    ax.plot(phase["x"], phase["y"], "-", lw=2.2, color="tab:blue",
            label=f"phase ceiling ({phase['n_accept']} steps)")
    ax.plot(arc["x"], arc["y"], "--", lw=1.6, color="tab:orange",
            label=f"arc ceiling ({arc['n_accept']} steps)")
    ax.set_aspect("equal")
    ax.set_xlabel("x [$R_E$]")
    ax.set_ylabel("y [$R_E$]")
    ax.set_title("(a) same trajectory, 11x fewer steps")
    ax.legend(loc="lower right", fontsize=8)

    ax = axes[1]
    ax.semilogy(phase["t"], phase["dt"], ".", ms=2, color="tab:blue")
    ax.semilogy(arc["t"], arc["dt"], ".", ms=3, color="tab:orange")
    ax.axhline(DTMAX, color="tab:blue", ls=":", lw=1,
               label="reference dtmax = 1e6 m")
    ax.set_xlabel("phase path t [$R_E$]")
    ax.set_ylabel("accepted phase step dt [$R_E$]")
    ax.set_title("(b) dt: pinned at dtmax vs scaling with $\\mu$")
    ax.legend(fontsize=8)

    ax = axes[2]
    ax.semilogy(phase["t"], phase["ds"], ".", ms=2, color="tab:blue",
                label="phase ceiling")
    ax.semilogy(arc["t"], arc["ds"], ".", ms=3, color="tab:orange",
                label="arc ceiling")
    ax.axhline(DSMAX, color="tab:orange", ls=":", lw=1,
               label="ds_max = 1e6 m")
    ax.set_xlabel("phase path t [$R_E$]")
    ax.set_ylabel("arc length per step ds [$R_E$]")
    ax.set_title("(c) spatial resolution: what the ceiling is FOR")
    ax.legend(fontsize=8)

    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "arc_ceiling_profile.png")
    fig.savefig(path, dpi=130)
    print("wrote", path)
    print("phase: %d accepted, landing lat %.3f deg, T %.4f s" % (
        phase["n_accept"], np.degrees(phase["final"][1]), phase["final"][3]))
    print("arc:   %d accepted, landing lat %.3f deg, T %.4f s" % (
        arc["n_accept"], np.degrees(arc["final"][1]), arc["final"][3]))


if __name__ == "__main__":
    main()
