"""Local (L-dependent) arc ceiling along a plasmapause-crossing ray.

A single global ds_max must be sized for the medium's sharpest feature
-- the plasmapause knee -- so it over-resolves the smooth 90% of every
ray path. `SolverConfig.ds_local_knee` replaces the constant with a
gradient-length profile of the medium itself (integrate/solve.py::
_local_arc_ceiling): the ceiling is tight (ds_local_w, the CA1992
transition scale) only within the knee shell's radial distance
|r - L_knee cos^2(mlat)|, opening to r/4.5 (the L^-4.5 plasmasphere
power law + dipole field scale) elsewhere. Extra sharp shells (a
density duct) register via ds_local_shells.

This figure traces a knee-crossing whistler (launch lat 60 deg, so the
ray's L sweeps through the plasmapause at L_knee ~ 4.4) at a loose
tolerance (rtol 1e-4 -- the regime where the ceiling, not the error
estimator, must own spatial resolution) under a knee-sized GLOBAL
ceiling (ds_max = 0.1 RE, what a constant must be to resolve the knee)
and the LOCAL profile, and shows:
  (a) the trajectories overlap; the local run needs 2.2x fewer steps
      (54 vs 117 accepted) for the same knee resolution;
  (b) arc length per accepted step vs the ray's own L-shell: the
      global run is pinned at ds_max everywhere, the local run rides
      r/4.5 over the smooth plasmasphere and dips to the knee width
      exactly at the knee shell;
  (c) the ceiling profile itself at the equator, with the knee (and a
      duct variant) marked -- what the integrator sees.

(At the production rtol 1e-5 the estimator already holds steps near
the local profile's smooth-region scale, so the single-ray win
shrinks; the ensemble-scale number is benchmarks/perf_r03k.py's to
measure on chip.)

Writes examples/output/local_ceiling_profile.png. Runs anywhere (CPU ~1 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

LAUNCH_LAT = 1.05  # rad: the ray's field line reaches past the knee


def trace_profile(cfg):
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    u0 = jnp.array([[(RE + 1.0e6) / RE, LAUNCH_LAT, 0.0, 0.0]])
    f = jnp.array([1000.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
        cfg=cfg, spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=6000, save_every=1,
    )
    u_t = np.asarray(res.traj["u"])[:, 0]
    t_t = np.asarray(res.traj["t"])[:, 0]
    st_t = np.asarray(res.traj["status"])[:, 0]
    alive = st_t == 0
    n = int(alive.sum()) + 1
    u_t, t_t = u_t[:n], t_t[:n]
    dt = np.diff(t_t)
    x = u_t[:, 0] * np.cos(u_t[:, 1])
    y = u_t[:, 0] * np.sin(u_t[:, 1])
    ds = np.hypot(np.diff(x), np.diff(y))
    lsh = u_t[:, 0] / np.maximum(np.cos(u_t[:, 1]) ** 2, 1e-9)
    keep = dt > 0
    return dict(
        x=x, y=y, t=t_t[1:][keep], dt=dt[keep], ds=ds[keep],
        l_mid=0.5 * (lsh[1:] + lsh[:-1])[keep],
        final=np.asarray(res.u)[0], n_accept=int(res.n_accept[0]),
    )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.integrate.solve import _local_arc_ceiling
    from raytrace_tpu.models import make_env_lat

    env = make_env_lat()
    knee_l = float(env.lppo)
    DSMAX = 0.1                 # knee-sized: what a GLOBAL constant must be
    W = 0.1
    # phase ceiling OFF to isolate the arc profiles (in production the
    # 8e6 m phase bound composes on top as the outer brake; with it on,
    # dense-plasma segments ride the phase cap and both arc ceilings
    # stop binding there)
    base = dict(rtol=1e-4, atol=1e-7, dt0=1e-4, dt_max=1e9)
    glob = trace_profile(SolverConfig(ds_max=DSMAX, **base))
    loc = trace_profile(SolverConfig(ds_local_knee=knee_l,
                                     ds_local_w=W, **base))

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.6))

    ax = axes[0]
    th = np.linspace(0, 2 * np.pi, 200)
    ax.fill(np.cos(th), np.sin(th), color="0.85", zorder=0)
    ax.plot(glob["x"], glob["y"], "-", lw=2.2, color="tab:blue",
            label=f"global ds_max ({glob['n_accept']} steps)")
    ax.plot(loc["x"], loc["y"], "--", lw=1.6, color="tab:orange",
            label=f"local profile ({loc['n_accept']} steps)")
    # knee shell r = L cos^2(lat)
    lat = np.linspace(-np.pi / 3, np.pi / 3, 200)
    rk = knee_l * np.cos(lat) ** 2
    ax.plot(rk * np.cos(lat), rk * np.sin(lat), ":", color="0.4", lw=1,
            label=f"plasmapause L = {knee_l:.2f}")
    ax.set_aspect("equal")
    ax.set_xlabel("x [$R_E$]")
    ax.set_ylabel("y [$R_E$]")
    ax.set_title("(a) knee-crossing ray, both ceilings")
    ax.legend(loc="lower left", fontsize=8)

    ax = axes[1]
    ax.semilogy(glob["l_mid"], glob["ds"], ".", ms=3, color="tab:blue",
                label="global ds_max")
    ax.semilogy(loc["l_mid"], loc["ds"], ".", ms=3, color="tab:orange",
                label="local profile")
    ax.axhline(DSMAX, color="tab:blue", ls=":", lw=1)
    ax.axvline(knee_l, color="0.4", ls=":", lw=1)
    ax.set_xlabel("ray L-shell")
    ax.set_ylabel("arc length per accepted step [$R_E$]")
    ax.set_title("(b) local steps open up off the knee")
    ax.legend(fontsize=8)

    ax = axes[2]
    lgrid = np.linspace(1.2, 6.5, 400)
    cfg_p = SolverConfig(ds_local_knee=knee_l, ds_local_w=W)
    cfg_d = cfg_p._replace(ds_local_shells=((3.0, 0.05),))
    spec = StopSpec()
    prof = [float(_local_arc_ceiling(jnp.array([L, 0.0, 0.0, 0.0]),
                                     spec, cfg_p)) for L in lgrid]
    prof_d = [float(_local_arc_ceiling(jnp.array([L, 0.0, 0.0, 0.0]),
                                       spec, cfg_d)) for L in lgrid]
    ax.plot(lgrid, prof, "-", color="tab:orange", lw=2,
            label="knee profile")
    ax.plot(lgrid, prof_d, "--", color="tab:green", lw=1.4,
            label="+ duct shell at L = 3")
    ax.axhline(DSMAX, color="tab:blue", ls=":", lw=1,
               label="knee-sized global ds_max")
    ax.axvline(knee_l, color="0.4", ls=":", lw=1)
    ax.set_xlabel("equatorial L [$R_E$]")
    ax.set_ylabel("arc ceiling [$R_E$]")
    ax.set_title("(c) the ceiling the integrator sees")
    ax.legend(fontsize=8)

    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "local_ceiling_profile.png")
    fig.savefig(path, dpi=130)
    print("wrote", path)
    for name, d in (("global", glob), ("local", loc)):
        print("%s: %d accepted, landing lat %.3f deg, T %.4f s" % (
            name, d["n_accept"], np.degrees(d["final"][1]),
            d["final"][3]))


if __name__ == "__main__":
    main()
