"""Storm-time whistler ensemble: the same fan across a 72 h storm.

Drives the dynamic plasmapause (models/storm.py: fast erosion, slow
refilling) with a canonical Kp-7 storm, builds one medium per epoch, and
traces the same latitude fan through each. Output: the plasmapause
history with the epoch markers, and the landing-latitude drift of the
fan as the plasmapause sweeps across its propagation region -- the
storm-time signature whistler networks actually observe.

Writes examples/output/storm_time.png. Runs anywhere (CPU, ~2 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import storm
    from raytrace_tpu.ops import rhs

    os.makedirs(OUT, exist_ok=True)

    # canonical storm: quiet Kp 2, main phase Kp 7 at 24-30 h, recovery
    hours = np.arange(0.0, 96.1, 3.0)
    kp = np.full_like(hours, 2.0)
    kp[(hours >= 24.0) & (hours < 30.0)] = 7.0
    kp[(hours >= 30.0) & (hours < 36.0)] = 4.0

    t_fine = np.arange(0.0, 96.0, 0.5)
    lpp_fine = storm.plasmapause_history(t_fine, hours, kp)
    epochs = np.array([0.0, 26.0, 32.0, 48.0, 72.0, 95.0])
    envs, lpp_ep = storm.storm_sequence(epochs, hours, kp)

    # the fan: high-latitude launches whose rays cross L ~ 2.4-4.7
    n = 12
    lats = np.linspace(0.85, 1.05, n)
    u0 = np.zeros((n, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = lats
    f = np.full((n,), 1000.0)

    land = []
    for env in envs:
        res = trace(
            lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
            cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
            spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE), max_steps=20000,
        )
        uu = np.asarray(res.u)
        st = np.asarray(res.status)
        land.append(np.where(st == 1, np.degrees(uu[:, 1]), np.nan))
    land = np.array(land)  # (n_epochs, n_rays)

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(9, 8), sharex=False,
        gridspec_kw={"height_ratios": [1, 1.4]},
    )
    ax1.plot(t_fine, lpp_fine, lw=1.5, label="L$_{pp}$(t)")
    ax1.step(hours, 5.6 - 0.46 * kp, where="post", color="0.7", lw=0.8,
             label="instantaneous CA1992 L$_{ppi}$(Kp)")
    ax1.plot(epochs, lpp_ep, "o", color="tab:red", ms=5, label="epochs")
    ax1.set_ylabel("plasmapause L")
    ax1.set_xlabel("storm time (h)")
    ax1.legend(loc="lower left", fontsize=8)
    ax1.set_title("Dynamic plasmapause: fast erosion, slow refilling")

    for k, ep in enumerate(epochs):
        ax2.plot(np.degrees(lats), land[k], "o-", ms=3, lw=0.9,
                 label=f"t = {ep:.0f} h (L$_{{pp}}$ = {lpp_ep[k]:.2f})")
    ax2.set_xlabel("launch latitude (deg)")
    ax2.set_ylabel("landing latitude (deg)")
    ax2.legend(fontsize=8)
    ax2.set_title("Landing drift of the same 1 kHz fan across the storm")
    fig.tight_layout()
    path = os.path.join(OUT, "storm_time.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)


if __name__ == "__main__":
    main()
