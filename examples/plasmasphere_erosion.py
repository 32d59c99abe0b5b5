"""Storm-time plasmasphere erosion and the dusk plume, from drift
kinematics alone.

models/storm.py models erosion as a relaxation with an ASSUMED time
constant tau_erode ~ 3 h; raytrace_tpu.convection can now derive both
the timescale and the morphology. When Kp steps up, the last closed
equipotential jumps inward, stranding the outer plasmasphere on open
drift paths: enhanced convection sweeps that material sunward through
the dusk sector -- the classic plasmaspheric PLUME seen by IMAGE
EUV -- and drains it to the magnetopause within hours.

Panels (Kp 1 -> 5 step at t = 0):
  (a) t = 0: cold plasma fills the quiet-time boundary; the new storm
      LCE is drawn inside -- everything between is now on open paths;
  (b) t = 3 h: the stranded annulus shears into a sunward-pointing
      plume through the afternoon/dusk sector while the core stays
      corotating;
  (c) t = 10 h: the plume has mostly drained; the plasmasphere is
      eroded to the storm boundary (narrow rotating remnant tail);
  (d) the derived erosion clock: median drift-stripping time vs storm
      Kp (convection.erosion_times) against the tau_erode ~ 3 h
      relaxation constant storm.py assumes -- the assumption is
      DERIVED here, and its trend with storm strength comes with it.

All parcels advance together through one vectorized RK4 on the E x B
field (exb_drift broadcasts). Writes
examples/output/plasmasphere_erosion.png. CPU, ~30 s.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

KP_QUIET = 1.0
KP_STORM = 5.0
N_MLT = 72
N_RING = 7
L_ESCAPE = 12.0


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import convection as cv

    os.makedirs(OUT, exist_ok=True)

    pp_q = cv.plasmapause(KP_QUIET, n_mlt=N_MLT)
    pp_s = cv.plasmapause(KP_STORM, n_mlt=N_MLT)

    # seed the stranded annulus (between storm and quiet boundaries)
    # plus a corotating core (inside the storm boundary) for contrast
    frac = (np.arange(N_RING) + 0.5) / N_RING
    l0 = (pp_s["l_pp"][None, :]
          + frac[:, None] * (pp_q["l_pp"] - pp_s["l_pp"])[None, :])
    mlt0 = np.broadcast_to(pp_q["mlt_rad"][None, :], l0.shape)
    core_f = (np.arange(4) + 1.0) / 5.0
    lc = core_f[:, None] * pp_s["l_pp"][None, :]
    l0 = np.concatenate([l0.ravel(), lc.ravel()])
    mlt0 = np.concatenate([mlt0.ravel(),
                           np.broadcast_to(pp_s["mlt_rad"][None, :],
                                           lc.shape).ravel()])
    is_plume = np.zeros(l0.size, bool)
    is_plume[:N_RING * N_MLT] = True

    # vectorized RK4 on (L, phi) for the whole swarm; freeze escapers
    snaps = {0.0: (l0.copy(), mlt0.copy())}
    want = [3.0, 10.0]
    t_end = 10.0 * 3600.0
    n_steps = 3000
    dt = t_end / n_steps
    l, phi = l0.copy(), mlt0.copy()
    alive = np.ones(l.size, bool)

    def rhs(lv, pv):
        d = cv.exb_drift(np.maximum(lv, 1.05), pv, KP_STORM)
        return d["dl_dt"], d["dphi_dt"]

    t = 0.0
    for i in range(n_steps):
        k1l, k1p = rhs(l, phi)
        k2l, k2p = rhs(l + 0.5 * dt * k1l, phi + 0.5 * dt * k1p)
        k3l, k3p = rhs(l + 0.5 * dt * k2l, phi + 0.5 * dt * k2p)
        k4l, k4p = rhs(l + dt * k3l, phi + dt * k3p)
        dl = (dt / 6.0) * (k1l + 2 * k2l + 2 * k3l + k4l)
        dp = (dt / 6.0) * (k1p + 2 * k2p + 2 * k3p + k4p)
        l = np.where(alive, l + dl, l)
        phi = np.where(alive, phi + dp, phi)
        alive &= np.isfinite(l) & (l < L_ESCAPE)
        t += dt
        for w in list(want):
            if t >= w * 3600.0:
                snaps[w] = (l.copy(), np.where(alive, phi, np.nan))
                want.remove(w)

    fig, axes = plt.subplots(2, 2, figsize=(12.5, 11))

    def draw_frame(ax, lv, pv, title):
        th = np.linspace(0, 2 * math.pi, 200)
        ok = np.isfinite(pv) & (lv < L_ESCAPE)
        x, y = lv * np.cos(pv), lv * np.sin(pv)
        ax.scatter(x[ok & is_plume], y[ok & is_plume], s=7,
                   c="tab:red", label="stranded (open paths)")
        ax.scatter(x[ok & ~is_plume], y[ok & ~is_plume], s=7,
                   c="tab:blue", label="corotating core")
        mlt_c = np.concatenate([pp_s["mlt_rad"], pp_s["mlt_rad"][:1]])
        l_c = np.concatenate([pp_s["l_pp"], pp_s["l_pp"][:1]])
        ax.plot(l_c * np.cos(mlt_c), l_c * np.sin(mlt_c), "k-", lw=1.6,
                label=f"storm LCE (Kp={KP_STORM:.0f})")
        mlt_q = np.concatenate([pp_q["mlt_rad"], pp_q["mlt_rad"][:1]])
        l_q = np.concatenate([pp_q["l_pp"], pp_q["l_pp"][:1]])
        ax.plot(l_q * np.cos(mlt_q), l_q * np.sin(mlt_q), "--",
                color="0.5", lw=1.2, label=f"quiet LCE (Kp={KP_QUIET:.0f})")
        ax.fill(np.cos(th), np.sin(th), color="0.6")
        ax.set_xlim(-11, 11); ax.set_ylim(-11, 11)
        ax.set_aspect("equal")
        ax.set_xlabel("x [RE] (sun at right)")
        ax.set_ylabel("y [RE] (dusk up)")
        ax.set_title(title)

    draw_frame(axes[0, 0], *snaps[0.0],
               "(a) t = 0: Kp steps 1 → 5; outer shell stranded")
    axes[0, 0].legend(fontsize=8, loc="lower left")
    draw_frame(axes[0, 1], *snaps[3.0],
               "(b) t = 3 h: sunward plume through dusk")
    draw_frame(axes[1, 0], *snaps[10.0],
               "(c) t = 10 h: eroded to the storm boundary")

    ax = axes[1, 1]
    kps = [3.0, 4.0, 5.0, 6.0, 7.0]
    med = []
    for ks in kps:
        r = cv.erosion_times(KP_QUIET, ks, n_mlt=24, l_escape=L_ESCAPE)
        med.append(r["t_median_s"] / 3600.0)
    ax.plot(kps, med, "o-", color="tab:red",
            label="derived: median drift-stripping time")
    ax.axhline(3.0, color="tab:blue", ls="--",
               label="storm.py tau_erode assumption (3 h)")
    ax.set_xlabel("storm Kp (step from Kp = 1)")
    ax.set_ylabel("erosion time [h]")
    ax.set_title("(d) the erosion clock, derived vs assumed")
    ax.grid(alpha=0.3); ax.legend(fontsize=9)
    ax.set_ylim(0, 6)

    fig.tight_layout()
    path = os.path.join(OUT, "plasmasphere_erosion.png")
    fig.savefig(path, dpi=110)
    print("wrote", path)


if __name__ == "__main__":
    main()
