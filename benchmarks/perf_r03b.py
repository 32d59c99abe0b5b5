"""Round-3 follow-up: BS3 headline validation + dt-ceiling probe.

perf_r03.py showed the 10k ensemble rides dt_max (median accepted dt =
0.985 dt_max), and BS3(2) -- half the stage cost per attempt -- runs the
headline in 0.64 s vs 1.0 s. Before promoting it:

  1. physics validation: status counts + landing statistics of bs3 and
     auto(base=bs3) against the auto/dp5 reference run;
  2. dt-ceiling probe: bs3 at dt_max x {1, 2, 4} -- does the error
     estimator hold the landing statistics while the ceiling lifts?

Writes benchmarks/perf_r03b.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03b.json")


def main():
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events
    from raytrace_tpu.models import cast_env, make_env_lat
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer,
    )

    env = cast_env(make_env_lat(), jnp.float32)
    mesh = make_ray_mesh()
    spec10k = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 40)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
    )
    u0, f, valid = pad_batch(*build_launch(spec10k, np.float32), mesh)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)

    def run_case(name, stepper, dtmax_mult=1.0, base_stepper="dopri5"):
        cfg = SolverConfig(
            rtol=1e-5, atol=1e-8, dt0=1e-4,
            dt_max=dtmax_mult * 1.0e6 / RE,
        )
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            round_steps=(2048, 2048, 1024), chunk=512, bucket_floor=256,
            stepper=stepper, base_stepper=base_stepper, want_carry=False,
        )
        tracer(u0, f, valid)  # compile + warm
        t0 = time.perf_counter()
        res = tracer(u0, f, valid)
        wall = time.perf_counter() - t0
        acc = np.asarray(res.n_accept)[valid]
        rej = np.asarray(res.n_reject)[valid]
        steps = int(acc.sum() + rej.sum())
        stats = ensemble_stats(res, valid, xp=np)
        rec = {
            "wall_s": round(wall, 3),
            "steps": steps,
            "steps_per_s_M": round(steps / wall / 1e6, 2),
            "rejection_pct": round(100.0 * float(rej.sum()) / max(steps, 1), 2),
            "status_counts": {
                k: int(v) for k, v in stats.items() if k.startswith("n_")
            },
            "mean_landing_l": round(float(stats["mean_landing_l"]), 5),
            "median_landing_l": round(float(stats["median_landing_l"]), 6),
            "median_group_delay_s": round(
                float(stats["median_group_delay_s"]), 6
            ),
        }
        print(name, json.dumps(rec), flush=True)
        return rec, res

    results = {}
    results["auto_dp5_1x"], ref = run_case("auto_dp5_1x", "auto")
    results["bs3_1x"], res_b = run_case("bs3_1x", "bs3")
    results["auto_bs3_1x"], _ = run_case(
        "auto_bs3_1x", "auto", base_stepper="bs3"
    )
    results["bs3_2x"], _ = run_case("bs3_2x", "bs3", dtmax_mult=2.0)
    results["bs3_4x"], _ = run_case("bs3_4x", "bs3", dtmax_mult=4.0)

    # per-ray agreement bs3 vs the dp5 reference: same status for the
    # overwhelming majority, landing states close where both land
    sa = np.asarray(ref.status)[valid]
    sb = np.asarray(res_b.status)[valid]
    both_hit = (sa == events.HIT_EARTH) & (sb == events.HIT_EARTH)
    ua = np.asarray(ref.u)[valid]
    ub = np.asarray(res_b.u)[valid]
    la = ua[both_hit, 0] / np.cos(ua[both_hit, 1]) ** 2
    lb = ub[both_hit, 0] / np.cos(ub[both_hit, 1]) ** 2
    results["bs3_vs_dp5"] = {
        "status_agreement_pct": round(100.0 * float((sa == sb).mean()), 2),
        "n_both_hit": int(both_hit.sum()),
        "median_abs_rel_dlanding_l": round(
            float(np.median(np.abs(lb - la) / la)), 6
        ),
        "p90_abs_rel_dlanding_l": round(
            float(np.percentile(np.abs(lb - la) / la, 90)), 6
        ),
    }
    print("bs3_vs_dp5", json.dumps(results["bs3_vs_dp5"]), flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
