"""Stiff-pool A/B: ros3pr (stage-order-aware ROS3PR) vs ros2x.

Late round 3 derived a ROS3PR-class stepper in-repo (tools/derive_ros3.py):
order 3 with NO Prothero-Robinson order reduction, at ~half a ros2x
attempt's stage cost (1 jacfwd + 3 solves + 3 RHS vs 1 + 6 + 6) but with a
more conservative embedded estimator (~2x the steps at equal rtol on
smooth stiff relaxation). Which effect wins ON THE ACTUAL STIFF POOL --
the rejection-burst rays of the knee stress workload under
stepper="auto"?

Cases (knee preset shape, 384 rays at the plasmapause knee, f32, rtol
1e-5; the workload where the reference reached for CVODE_BDF):
  knee_ros2x  -- auto with the round-2 default stiff pool
  knee_ros3pr -- auto with the derived ROS3PR pool
plus the same A/B on the 10,240-ray headline shape (where the stiff pool
is a small minority of rays) to confirm headline neutrality.

Writes benchmarks/perf_r03l.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03l.json")


def main():
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import B0_2D, RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events
    from raytrace_tpu.models import cast_env, make_env, make_env_lat
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer,
    )

    mesh = make_ray_mesh()
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4)

    workloads = {
        "knee": (
            cast_env(make_env(b0=B0_2D), jnp.float32),
            LaunchSpec(
                lats=tuple(np.linspace(0.9, 1.15, 16)),
                chis=tuple(np.linspace(-0.2, 0.2, 8)),
                freqs=(500.0, 1000.0, 2000.0),
            ),
            dict(round_steps=(2048,), chunk=512, bucket_floor=256),
        ),
        "ensemble10k": (
            cast_env(make_env_lat(), jnp.float32),
            LaunchSpec(
                lats=tuple(np.linspace(0.45, 1.1, 40)),
                chis=tuple(np.linspace(-0.5, 0.5, 16)),
                freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
            ),
            dict(round_steps=(2048, 2048, 1024), chunk=512,
                 bucket_floor=256),
        ),
    }

    results = {}
    for wname, (env, spec, sched) in workloads.items():
        u0, f, valid = pad_batch(*build_launch(spec, np.float32), mesh)
        case_res = {}
        for stiff in ("ros2x", "ros3pr"):
            tracer = make_rounds_tracer(
                env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
                stepper="auto", base_stepper="bs3", stiff_stepper=stiff,
                want_carry=False, **sched,
            )
            tracer(u0, f, valid)  # compile + warm
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = tracer(u0, f, valid)
                walls.append(time.perf_counter() - t0)
            acc = np.asarray(res.n_accept)[valid]
            rej = np.asarray(res.n_reject)[valid]
            steps = int(acc.sum() + rej.sum())
            stats = ensemble_stats(res, valid, xp=np)
            stiff_n = (
                int(tracer.last_stiff[valid].sum())
                if tracer.last_stiff is not None else 0
            )
            rec = {
                "wall_s": round(min(walls), 3),
                "walls_s": [round(w, 3) for w in walls],
                "steps": steps,
                "rejection_pct": round(
                    100.0 * float(rej.sum()) / max(steps, 1), 2
                ),
                "rays_on_stiff_pool": stiff_n,
                "status_counts": {
                    k: int(v) for k, v in stats.items() if k.startswith("n_")
                },
                "median_landing_l": round(
                    float(stats["median_landing_l"]), 6
                ),
            }
            case_res[stiff] = (rec, res)
            print(wname, stiff, json.dumps(rec), flush=True)
        sa = np.asarray(case_res["ros2x"][1].status)[valid]
        sb = np.asarray(case_res["ros3pr"][1].status)[valid]
        results[wname] = {
            "ros2x": case_res["ros2x"][0],
            "ros3pr": case_res["ros3pr"][0],
            "status_agreement_pct": round(
                100.0 * float((sa == sb).mean()), 2
            ),
        }
        print(wname, "agreement",
              results[wname]["status_agreement_pct"], flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
