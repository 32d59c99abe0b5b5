"""Round-3 stage-cost ladder, bottom rung: Heun 2(1) vs BS3(2).

The dt-ceiling diagnosis (perf_r03.json: median accepted dt =
0.985 dt_max) says the headline's step count is pinned by dt_max, not
by accuracy -- so per-attempt stage cost is the binding cost, and the
order ladder is worth descending one more rung: Heun's explicit
trapezoid 2(1) runs 2 fresh RHS evals per attempt vs BS3's 3. The
counterweight is error inflation: at the SAME dt the order-2 estimate
is (dt/h*)^2 instead of (dt/h*)^3, which pushes accuracy-limited rays
off the ceiling earlier. Whether 2/3 stage cost beats the step
inflation is this experiment.

Cases (all 10,240-ray headline shape, reference tolerances):
  bs3_1x        -- the round-3 headline base (control)
  heun2_1x      -- Heun pinned for every ray
  auto_heun2_1x -- auto mode with heun2 as the non-stiff base pool

Writes benchmarks/perf_r03e.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03e.json")


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
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4, dt_max=1.0e6 / RE)

    def run_case(name, stepper, base_stepper="dopri5"):
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            round_steps=(2048, 2048, 1024), chunk=512, bucket_floor=256,
            stepper=stepper, base_stepper=base_stepper, want_carry=False,
        )
        tracer(u0, f, valid)  # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = tracer(u0, f, valid)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        acc = np.asarray(res.n_accept)[valid]
        rej = np.asarray(res.n_reject)[valid]
        steps = int(acc.sum() + rej.sum())
        stats = ensemble_stats(res, valid, xp=np)
        rec = {
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "steps_per_s_M": round(steps / wall / 1e6, 2),
            "rejection_pct": round(100.0 * float(rej.sum()) / max(steps, 1), 2),
            "status_counts": {
                k: int(v) for k, v in stats.items() if k.startswith("n_")
            },
            "median_landing_l": round(float(stats["median_landing_l"]), 6),
            "median_group_delay_s": round(
                float(stats["median_group_delay_s"]), 6
            ),
        }
        print(name, json.dumps(rec), flush=True)
        return rec, res

    results = {}
    results["bs3_1x"], ref = run_case("bs3_1x", "bs3")
    results["heun2_1x"], res_h = run_case("heun2_1x", "heun2")
    results["auto_heun2_1x"], _ = run_case(
        "auto_heun2_1x", "auto", base_stepper="heun2"
    )

    # per-ray agreement heun2 vs the bs3 control
    sa = np.asarray(ref.status)[valid]
    sb = np.asarray(res_h.status)[valid]
    both_hit = (sa == events.HIT_EARTH) & (sb == events.HIT_EARTH)
    ua = np.asarray(ref.u)[valid]
    ub = np.asarray(res_h.u)[valid]
    la = ua[both_hit, 0] / np.cos(ua[both_hit, 1]) ** 2
    lb = ub[both_hit, 0] / np.cos(ub[both_hit, 1]) ** 2
    results["heun2_vs_bs3"] = {
        "status_agreement_pct": round(100.0 * float((sa == sb).mean()), 2),
        "n_both_hit": int(both_hit.sum()),
        "median_abs_rel_dlanding_l": round(
            float(np.median(np.abs(lb - la) / la)), 6
        ),
        "p90_abs_rel_dlanding_l": round(
            float(np.percentile(np.abs(lb - la) / la, 90)), 6
        ),
    }
    print("heun2_vs_bs3", json.dumps(results["heun2_vs_bs3"]), flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
