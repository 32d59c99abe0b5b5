"""Round-3 straggler-tail attack, part 2: L-stable tail + fetch overlap.

perf_r03g.json showed the merged tail is latency-bound and the order-5
tail loses (fewer-but-costlier attempts). The remaining hypothesis: the
stragglers are CAUTION-capped -- recurring error spikes near resonance
cones keep dt regrowth at 1.3x -- and an L-stable Rosenbrock (ros2x)
steps through the spikes instead of tracking them, cutting ATTEMPTS by
a larger factor than its per-attempt cost (1 RHS + autodiff Jacobian +
adjugate solves). tail_stepper="ros2x" now runs the full merged-tail
budget (the 1024-step cap is keyed on stiff-pool identity, not method).

This run also carries the speculative final-fetch dispatch (the fetch
program queues behind the budget-exhausting round's programs, hiding
its dispatch + transfer under tail compute), so tail_off here doubles
as the post-overlap headline control.

Cases (10,240-ray headline shape, auto over bs3 base):
  tail_off   -- control (overlapped fetch, bs3 tail)
  tail_ros2x -- merged tail on the L-stable order-3 Rosenbrock

MEASURED ANSWER: negative, and it settles the straggler question. The
ros2x tail needs MORE attempts than bs3 (627k vs 596k: the recurring
error spikes near resonance cones are genuine solution structure the
estimator must resolve, NOT stiffness an L-stable method can step
through) at ~2x per-attempt cost -- tail wall 0.094 -> 0.189 s, and
MORE budget-exhausted rays (42 vs 31, the ros2x attempts being no
bigger). Together with perf_r03g (order-5 tail), perf_r03c (schedule),
and the ILP experiment, every structural lever on the tail has now
measured negative: the ~0.1 s tail is irreducible serialized
integration of ~13k genuinely-needed steps. The fetch-overlap change
(speculative final-fetch dispatch under tail compute) is worth ~10 ms,
within day variance (tail round 0.094 s vs 0.104 s pre-overlap).

Writes benchmarks/perf_r03i.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03i.json")


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
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4)

    def run_case(name, tail):
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            round_steps=(2048, 2048, 1024), chunk=512, bucket_floor=256,
            stepper="auto", base_stepper="bs3", tail_stepper=tail,
            want_carry=False,
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
        tail_rounds = [
            r for r in tracer.last_rounds
            if r["bucket"] <= 256 and r["active"] < 256
        ]
        rec = {
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "rejection_pct": round(100.0 * float(rej.sum()) / max(steps, 1), 2),
            "tail_rounds": [
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()} for r in tail_rounds
            ],
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
    results["tail_off"], ref = run_case("tail_off", "")
    results["tail_ros2x"], res = run_case("tail_ros2x", "ros2x")

    sa = np.asarray(ref.status)[valid]
    sb = np.asarray(res.status)[valid]
    results["agreement"] = {
        "status_agreement_pct": round(100.0 * float((sa == sb).mean()), 2),
        "max_steps_off": int((sa == events.MAX_STEPS).sum()),
        "max_steps_ros2x": int((sb == events.MAX_STEPS).sum()),
    }
    print("agreement", json.dumps(results["agreement"]), flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
