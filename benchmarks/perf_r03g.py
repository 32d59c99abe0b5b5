"""Round-3 straggler-tail attack: order-5 merged tail (tail_stepper).

The headline wall profile (perf_r03c.json) ends with a latency-bound
tail: 269-ray then 47-ray buckets whose stragglers need ~13k steps
each. Those rays are accuracy-limited -- ceiling-riding rays exhaust
the phase budget in ~t_max/dt_max ~ 5k steps, and stiff rays live in
the ros2x pool -- which is exactly order 5's regime (~4.6x bigger
steps than the bs3 base at the same tolerance, 2x stage cost). The
order_pools knob already measured that trade as a LOSS when paid every
round (one extra program per round, perf_r03d.json); tail_stepper
applies it only at the merged-tail round, where it costs ZERO extra
programs (the merged tail is its own program either way).

Cases (10,240-ray headline shape, auto over bs3 base):
  tail_off -- tail_stepper="" (stays the default -- see MEASURED)
  tail_dp5 -- tail_stepper="dopri5"

MEASURED ANSWER: negative for wall on this topology. The 47-straggler
tail at a 256-lane bucket is LATENCY-bound -- an attempt costs
serialized chain latency, not FLOPs -- so dopri5's 6-eval chain
doubles per-attempt cost while cutting attempts only 1.48x (596k ->
403k: the caution cap on dt regrowth near resonance cones limits the
smooth-regime 4.6x), tail wall 0.104 -> 0.161 s. It does rescue 21 of
31 MAX_STEPS stragglers at 99.8% status agreement, so the knob stays
for compute-bound topologies / fixed-budget completion; default "".

Writes benchmarks/perf_r03g.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03g.json")


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
        # tail rounds = everything after the scheduled (2048,2048,1024)
        # prefix merges; identified by bucket size <= floor
        tail_rounds = [
            r for r in tracer.last_rounds
            if r["bucket"] <= 256 and r["stepper"] != "ros2x"
        ]
        rec = {
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "steps_per_s_M": round(steps / wall / 1e6, 2),
            "rejection_pct": round(100.0 * float(rej.sum()) / max(steps, 1), 2),
            "tail_rounds": [
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()} for r in tail_rounds
            ],
            "max_attempts_per_ray": int((acc + rej).max()),
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
    results["tail_dp5"], res = run_case("tail_dp5", "dopri5")

    sa = np.asarray(ref.status)[valid]
    sb = np.asarray(res.status)[valid]
    results["agreement"] = {
        "status_agreement_pct": round(100.0 * float((sa == sb).mean()), 2),
        "max_steps_off": int((sa == events.MAX_STEPS).sum()),
        "max_steps_dp5": int((sb == events.MAX_STEPS).sum()),
    }
    print("agreement", json.dumps(results["agreement"]), flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
