"""Benchmark harness: wall-clock + throughput for the five canonical
configs (SURVEY.md section 5.1 -- the cost visibility the reference never
built despite importing BenchmarkTools in four files).

Usage:  python benchmarks/run_all.py [--configs raymain,lat_fan,...]
Writes benchmarks/results.json. Compile time is excluded (each config is
run once to warm the program cache, then timed).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
ALL = ["raymain", "lat_fan", "knee", "3d", "ensemble10k",
       "ensemble10k_production", "ensemble10k_3d", "ensemble10k_plume",
       "mr_fan", "ensemble10k_tilted", "ensemble10k_igrf", "mr_fan_3d"]


def bench_config(name):
    import jax

    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run, summarize

    cfg = preset(name)
    run(cfg)  # warm: compiles every program this config needs
    t0 = time.perf_counter()
    out = run(cfg)
    wall = time.perf_counter() - t0
    acc = int(out["stats"]["total_accepted_steps"])
    rej = int(out["stats"]["total_rejected_steps"])
    return {
        "config": name,
        "backend": jax.default_backend(),
        "n_rays": int(np.asarray(out["valid"]).sum()),
        "wall_s": round(wall, 3),
        "ray_steps": acc + rej,
        "accepted": acc,
        "rejected": rej,
        "steps_per_sec": round((acc + rej) / wall, 1),
        "status": summarize(out["result"], out["valid"]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default=",".join(ALL))
    args = p.parse_args()
    results = []
    for name in args.configs.split(","):
        r = bench_config(name)
        print(json.dumps(r))
        results.append(r)
    payload = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "results": results,
    }
    with open(RESULTS, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(f"wrote {RESULTS}")


if __name__ == "__main__":
    main()
