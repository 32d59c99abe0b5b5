"""CLI: python -m raytrace_tpu <preset-name | config.json> [options].

Presets: raymain, lat_fan, knee, 3d, ensemble10k (the five BASELINE.json
configs). A JSON file path loads a full RunConfig instead.
"""

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="raytrace_tpu",
        description="TPU-native whistler ray tracer (see README.md)",
    )
    p.add_argument("config", help="preset name or RunConfig JSON path")
    p.add_argument("--out", default="runs", help="output directory")
    p.add_argument("--plots", action="store_true", help="render ray plots")
    p.add_argument("--trajectory", type=int, default=0, metavar="K",
                   help="record a snapshot every K steps")
    p.add_argument("--float64", action="store_true",
                   help="CPU float64 oracle mode")
    p.add_argument("--sensitivity", type=int, default=0, metavar="N",
                   help="landing-sensitivity analysis for the first N rays"
                        " (variational Jacobian; lands in the run record)")
    p.add_argument("--dump-config", action="store_true",
                   help="print the resolved RunConfig JSON and exit")
    args = p.parse_args(argv)

    from .config import RunConfig, preset

    if args.config.endswith(".json"):
        config = RunConfig.from_json(args.config)
    else:
        config = preset(args.config)
    if args.trajectory:
        config.save_every = args.trajectory
        config.save_diagnostics = True  # (mu, dmudpsi, dip, psi), any frame
    if args.sensitivity:
        config.sensitivity_rays = args.sensitivity
    if args.float64:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        config.dtype = "float64"
    if args.dump_config:
        print(config.to_json())
        return 0

    from .run import run, summarize

    t0 = time.perf_counter()
    out = run(config, out_dir=args.out, plots=args.plots)
    wall = time.perf_counter() - t0
    import numpy as np

    steps = int(out["stats"]["total_accepted_steps"]) + int(
        out["stats"]["total_rejected_steps"]
    )
    print(
        f"{config.name}: {int(np.asarray(out['valid']).sum())} rays, "
        f"{steps} ray-steps, {wall:.2f}s "
        f"({steps / wall / 1e6:.2f}M steps/s) | "
        f"{summarize(out['result'], out['valid'])}"
    )
    for k, v in out["paths"].items():
        print(f"  {k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
