"""CLI: python -m raytrace_tpu <preset-name | config.json> [options].

Presets: the five BASELINE.json configs (raymain, lat_fan, knee, 3d,
ensemble10k) plus the framework extensions (ensemble10k_production,
ensemble10k_local, ensemble3d, knee_3d, emic, ...) -- an unknown name
lists them all (config.preset). A JSON file path loads a full RunConfig
instead.
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
    p.add_argument("--multihost", action="store_true",
                   help="multi-process SPMD run: every process traces its "
                        "slice of the (identical) launch grid and the "
                        "statistics aggregate across processes "
                        "(jax.distributed; pod metadata autodetected, or "
                        "a single-process pass-through)")
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

    if args.multihost:
        return _run_multihost(config)

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


def _run_multihost(config):
    """The DCN scale-out path (SURVEY.md 5.8): SPMD over processes.

    Every process builds the identical global grid, traces its
    contiguous slice on its own addressable devices, and the terminal
    statistics aggregate with one process_allgather. Single-process this
    is a pure pass-through, so the flag is safe to use everywhere."""
    import json

    import numpy as np

    import jax

    from .models import medium as medium_mod
    from .parallel import distributed as dist
    from .run import _build_u0, summarize

    dist.ensure_initialized()
    env = config.medium.build()
    dtype = np.float32 if config.dtype == "float32" else np.float64
    env = medium_mod.cast_env(env, dtype)
    u0, f = _build_u0(config, dtype)
    tracer_kw = dict(
        frame=config.frame, cfg=config.solver(), spec=config.stop(),
        adaptive=config.adaptive, stepper=config.stepper,
        base_stepper=config.base_stepper, max_steps=config.max_steps,
        grad_mode=config.grad_mode, root=config.root, want_carry=False,
    )
    t0 = time.perf_counter()
    res, v_l, gstats = dist.trace_ensemble_multihost(
        env, u0, f, tracer_kw=tracer_kw
    )
    wall = time.perf_counter() - t0
    pid, cnt = jax.process_index(), jax.process_count()
    print(
        f"{config.name}[{pid}/{cnt}]: {int(np.asarray(v_l).sum())} local "
        f"rays, {wall:.2f}s | {summarize(res, v_l)}"
    )
    if pid == 0:
        print("GLOBAL " + json.dumps({k: float(v) for k, v in gstats.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
