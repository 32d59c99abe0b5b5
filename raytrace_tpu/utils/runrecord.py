"""Run records: every traced run serialized to JSON.

Replaces the reference's copy-pasted module globals and never-built
RayParam.jl/ray_param.dat parameter files (README.md:11-12, SURVEY.md
section 5.6) with a single serializable record of environment, solver,
stop conditions, launch grid, and results summary.
"""

import dataclasses
import json
import platform
import time

import numpy as np


def _tolist(x):
    if isinstance(x, (np.ndarray, np.generic)):
        return x.tolist()
    if hasattr(x, "_asdict"):
        return {k: _tolist(v) for k, v in x._asdict().items()}
    if dataclasses.is_dataclass(x):
        return {k: _tolist(v) for k, v in dataclasses.asdict(x).items()}
    if isinstance(x, (list, tuple)):
        return [_tolist(v) for v in x]
    if isinstance(x, dict):
        return {k: _tolist(v) for k, v in x.items()}
    if hasattr(x, "shape") and getattr(x, "shape") != ():
        # non-scalar device arrays (e.g. the MLT Fourier coefficient
        # vector ps_mlt_c after cast_env) -- item() only takes size 1
        return np.asarray(x).tolist()
    if hasattr(x, "item"):
        return x.item()
    return x


def write_run_record(path, *, env, cfg, spec, launch=None, result=None,
                     stats=None, extra=None):
    """Serialize a complete run description + summary to JSON."""
    import jax

    rec = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "host": platform.node(),
        "backend": jax.default_backend(),
        "n_devices": len(jax.devices()),
        "env": _tolist(env),
        "solver": _tolist(cfg),
        "stop": _tolist(spec),
    }
    if launch is not None:
        rec["launch"] = _tolist(launch)
    if result is not None:
        status = np.asarray(result.status)
        rec["result"] = {
            "n_rays": int(status.size),
            "status_counts": {
                int(k): int(v)
                for k, v in zip(*np.unique(status, return_counts=True))
            },
            "total_accepted": int(np.asarray(result.n_accept).sum()),
            "total_rejected": int(np.asarray(result.n_reject).sum()),
        }
    if stats is not None:
        rec["stats"] = _tolist(stats)
    if extra:
        rec["extra"] = _tolist(extra)
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=2)
    return rec
