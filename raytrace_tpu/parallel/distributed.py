"""Multi-host (DCN) scale-out for ray ensembles.

The reference is a single Julia process (SURVEY.md section 5.8: no
MPI/NCCL/threads of any kind). On TPU pods the scale-out axis stays the
ray batch, and the physics keeps it embarrassingly parallel: no
collective exists in the hot loop, so the multi-host design is

  1. every process runs the SAME host program (SPMD);
  2. the launch grid is built identically everywhere (pure NumPy, cheap)
     and each process takes its contiguous per-process slice;
  3. within a process, rays ride the existing single-host machinery --
     the bucketed rounds tracer over the process's addressable devices
     (host-side re-bucketing is process-local by construction, so the
     straggler compaction never crosses DCN);
  4. the ONLY cross-host communication is the terminal statistics
     reduction (process_allgather of per-host stat dicts -- a few
     hundred bytes, once per run).

This mirrors how the sharded single-host path works across ICI, with the
host boundary promoted to the outer sharding level: ICI moves rays inside
a host via NamedSharding; DCN never moves rays at all.

Tested at process_count == 1 (the slicing, padding and aggregation logic
is pure host code) and on the 8-virtual-device CPU mesh; a real multi-pod
run only adds jax.distributed.initialize(), which `ensure_initialized`
wires from the standard TPU pod environment.
"""

from typing import Optional

import numpy as np

import jax

from . import ensemble as ensemble_mod
from . import mesh as mesh_mod


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None):
    """Initialize jax.distributed for a multi-host run (idempotent).

    With no arguments, relies on the TPU pod metadata the JAX runtime
    autodetects (GCE/GKE). A no-op when the runtime is already
    initialized or when the job is single-process with no coordinator
    configured."""
    if jax.process_count() > 1:
        return  # already initialized (process_count > 1 implies it)
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_slice(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Contiguous [start, stop) of the n-ray global batch owned by this
    process. Every process computes the same arithmetic (SPMD): rays are
    dealt in ceil(n / P)-sized blocks, the last block short or empty."""
    p = jax.process_index() if process_index is None else process_index
    cnt = jax.process_count() if process_count is None else process_count
    per = -(-n // cnt)
    start = min(p * per, n)
    stop = min(start + per, n)
    return start, stop


def local_launch(u0, f, valid=None, *, process_index=None,
                 process_count=None, multiple=8):
    """This process's slice of a global launch batch, padded for the
    process-local device count.

    (u0, f) are the GLOBAL grid (identical on every process -- build it
    with build_launch everywhere; it is host-side NumPy). Returns
    (u0_local, f_local, valid_local) where padding lanes replicate ray 0
    and are masked out of statistics, exactly like pad_batch."""
    n = u0.shape[0]
    if valid is None:
        valid = np.ones(n, bool)
    start, stop = process_slice(n, process_index, process_count)
    u0_l, f_l, v_l = u0[start:stop], f[start:stop], valid[start:stop]
    if u0_l.shape[0] == 0:
        # empty tail process: trace one masked pad ray so shapes stay valid
        u0_l, f_l = u0[:1], f[:1]
        v_l = np.zeros(1, bool)
    n_dev = max(1, len(jax.local_devices()))
    k = n_dev * multiple
    n_pad = -(-u0_l.shape[0] // k) * k
    if n_pad != u0_l.shape[0]:
        extra = n_pad - u0_l.shape[0]
        u0_l = np.concatenate([u0_l, np.repeat(u0_l[:1], extra, axis=0)])
        f_l = np.concatenate([f_l, np.repeat(f_l[:1], extra)])
        v_l = np.concatenate([v_l, np.zeros(extra, bool)])
    return u0_l, f_l, v_l


def local_mesh():
    """1-D 'rays' mesh over this process's addressable devices only."""
    return mesh_mod.make_ray_mesh(jax.local_devices())


def _weighted_median(values, weights):
    """Median of `values` under nonnegative `weights` (the smallest value
    at which the cumulative weight reaches half the total). Zero-weight
    entries never influence the result; all-zero weights return 0.0."""
    values = np.asarray(values, np.float64)
    weights = np.asarray(weights, np.float64)
    order = np.argsort(values)
    v, w = values[order], weights[order]
    cum = np.cumsum(w)
    total = cum[-1] if cum.size else 0.0
    if total <= 0.0:
        return 0.0
    return float(v[np.searchsorted(cum, 0.5 * total)])


def combine_stat_rows(rows) -> dict:
    """Pure combination of per-process ensemble_stats rows into global
    statistics (one dict per process, identical key sets).

    - plain keys (counts, totals) SUM across processes;
    - `mean_*` keys recombine weighted by each process's surface-hit
      count (exact: the per-process means are hit-count-weighted sums);
    - `median_*` keys are NOT sum-combinable -- the global value is the
      hit-weighted median of the per-process medians. That is exact at
      process_count == 1 and a standard median-of-medians estimator
      otherwise (the exact global median would need the raw per-ray
      values, which stay process-local by design -- only a few hundred
      bytes of stats ever cross DCN)."""
    out = {}
    hits = np.asarray(
        [r.get("n_hit_earth", 0.0) for r in rows], np.float64
    )
    total_hits = max(float(hits.sum()), 1.0)
    for k in rows[0]:
        vals = np.asarray([r[k] for r in rows], np.float64)
        if k.startswith("mean_"):
            out[k] = float(np.sum(vals * hits) / total_hits)
        elif k.startswith("median_"):
            out[k] = _weighted_median(vals, hits)
        else:
            out[k] = float(vals.sum())
    return out


def aggregate_stats(stats: dict) -> dict:
    """Combine per-process ensemble_stats dicts into global statistics.

    Gathers every process's stats row with process_allgather when
    process_count > 1 (a single-process run skips the collective), then
    delegates to the pure `combine_stat_rows` -- which is what the
    synthetic multi-row unit tests and the 2-process integration test
    both exercise."""
    local = {k: float(v) for k, v in stats.items()}
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        keys = sorted(local)
        vec = np.asarray([local[k] for k in keys], np.float64)
        allv = np.asarray(multihost_utils.process_allgather(vec))
        rows = [dict(zip(keys, row)) for row in allv]
    else:
        rows = [local]
    return combine_stat_rows(rows)


def trace_ensemble_multihost(env, u0, f, valid=None, *, tracer_kw=None):
    """End-to-end multi-host ensemble: slice, trace locally, aggregate.

    (u0, f, valid) are the GLOBAL batch, identical on every process.
    Returns (local TraceResult, local valid mask, global stats dict).
    Single-process this is exactly the rounds-tracer path plus a stats
    pass-through, so the whole function runs under the fake-backend
    tests."""
    tracer_kw = dict(tracer_kw or {})
    u0_l, f_l, v_l = local_launch(u0, f, valid)
    mesh = local_mesh() if len(jax.local_devices()) > 1 else None
    tracer = ensemble_mod.make_rounds_tracer(env, mesh=mesh, **tracer_kw)
    res = tracer(u0_l, f_l, v_l)
    frame = tracer_kw.get("frame", "2d_lat")
    lat_sign, lat_offset = (
        (1.0, 0.0) if frame == "2d_lat" else (-1.0, np.pi / 2)
    )
    stats = ensemble_mod.ensemble_stats(
        res, v_l, lat_sign=lat_sign, lat_offset=lat_offset, xp=np
    )
    return res, v_l, aggregate_stats(stats)
