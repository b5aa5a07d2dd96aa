"""Multi-host execution (new capability — the reference is a single process
on a single device, SURVEY.md §2 row 23; simplesif.py:243-249).

Two tiers, matching how the workload actually scales across hosts:

1. **Sweep over hosts** (`run_sweep_multihost`): hyperparameter configs are
   embarrassingly parallel — zero cross-config traffic — so hosts need no
   collectives during compute at all.  Each process runs its strided config
   shard on its *local* chips (ICI-only inner loop), and per-config metric
   rows (KB-scale) are merged once at the end with a single
   ``process_allgather`` over DCN.  This is the SURVEY.md §5 comm-backend
   note made concrete: "DCN only matters for multi-host sweeps and carries
   no inner-loop traffic".
2. **One config over hosts**: after :func:`init_multihost`, a
   ``jax.sharding.Mesh`` built from ``jax.devices()`` spans every process;
   :func:`mmtpu.parallel.fit.fit_latents_mesh` works unchanged on it — the
   batch-axis gradient ``psum`` rides ICI within a host and DCN across.
   (MMB configs are KB-scale; this tier exists for completeness, the sweep
   tier is the production path.)

Tested with real multi-process Gloo collectives (two CPU processes) in
tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# Barrier ids must agree across processes AND be unique per invocation (the
# coordination service can reject a reused key).  A plain per-process counter
# is only safe if every process makes exactly the same number of calls; a
# skipped call on one host would silently pair MISMATCHED barriers and hang
# peers for the full timeout (advisor r4).  Instead the id is derived from
# data all processes agree on — a fingerprint of the global config grid —
# plus a per-fingerprint sequence (so repeated sweeps of the same grid still
# get distinct keys, under the much weaker requirement that processes run
# identical-grid sweeps in the same order).  A genuinely skipped call now
# leaves peers waiting on a key the skipper never touches: the barrier times
# out with the offending sweep's fingerprint in the key instead of
# mis-pairing two different sweeps' gathers.
_barrier_seq_by_fp: dict = {}


def _barrier_id(configs, n_runs: int) -> str:
    import hashlib
    import json

    blob = json.dumps([sorted(c.items()) for c in configs],
                      sort_keys=True, default=str) + f"|n_runs={n_runs}"
    fp = hashlib.md5(blob.encode()).hexdigest()[:12]
    seq = _barrier_seq_by_fp.get(fp, 0)
    _barrier_seq_by_fp[fp] = seq + 1
    return f"mmtpu_sweep_gather_{fp}_{seq}"


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kw,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, defers to cluster auto-detection / the standard env
    vars (``JAX_COORDINATOR_ADDRESS`` etc.).  After this, ``jax.devices()``
    spans every process and collectives cross DCN.
    """
    import os

    import jax

    if (coordinator_address is None and num_processes is None
            and not any(v in os.environ for v in (
                "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"))):
        # no coordinator anywhere → single-process run; initialize() would
        # fail cluster auto-detection, and there is nothing to set up
        return
    # idempotence: inspect the runtime state directly rather than parsing
    # initialize()'s error message (brittle across JAX versions)
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    except RuntimeError as e:  # fallback idempotence check
        if "already" not in str(e).lower():
            raise


def shard_configs(
    configs: Sequence[dict],
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
):
    """Strided per-process config shard: process p takes ``configs[p::P]``.

    Returns ``(local_configs, global_indices)``.  Strided (not contiguous)
    so the grid's expensive/cheap configs spread evenly across hosts.
    """
    import jax

    p = jax.process_index() if process_id is None else process_id
    P = jax.process_count() if num_processes is None else num_processes
    idx = np.arange(p, len(configs), P)
    return [configs[i] for i in idx], idx


def run_sweep_multihost(
    configs: Sequence[dict],
    prep,
    n_runs: int = 1,
    verbose: bool = True,
    **kw,
):
    """Run the config grid across every JAX process; every process returns
    the complete, identically-ordered :class:`~mmtpu.sweep.runner.SweepResult`
    for the full grid.

    Call :func:`init_multihost` first (single-process: plain ``run_sweep``
    with one end-of-sweep gather that is a no-op).  Accepts every
    :func:`mmtpu.sweep.run_sweep` keyword; a ``checkpoint_dir`` is suffixed
    per-process so host-local chunk resume keeps working.
    ``return_embeddings=True`` embeddings stay host-local (MB-scale per
    config — not worth a DCN gather); the merged result has
    ``embeddings=None``.
    """
    import jax
    from jax.experimental import multihost_utils

    from mmtpu.sweep.runner import SweepResult, empty_sweep_result, run_sweep

    P = jax.process_count()
    pid = jax.process_index()
    local_cfgs, cfg_idx = shard_configs(configs, pid, P)
    # default-stamp the GLOBAL grid index so two processes never both emit
    # config_num 0,1,... (run_sweep's fallback is the local shard index)
    local_cfgs = [c if "config_num" in c else dict(c, config_num=int(g))
                  for c, g in zip(local_cfgs, cfg_idx)]
    if kw.get("checkpoint_dir"):
        kw = dict(kw, checkpoint_dir=f"{kw['checkpoint_dir']}_p{pid}")
    if verbose:
        print(f"[multihost] process {pid}/{P}: {len(local_cfgs)} of "
              f"{len(configs)} configs on {jax.local_device_count()} "
              "local device(s)")

    # valid_curve columns must be shape-identical across processes for the
    # allgather: each shard's run_sweep sizes them to its OWN epoch max, and
    # an empty shard emits none — normalize to the GLOBAL grid width here
    vc_full = 0
    if kw.get("validation_curve"):
        vc_full = max(int(c.get("n_epochs", 100)) for c in configs) + 1

    if local_cfgs:
        local = run_sweep(local_cfgs, prep, n_runs=n_runs, verbose=verbose, **kw)
        if vc_full:
            vc = local.metrics["valid_curve"]
            if vc.shape[-1] < vc_full:
                vc = np.pad(vc, ((0, 0), (0, vc_full - vc.shape[-1])),
                            constant_values=np.nan)
            local.metrics["valid_curve"] = vc
    else:
        # empty shard (more processes than configs): still participate in the
        # allgather below — the other processes block on this one
        local = empty_sweep_result(prep, valid_curve_len=vc_full)

    # Shard skew is unbounded (uneven shards, cold compiles), but the Gloo
    # collective below has a bounded timeout — so rendezvous first on the
    # coordination service, whose barrier timeout we control.  Without this,
    # a fast (e.g. empty-shard) process times out in process_allgather while
    # a slow peer is still compiling its sweep programs.  The jax._src import
    # is private — if it breaks across JAX versions, fall back to the
    # allgather's own timeout rather than failing the sweep.
    try:
        from jax._src import distributed as _dist
        client = getattr(_dist.global_state, "client", None)
    except Exception:  # pragma: no cover — private-API drift
        client = None
    if client is not None and P > 1:
        client.wait_at_barrier(_barrier_id(configs, n_runs),
                               4 * 3600 * 1000)

    # global expanded order is config-major, run-minor (run_sweep's n_runs
    # expansion); local row (j, r) lands at global (cfg_idx[j]*n_runs + r)
    k_global = len(configs) * n_runs
    pos = (np.repeat(cfg_idx * n_runs, n_runs)
           + np.tile(np.arange(n_runs), len(cfg_idx)))

    def scatter(local_arr):
        local_arr = np.asarray(local_arr, np.float64)
        out = np.full((k_global,) + local_arr.shape[1:], np.nan)
        out[pos] = local_arr
        return out

    cols = {
        "config_nums": scatter(local.config_nums),
        "run_idxs": scatter(local.run_idxs),
        "final_train_loss": scatter(local.final_train_loss),
    }
    cols.update({f"m:{k}": scatter(v) for k, v in local.metrics.items()})

    # ONE DCN gather of the whole sweep's results; every process ends up
    # with identical full-grid arrays (rows this process didn't run are NaN
    # in its copy and real in exactly one other's — combined below)
    gathered = multihost_utils.process_allgather(cols)

    def combine(stack):
        stack = np.asarray(stack, np.float64)
        filled = ~np.isnan(stack)
        first = np.argmax(filled, axis=0)
        return np.take_along_axis(stack, first[None], axis=0)[0]

    merged = {k: combine(v) for k, v in gathered.items()}
    return SweepResult(
        config_nums=merged["config_nums"].astype(np.int64),
        run_idxs=merged["run_idxs"].astype(np.int64),
        final_train_loss=merged["final_train_loss"].astype(np.float32),
        metrics={k[2:]: v.astype(np.float32)
                 for k, v in merged.items() if k.startswith("m:")},
        wall_time_s=local.wall_time_s,
        n_configs=k_global,
        compile_time_s=local.compile_time_s,
        chunk_stats=local.chunk_stats,  # this process's chunks only
    )
