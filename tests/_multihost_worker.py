"""Subprocess worker for tests/test_multihost.py — one JAX process of a
multi-process CPU cluster running its shard of the sweep."""

import json
import os
import sys
import time

import jax

# select the CPU backend before any platform init (the axon sitecustomize
# force-selects its backend otherwise — CLAUDE.md)
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    # optional: limit grid to N configs and strip explicit config_num
    # (exercises the empty-shard + global-index-stamping paths)
    limit = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    from mmtpu.parallel.multihost import init_multihost, run_sweep_multihost
    from tests.test_sweep import _grid4, _tiny_prep

    init_multihost(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    cfgs = _grid4()
    if limit:
        cfgs = cfgs[:limit]
        for c in cfgs:
            c.pop("config_num", None)

    # optional per-process artificial skew (seconds), e.g. "30,0" delays
    # process 0 by 30 s — exercises the pre-gather rendezvous barrier
    skew = os.environ.get("MMTPU_TEST_SWEEP_SKEW_S", "")
    if skew:
        time.sleep(float(skew.split(",")[pid]))

    # optional: validation-curve mode — with an empty shard this exercises
    # the allgather schema normalization (the empty process must emit a
    # valid_curve column of the GLOBAL grid width)
    vc = os.environ.get("MMTPU_TEST_VALID_CURVE") == "1"

    res = run_sweep_multihost(cfgs, _tiny_prep(), batch_size=8, verbose=False,
                              validation_curve=vc)
    json.dump(
        {
            "process": pid,
            "config_nums": res.config_nums.tolist(),
            "run_idxs": res.run_idxs.tolist(),
            "final_train_loss": res.final_train_loss.tolist(),
            "metrics": {k: v.tolist() for k, v in res.metrics.items()},
        },
        open(out_path, "w"),
    )


if __name__ == "__main__":
    main()
