"""Multi-host sweep: two real JAX processes (Gloo collectives over
localhost) must produce the single-process result exactly.

The reference is a single process on a single device (SURVEY.md §2 row 23);
mmtpu's multi-host tier shards the config axis across processes with one
end-of-sweep DCN gather (mmtpu/parallel/multihost.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mmtpu.parallel.multihost import shard_configs
from mmtpu.sweep import run_sweep
from tests.test_sweep import _grid4, _tiny_prep

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shard_configs_partition():
    cfgs = _grid4()
    seen = []
    for p in range(3):
        local, idx = shard_configs(cfgs, process_id=p, num_processes=3)
        assert [cfgs[i] for i in idx] == local
        seen.extend(idx.tolist())
    assert sorted(seen) == list(range(len(cfgs)))


def test_two_process_sweep_matches_single(tmp_path):
    """Spawn a 2-process CPU cluster; every process must return the full,
    identically-ordered grid, equal to the single-process sweep."""
    outs = [tmp_path / f"res_{p}.json" for p in range(2)]
    env = dict(os.environ)
    # prepend (never clobber — the image routes its TPU plugin via PYTHONPATH)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no virtual-device split inside the workers
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests/_multihost_worker.py"),
             str(p), "2", "19743", str(outs[p])],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    # both processes hold the identical full-grid result
    for key in ("config_nums", "run_idxs", "final_train_loss"):
        np.testing.assert_array_equal(results[0][key], results[1][key])
    for k in results[0]["metrics"]:
        np.testing.assert_array_equal(
            results[0]["metrics"][k], results[1]["metrics"][k]
        )

    # ... and it equals the single-process sweep (per-config fold-in RNG
    # makes results invariant to the config-axis layout)
    ref = run_sweep(_grid4(), _tiny_prep(), batch_size=8, verbose=False)
    np.testing.assert_array_equal(results[0]["config_nums"], ref.config_nums)
    np.testing.assert_allclose(
        results[0]["final_train_loss"], ref.final_train_loss,
        rtol=1e-5, atol=1e-6,
    )
    for k, v in ref.metrics.items():
        np.testing.assert_allclose(
            results[0]["metrics"][k], np.asarray(v), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
