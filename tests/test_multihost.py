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


@pytest.mark.slow
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


@pytest.mark.slow
def test_two_process_sweep_empty_shard(tmp_path):
    """1 config over 2 processes: process 1's shard is EMPTY; it must still
    participate in the allgather (a crash here used to hang the whole job),
    and config_num defaults to the GLOBAL grid index, not the local one."""
    outs = [tmp_path / f"res_{p}.json" for p in range(2)]
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests/_multihost_worker.py"),
             str(p), "2", "19747", str(outs[p]), "1"],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["config_nums"] == [0]
        assert np.isfinite(r["final_train_loss"]).all()
    np.testing.assert_array_equal(
        results[0]["final_train_loss"], results[1]["final_train_loss"])


@pytest.mark.slow
def test_two_process_empty_shard_validation_curve(tmp_path):
    """1 config + --validation_curve over 2 processes: the empty shard emits
    no valid_curve on its own, and a non-empty shard sizes the curve to its
    LOCAL epoch max — both must be normalized to the global grid width or
    process_allgather sees mismatched pytrees (the round-3 verdict's hang
    class, VERDICT.md §weak 5)."""
    outs = [tmp_path / f"res_{p}.json" for p in range(2)]
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["MMTPU_TEST_VALID_CURVE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests/_multihost_worker.py"),
             str(p), "2", "19751", str(outs[p]), "1"],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    results = [json.load(open(o)) for o in outs]
    for r in results:
        vc = np.asarray(r["metrics"]["valid_curve"], np.float64)
        # global width = grid-wide n_epochs_max + 1 (config 0 has n_epochs=2)
        assert vc.shape == (1, 3)
        assert np.isfinite(vc).any()
    np.testing.assert_array_equal(
        np.asarray(results[0]["metrics"]["valid_curve"]),
        np.asarray(results[1]["metrics"]["valid_curve"]),
    )


def test_empty_sweep_result_valid_curve_schema():
    """empty_sweep_result(valid_curve_len=W) must add the (0, W) column a
    validation_curve sweep emits."""
    from mmtpu.sweep.runner import empty_sweep_result

    class _P:
        name = "mosi"
        labels = {"test": np.zeros((6,), np.float32)}

    empty = empty_sweep_result(_P(), valid_curve_len=4)
    assert empty.metrics["valid_curve"].shape == (0, 4)
    assert "valid_curve" not in empty_sweep_result(_P()).metrics


def test_metric_schema_matches_metric_fns():
    """empty_sweep_result's hardcoded schema must track the real metric fns
    (keys AND trailing shapes) for every dataset."""
    import jax.numpy as jnp

    from mmtpu.eval.metrics import iemocap_metrics, mosi_metrics, pom_metrics
    from mmtpu.sweep.runner import empty_sweep_result, metric_schema

    class _P:
        def __init__(self, name, labels):
            self.name = name
            self.labels = labels

    cases = {
        "mosi": (mosi_metrics, np.zeros((6,), np.float32)),
        "pom": (pom_metrics, np.zeros((6, 17), np.float32)),
        "iemocap": (iemocap_metrics, np.zeros((6, 2), np.float32)),
    }
    for name, (fn, y) in cases.items():
        prep = _P(name, {"test": y})
        got = fn(jnp.asarray(y) + 0.5, jnp.asarray(y))
        schema = metric_schema(prep)
        assert set(schema) == set(got), name
        for k, s in schema.items():
            assert np.shape(got[k]) == s, (name, k)
        empty = empty_sweep_result(prep)
        assert empty.n_configs == 0
        for k, s in schema.items():
            assert empty.metrics[k].shape == (0,) + s


def test_init_multihost_no_coordinator_is_noop(monkeypatch):
    """Single-process runs (the CLI --multihost flag without a cluster) must
    not attempt jax.distributed.initialize auto-detection."""
    import jax

    from mmtpu.parallel.multihost import init_multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)

    def boom(*a, **k):  # pragma: no cover - called only on regression
        raise AssertionError("initialize() must not be called")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    init_multihost()  # no coordinator anywhere -> early return


def test_cli_multihost_single_process(tmp_path, monkeypatch):
    """`mmtpu.sweep --multihost` degrades to a plain single-process sweep
    when no coordinator is configured (process_count == 1)."""
    import mmtpu.data.registry as reg
    from mmtpu.sweep import __main__ as cli

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    orig = reg.synthesize_dataset
    monkeypatch.setattr(
        reg, "synthesize_dataset",
        lambda name, seed=0: orig(
            name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
            embed_dim=12, audio_dim=5, visual_dim=4, seed=seed,
        ),
    )
    rc = cli.main([
        "mosi", "--limit", "2", "--chunk_size", "2", "--batch_size", "8",
        "--multihost", "--data_dir", str(tmp_path / "nodata"),
        "--out", str(tmp_path / "results"), "--name", "mh1",
    ])
    assert rc == 0
    summary = json.load(open(tmp_path / "results" / "mh1_summary.json"))
    assert summary["n_configs"] == 2
    # artifact hygiene: exec-vs-compile split + per-chunk stats recorded
    assert summary["exec_time_s"] >= 0
    assert summary["wall_time_s"] >= summary["exec_time_s"]
    assert isinstance(summary["chunks"], list) and summary["chunks"]
    assert {"chunk", "kind", "configs", "done_at_s"} <= set(summary["chunks"][0])
