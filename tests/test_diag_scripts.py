"""The on-chip A/B scripts (scripts/diag_*.py) must be plumbing-correct
BEFORE a healthy relay window — a NameError mid-measurement wastes the
scarce capture opportunity (CLAUDE.md: outages last hours).  These smokes
run each script's main() with a stubbed run_sweep and tiny synthetic data,
checking argument wiring, arm scheduling, and the JSON summary line."""

import json
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture
def fake_env(monkeypatch):
    import mmtpu.data.synthetic as syn
    import mmtpu.sweep as sweep_pkg
    from mmtpu.sweep.runner import SweepResult

    orig = syn.synthesize_dataset

    def tiny(name, **kw):
        return orig(name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
                    embed_dim=12, audio_dim=5, visual_dim=4)

    monkeypatch.setattr(syn, "synthesize_dataset", tiny)
    calls = []

    def fake_run_sweep(cfgs, prep, **kw):
        calls.append(kw)
        n = len(cfgs)
        return SweepResult(
            config_nums=np.arange(n, dtype=np.int64),
            run_idxs=np.zeros(n, np.int64),
            final_train_loss=np.full(n, 3.0, np.float32),
            metrics={k: np.full(n, 0.5, np.float32)
                     for k in ("mae", "corr", "mult_acc", "f_score",
                               "accuracy")},
            wall_time_s=2.0, n_configs=n, compile_time_s=1.0,
        )

    monkeypatch.setattr(sweep_pkg, "run_sweep", fake_run_sweep)
    return calls


def _last_json(capsys):
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    assert lines, "script printed no JSON summary line"
    return json.loads(lines[-1])


def test_diag_infer_clamp_plumbing(fake_env, capsys):
    import diag_infer_clamp

    rc = diag_infer_clamp.main(["--configs", "4", "--repeat", "1"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["n_configs"] == 4 and out["speedup_best"] > 0
    # one clamp-on and one clamp-off arm, in that order
    assert [kw["infer_batch_clamp"] for kw in fake_env] == [True, False]


def test_diag_warm_start_plumbing(fake_env, capsys):
    import diag_warm_start

    rc = diag_warm_start.main(["--configs", "4", "--repeat", "1",
                               "--cap", "50"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["cap"] == 50 and out["speedup_best"] > 0
    assert fake_env[0].get("infer_warm_start", False) is False
    assert fake_env[1]["infer_warm_start"] is True
    assert fake_env[1]["infer_epochs_cap"] == 50


def test_diag_fused_dec_plumbing(fake_env, capsys):
    import diag_fused_dec

    rc = diag_fused_dec.main(["--configs", "4", "--repeat", "1"])
    assert rc == 0
    out = _last_json(capsys)
    assert out["n_configs"] == 4 and out["n_finite_both"] == 4
    assert [kw["fused_dec_update"] for kw in fake_env] == [False, True]
