"""bench._sweep_rate runs the composed sweep TWICE — run 1 absorbs
compile/load plus the relay's first-dispatch settling (~2.4x steady state,
measured 2026-08-18, docs/measurements/r5/*.log) and is booked as
``sweep_settle_exec_s``; run 2 is the steady-state ``sweep_exec_s``
production sweeps see chunk after chunk.  Stubbed run_sweep (the
test_diag_scripts pattern) so the accounting is pinned without a chip."""

import numpy as np


def test_sweep_rate_double_run_books_settle_and_steady_state(monkeypatch):
    import bench
    import mmtpu.data.synthetic as syn
    import mmtpu.sweep as sweep_pkg
    from mmtpu.sweep.runner import SweepResult

    orig = syn.synthesize_dataset

    def tiny(name, **kw):
        return orig(name, n_train=24, n_valid=8, n_test=10, vocab_size=50,
                    embed_dim=12, audio_dim=5, visual_dim=4)

    monkeypatch.setattr(syn, "synthesize_dataset", tiny)

    calls = []
    # (wall, compile) per call: run 1 settling (incl. cached-compile load),
    # run 2 steady state, phase-split rerun
    timings = [(10.0, 6.0), (2.0, 0.0), (9.0, 5.0)]

    def fake_run_sweep(cfgs, prep, **kw):
        calls.append(kw)
        n = len(cfgs)
        wall, comp = timings[min(len(calls) - 1, 2)]
        chunk_stats = None
        if kw.get("phase_timing"):
            chunk_stats = [{
                "chunk": "adam200_0", "kind": "adam", "configs": n,
                "done_at_s": wall,
                "phases": {"train": 3.0, "valid_infer": 0.5,
                           "test_infer": 1.0, "sentiment": 0.4,
                           "metrics": 0.1},
            }]
        return SweepResult(
            config_nums=np.arange(n, dtype=np.int64),
            run_idxs=np.zeros(n, np.int64),
            final_train_loss=np.full(n, 3.0, np.float32),
            metrics={},
            wall_time_s=wall, n_configs=n, compile_time_s=comp,
            chunk_stats=chunk_stats,
        )

    monkeypatch.setattr(sweep_pkg, "run_sweep", fake_run_sweep)
    monkeypatch.setenv("MMTPU_BENCH_PHASES", "1")
    monkeypatch.setenv("MMTPU_BENCH_SWEEP_N", "4")

    out = bench._sweep_rate()

    # two composed runs + one phase-split rerun, in that order
    assert len(calls) == 3
    assert not calls[0].get("phase_timing") and not calls[1].get("phase_timing")
    assert calls[2]["phase_timing"] is True
    # run 1 → settle exec (wall − compile) and the compile/load bill
    assert out["sweep_settle_exec_s"] == 4.0
    assert out["sweep_compile_s"] == 6.0
    # run 2 → steady-state exec and the production configs/hour rate
    assert out["sweep_exec_s"] == 2.0
    assert out["sweep_configs_per_hour"] == round(4 / 2.0 * 3600, 1)
    # phase fields ride the rerun's chunk_stats
    assert out["sweep_phase_s"]["train"] == 3.0
    assert out["sweep_infer_share_pct"] == 30.0  # (0.5+1.0) / 5.0
    assert out["sweep_train_mfu_pct"] > 0
