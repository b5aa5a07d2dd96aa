"""bf16-vs-f32 matmul precision study for the sweep (VERDICT r2 weak §3).

The TPU's default f32-matmul mode truncates inputs to bf16 (CLAUDE.md);
``--precision highest`` keeps full f32 at ~2-8x matmul cost.  mmtpu sweeps
run the DEFAULT (bf16) — this script measures what that costs in accuracy,
against the same sweep at ``highest``, to justify (or revoke) the default:

- per-config final train loss deltas,
- per-config downstream test metric deltas (the quantities the reference
  actually reports — losses.py:276-366),
- exec-time ratio (the would-be win of bf16).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/study_precision.py
       [--configs 8] [--chunk 8] [--out PRECISION_STUDY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", type=int, default=8)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--out", default="PRECISION_STUDY.json")
    args = p.parse_args(argv)

    import jax

    from mmtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmtpu.config import make_grid
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset
    from mmtpu.sweep import run_sweep

    ds = synthesize_dataset(
        "mosi", n_train=1284, n_valid=229, n_test=686,
        vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
    )
    prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
    cfgs = make_grid()[: args.configs]

    runs = {}
    for prec in ("default", "highest"):
        jax.config.update(
            "jax_default_matmul_precision",
            None if prec == "default" else "highest",
        )
        res = run_sweep(cfgs, prep, batch_size=64, chunk_size=args.chunk,
                        verbose=False)
        runs[prec] = res
        print(f"[precision] {prec}: exec={res.exec_time_s:.1f}s "
              f"(compile {res.compile_time_s:.1f}s)", flush=True)

    lo, hi = runs["default"], runs["highest"]
    finite = np.isfinite(lo.final_train_loss) & np.isfinite(hi.final_train_loss)
    report = {
        "n_configs": int(args.configs),
        "n_finite_both": int(finite.sum()),
        "exec_s": {"bf16_default": round(lo.exec_time_s, 2),
                   "f32_highest": round(hi.exec_time_s, 2)},
        "exec_speedup_bf16": round(hi.exec_time_s / max(lo.exec_time_s, 1e-9), 3),
        "divergence_agreement": bool(
            (np.isfinite(lo.final_train_loss)
             == np.isfinite(hi.final_train_loss)).all()),
        "loss_max_rel_delta": float(np.max(np.abs(
            lo.final_train_loss[finite] - hi.final_train_loss[finite])
            / np.maximum(np.abs(hi.final_train_loss[finite]), 1e-9)))
        if finite.any() else None,
        "metric_max_abs_delta": {},
    }
    for k in hi.metrics:
        a = np.asarray(lo.metrics[k], np.float64)[finite]
        b = np.asarray(hi.metrics[k], np.float64)[finite]
        m = ~(np.isnan(a) | np.isnan(b))
        report["metric_max_abs_delta"][k] = (
            float(np.max(np.abs(a[m] - b[m]))) if m.any() else None)

    json.dump(report, open(args.out, "w"), indent=2)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
