"""A/B the stacked-decoder layout on the production sweep (docs/DESIGN.md).

``stack_decoder`` turns the 12 per-head linears into one wide GEMM and the
decoder optimizer state into 4 large leaves.  DESIGN.md's round-2 profile
attributed 1.86 s of a 6.20 s SGD chunk to the head projections and +70%
Adam-over-SGD chunk cost to optimizer traffic — this measures what stacking
buys end-to-end, on-chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/diag_stacked.py
       [--configs 16] [--chunk 16]
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
    p.add_argument("--configs", type=int, default=16)
    p.add_argument("--chunk", type=int, default=16)
    args = p.parse_args(argv)

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

    # stacked_heads is DEFAULT OFF (measured slower — docs/DESIGN.md); force
    # it per arm by wrapping the spec constructors the sweep runner uses
    import functools

    import mmtpu.sweep.runner as mrun

    orig_l, orig_e = mrun.LatentFitSpec, mrun.E2EFitSpec
    results = {}
    for label in ("stacked", "per_head"):
        if label == "stacked":
            mrun.LatentFitSpec = functools.partial(orig_l, stacked_heads=True)
            mrun.E2EFitSpec = functools.partial(orig_e, stacked_heads=True)
        try:
            res = run_sweep(cfgs, prep, batch_size=64, chunk_size=args.chunk,
                            verbose=False)
        finally:
            mrun.LatentFitSpec, mrun.E2EFitSpec = orig_l, orig_e
        results[label] = {
            "exec_s": round(res.exec_time_s, 2),
            "compile_s": round(res.compile_time_s, 2),
            "loss": np.asarray(res.final_train_loss),
        }
        print(f"[stacked-ab] {label}: exec={res.exec_time_s:.1f}s "
              f"(compile {res.compile_time_s:.1f}s)", flush=True)

    a, b = results["stacked"]["loss"], results["per_head"]["loss"]
    fin = np.isfinite(a) & np.isfinite(b)
    out = {
        "n_configs": args.configs,
        "stacked_exec_s": results["stacked"]["exec_s"],
        "per_head_exec_s": results["per_head"]["exec_s"],
        "speedup": round(results["per_head"]["exec_s"]
                         / max(results["stacked"]["exec_s"], 1e-9), 3),
        "loss_max_rel_delta": float(np.max(
            np.abs(a[fin] - b[fin]) / np.maximum(np.abs(b[fin]), 1e-9)))
        if fin.any() else None,
        "divergence_agreement": bool((np.isfinite(a) == np.isfinite(b)).all()),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
