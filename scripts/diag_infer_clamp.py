"""A/B the single-batch inference clamp on-chip (VERDICT r4 weak #3).

``infer_batch_clamp`` shrinks a SINGLE-BATCH inference fit's static batch
to the next batch-size multiple >= the split's row count (MOSI valid: 229
rows at the reference's batch*8=512 → 256, halving that phase's padded
compute).  The win was argued from FLOPs and numerics-tested on CPU; this
measures it on-chip, both arms on the same relay instance (exec is
instance-stable to ~3%, CLAUDE.md).

MEASURED 2026-08-18 (docs/measurements/r5/clamp.log, 32-config adam200):
clamp ON 18.57 s vs OFF 17.13 s steady-state exec — the clamp is 0.92x
(SLOWER), loss delta 0.0.  The padded rows were masked dead compute XLA
already handled; the clamp only added an executable shape.  Default flipped
OFF in round 5 (SweepStatics.infer_batch_clamp).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/diag_infer_clamp.py
       [--configs 32] [--chunk 32] [--bucket adam200] [--repeat 2]
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
    p.add_argument("--configs", type=int, default=32)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--bucket", default="adam200")
    p.add_argument("--repeat", type=int, default=2)
    args = p.parse_args(argv)

    from mmtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmtpu.config import make_grid
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset
    from mmtpu.sweep import run_sweep

    opt = "adam" if args.bucket.startswith("adam") else "sgd"
    ne = int(args.bucket[len(opt):])
    ds = synthesize_dataset(
        "mosi", n_train=1284, n_valid=229, n_test=686,
        vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
    )
    prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
    cfgs = [c for c in make_grid()
            if (c.get("optimizer"), c.get("n_epochs")) == (opt, ne)
            ][: args.configs]

    results = {}
    for rep in range(args.repeat):
        for label, clamp in (("clamp_on", True), ("clamp_off", False)):
            res = run_sweep(cfgs, prep, batch_size=64, chunk_size=args.chunk,
                            verbose=False, infer_batch_clamp=clamp)
            rec = results.setdefault(label, {"exec_s": [], "loss": None})
            rec["exec_s"].append(round(res.exec_time_s, 2))
            rec["loss"] = np.asarray(res.final_train_loss)
            print(f"[clamp-ab] rep{rep} {label}: exec={res.exec_time_s:.2f}s "
                  f"(compile {res.compile_time_s:.1f}s)", flush=True)

    a, b = results["clamp_on"]["loss"], results["clamp_off"]["loss"]
    fin = np.isfinite(a) & np.isfinite(b)
    on_b = min(results["clamp_on"]["exec_s"])
    off_b = min(results["clamp_off"]["exec_s"])
    print(json.dumps({
        "bucket": args.bucket, "n_configs": len(cfgs),
        "clamp_on_exec_s": results["clamp_on"]["exec_s"],
        "clamp_off_exec_s": results["clamp_off"]["exec_s"],
        "speedup_best": round(off_b / max(on_b, 1e-9), 4),
        "max_rel_loss_delta": float(
            np.max(np.abs(a[fin] - b[fin])
                   / np.maximum(np.abs(b[fin]), 1e-9))) if fin.any() else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
