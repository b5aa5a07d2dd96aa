"""A/B the fused decoder-update kernel on the production sweep, on-chip.

The Adam chunk's floor is decoder weight/moment HBM traffic: XLA's fusions
already move ~94% of the minimal bytes but at only ~55% of HBM peak (36
skinny per-head fusions, dead lanes on 80/53-wide heads — docs/DESIGN.md
"Quantified floor").  ``fused_dec_update`` streams the stacked weight set
once per step through one Pallas pass per leaf (bwd-GEMM + optimizer + the
latent cotangent).  This measures what that buys end-to-end on the
bucket-homogeneous production chunk shape — run both arms on the SAME relay
instance, minutes apart (CLAUDE.md: exec is instance-stable to ~3%).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/diag_fused_dec.py
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
    p.add_argument("--bucket", default="adam200",
                   help="optimizer+epochs bucket, e.g. adam200 / sgd100")
    p.add_argument("--repeat", type=int, default=2,
                   help="timed repeats per arm (first run eats compile)")
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
    if len(cfgs) < args.configs:
        print(f"[fused-ab] bucket {args.bucket} has only {len(cfgs)} configs")

    results = {}
    # interleave arms per repeat so relay drift hits both equally
    for rep in range(args.repeat):
        for label, fused in (("baseline", False), ("fused", True)):
            res = run_sweep(cfgs, prep, batch_size=64, chunk_size=args.chunk,
                            verbose=False, fused_dec_update=fused)
            rec = results.setdefault(label, {"exec_s": [], "compile_s": [],
                                             "loss": None})
            rec["exec_s"].append(round(res.exec_time_s, 2))
            rec["compile_s"].append(round(res.compile_time_s, 2))
            rec["loss"] = np.asarray(res.final_train_loss)
            print(f"[fused-ab] rep{rep} {label}: exec={res.exec_time_s:.2f}s "
                  f"(compile {res.compile_time_s:.1f}s)", flush=True)

    a = results["fused"]["loss"]
    b = results["baseline"]["loss"]
    fin = np.isfinite(a) & np.isfinite(b)
    best_f = min(results["fused"]["exec_s"])
    best_b = min(results["baseline"]["exec_s"])
    out = {
        "bucket": args.bucket,
        "n_configs": len(cfgs),
        "chunk": args.chunk,
        "baseline_exec_s": results["baseline"]["exec_s"],
        "fused_exec_s": results["fused"]["exec_s"],
        "speedup_best": round(best_b / max(best_f, 1e-9), 4),
        "max_rel_loss_delta": float(
            np.max(np.abs(a[fin] - b[fin])
                   / np.maximum(np.abs(b[fin]), 1e-9))) if fin.any() else None,
        "n_finite_both": int(fin.sum()),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
