"""A/B the closed-form inference warm start + epoch cap on-chip
(VERDICT r4 task 4).

The reference fits valid/test latents from SIF init for the config's FULL
n_epochs with a frozen decoder (simplesif.py:607-610).  The opt-in warm
start (mmtpu/train/warm_start.py) initializes from the trained decoder's
closed-form estimate and caps the inference scan length
(SweepStatics.infer_epochs_cap), cutting that phase's compute by
~(1 - cap/n_epochs).  This measures the end-to-end exec win AND the metric
envelope (the accuracy cost of the approximation) on the production
bucket-homogeneous chunk shape — both arms on the same relay instance.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/diag_warm_start.py
       [--configs 32] [--chunk 32] [--bucket adam200] [--cap 50] [--repeat 2]
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
    p.add_argument("--cap", type=int, default=50)
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

    arms = (("baseline", {}),
            ("warm_cap", {"infer_warm_start": True,
                          "infer_epochs_cap": args.cap}))
    results = {}
    for rep in range(args.repeat):
        for label, kw in arms:
            res = run_sweep(cfgs, prep, batch_size=64, chunk_size=args.chunk,
                            verbose=False, **kw)
            rec = results.setdefault(label, {"exec_s": [], "metrics": None})
            rec["exec_s"].append(round(res.exec_time_s, 2))
            rec["metrics"] = {k: np.asarray(v)
                              for k, v in res.metrics.items()}
            print(f"[warm-ab] rep{rep} {label}: exec={res.exec_time_s:.2f}s "
                  f"(compile {res.compile_time_s:.1f}s)", flush=True)

    base_b = min(results["baseline"]["exec_s"])
    warm_b = min(results["warm_cap"]["exec_s"])
    env = {}
    for k, bv in results["baseline"]["metrics"].items():
        wv = results["warm_cap"]["metrics"][k]
        fin = np.isfinite(bv) & np.isfinite(wv)
        env[k] = (float(np.max(np.abs(wv[fin] - bv[fin]))) if fin.any()
                  else None)
    print(json.dumps({
        "bucket": args.bucket, "n_configs": len(cfgs), "cap": args.cap,
        "baseline_exec_s": results["baseline"]["exec_s"],
        "warm_cap_exec_s": results["warm_cap"]["exec_s"],
        "speedup_best": round(base_b / max(warm_b, 1e-9), 4),
        "max_abs_metric_delta": env,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
