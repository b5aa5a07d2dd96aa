#!/usr/bin/env python
"""POM at REAL geometry on the TPU — the measured run for SURVEY §7's
"ragged POM sequences" hard part.

Real POM (reference utils.py:52-90 + shipped id arrays): 600/100/203
utterances, token-id rows up to 1357 long (pom_test_ids.npy is (203, 1357)),
vocab 9206×300, 17 trait labels, 20-step aligned a/v streams.  The reference
pre-gathers (N, L, 300) float text tensors — ~2.2 GB at this length — and
upstream punted with a commented-out MAXLEN=2000 truncation (utils.py:77-80).
mmtpu's ids-based text stream gathers per-token vectors inside the step, so
full-length POM trains without truncation.

Usage: python scripts/bench_pom_fullscale.py [--n_configs 8] [--chunk 8]
Prints one JSON line with the timing.
"""

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_configs", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--text_len", type=int, default=1357)
    ap.add_argument("--n_epochs", type=int, default=100)
    args = ap.parse_args(argv)

    from mmtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from mmtpu.config import make_grid
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset
    from mmtpu.sweep import run_sweep

    ds = synthesize_dataset(
        "pom", n_train=600, n_valid=100, n_test=203, vocab_size=9206,
        embed_dim=300, audio_dim=43, visual_dim=43, text_len=args.text_len,
    )
    prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
    cfgs = [dict(c, n_epochs=args.n_epochs) for c in make_grid()[: args.n_configs]]

    t0 = time.time()
    res = run_sweep(cfgs, prep, batch_size=64, chunk_size=args.chunk)
    wall = time.time() - t0
    finite = int(np.isfinite(res.final_train_loss).sum())
    print(json.dumps({
        "metric": "POM full-length sweep (L=%d ids, real geometry)" % args.text_len,
        "n_configs": res.n_configs,
        "wall_time_s": round(wall, 1),
        "compile_time_s": round(res.compile_time_s, 1),
        "exec_s": round(wall - res.compile_time_s, 1),
        "configs_per_hour": round(res.n_configs / wall * 3600, 1),
        "finite_configs": finite,
        "mean_trait_corr_best": float(np.nanmax(
            np.nanmean(np.asarray(res.metrics["corr"]), axis=-1))),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
