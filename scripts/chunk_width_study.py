"""Chunk-width scaling study (VERDICT r3 §6): is the round-1 width-32 cap
still right after the round-3 per-chunk speedups?

Round 1 measured two failure modes that set the cap (CLAUDE.md):
- single dispatches > ~5 min hit the relay timeout ("UNAVAILABLE: TPU
  device error") — round-3 chunks run ~8 s, leaving ~35x headroom;
- >=64-wide vmapped programs failed to COMPILE remotely.

This script re-probes widths on the same relay instance back-to-back
(exec_time_s is instance-stable to ~3%; totals are not — BASELINE.md),
running the same N grid configs at each width and reporting exec s/config.

Usage:  python scripts/chunk_width_study.py [--chunks_per_width 2] [--widths 32,48,64]
(n_configs per width = width x chunks_per_width, so no chunk is padded.)
Emits a row per width + one JSON line; non-fatal per-width failures are
recorded (a width that fails to compile/dispatch is a data point, not an
error).
"""

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks_per_width", type=int, default=2,
                    help="full chunks per width (n_configs = width x this, "
                         "so no chunk is padded — padding would distort the "
                         "per-config comparison)")
    ap.add_argument("--widths", default="32,48,64")
    ap.add_argument("--bucket", default="adam,200",
                    help="optimizer,n_epochs bucket to draw configs from "
                         "(bucket-homogeneous like production grid chunks)")
    ap.add_argument("--epochs_override", type=int, default=0,
                    help="override every config's n_epochs (0 = grid values)")
    ap.add_argument("--no_pallas", action="store_true",
                    help="force the XLA word-likelihood path — isolates "
                         "whether a width-dependent failure (r5: widths "
                         "48/64 crash the TPU worker) comes from the Mosaic "
                         "kernel or the program at large")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

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
    opt, ne = args.bucket.split(",")
    bucket = [c for c in make_grid()
              if (c.get("optimizer"), c.get("n_epochs")) == (opt, int(ne))]
    if args.epochs_override:
        bucket = [dict(c, n_epochs=args.epochs_override) for c in bucket]

    rows = []
    for w in widths:
        cfgs = bucket[: w * args.chunks_per_width]
        if len(cfgs) < w * args.chunks_per_width:
            rows.append({"width": w, "error": "bucket too small"})
            continue
        t0 = time.time()
        try:
            res = run_sweep(cfgs, prep, batch_size=64, chunk_size=w,
                            verbose=False,
                            use_pallas=False if args.no_pallas else None)
            # run_sweep retries a failing width at w/2 internally — surface
            # that as the EFFECTIVE width so the table can't silently lie
            eff = max((cs["configs"] for cs in res.chunk_stats or []),
                      default=0)
            row = {
                "width": w,
                "effective_width": eff,
                "exec_s": round(res.exec_time_s, 2),
                "compile_s": round(res.compile_time_s, 2),
                "wall_s": round(res.wall_time_s, 2),
                "exec_s_per_config": round(res.exec_time_s / res.n_configs, 4),
                "n_chunks": len(res.chunk_stats or []),
            }
        except Exception as e:  # a failing width is a result, not an error
            row = {"width": w, "error": f"{type(e).__name__}: {e}"[:300],
                   "wall_s": round(time.time() - t0, 2)}
        rows.append(row)
        print(f"[width {w}] {row}", file=sys.stderr, flush=True)

    print(json.dumps({"bucket": args.bucket,
                      "chunks_per_width": args.chunks_per_width,
                      "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
