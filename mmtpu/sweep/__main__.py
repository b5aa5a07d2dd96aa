"""Sweep CLI — run the hyperparameter grid in-process on the device mesh.

Replaces the reference's 512 serial ``simplesif.py`` invocations
(``README.md:13-24``) with one command::

    python -m mmtpu.sweep mosi                      # full 512-config grid
    python -m mmtpu.sweep mosi --configs_dir configs/multimodal_search
    python -m mmtpu.sweep mosi --limit 100 --chunk_size 32
    python -m mmtpu.sweep mosi --resume_dir sweep_ckpt   # crash-resumable

Writes ``results/<name>.csv`` (compatible with scripts/make_result_table.py
output) and a JSON summary.
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="mmtpu.sweep", description=__doc__)
    parser.add_argument("dataset", choices=["mosi", "pom", "iemocap"])
    parser.add_argument("--configs_dir",
                        help="directory of config_<i>.json files; default: "
                             "generate the reference grid in memory")
    parser.add_argument("--limit", type=int, help="run only the first N configs")
    parser.add_argument("--chunk_size", type=int,
                        help="configs per compiled program (bounds HBM; keep "
                             "<=32 on relay-tunneled TPUs — see CLAUDE.md)")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--unimodal", action="store_true")
    parser.add_argument("--emotion", choices=["happy", "angry", "neutral", "sad"])
    parser.add_argument("--data_dir", default=".")
    parser.add_argument("--name", default="sweep")
    parser.add_argument("--out", default="results")
    parser.add_argument("--resume_dir", help="chunk checkpoint dir (resume here)")
    parser.add_argument("--mesh", action="store_true",
                        help="shard the config axis across all devices")
    parser.add_argument("--multihost", action="store_true",
                        help="shard the config axis across JAX processes "
                             "(launch one process per host; coordinator via "
                             "the standard env vars / cluster auto-detect — "
                             "see mmtpu.parallel.multihost)")
    parser.add_argument("--pallas", action="store_true",
                        help="force the fused Pallas angular-partition kernel "
                             "on (default: auto — on for TPU backends)")
    parser.add_argument("--no_pallas", action="store_true",
                        help="force the fused kernel off")
    parser.add_argument("--fused_dec", action="store_true",
                        help="fused decoder-update Pallas kernel on the "
                             "train fit (kernels/decoder_update.py) — "
                             "opt-in pending the on-chip A/B")
    parser.add_argument("--exact_adam", action="store_true",
                        help="torch-exact dense Adam instead of the "
                             "epoch-level lazy-Adam fast path (float-"
                             "rounding-level trajectory deltas; see "
                             "mmtpu/train/optim.py)")
    parser.add_argument("--phase_timing", action="store_true",
                        help="DIAGNOSTIC: run each chunk as separate phase "
                             "programs (train / valid fit / test fit / "
                             "sentiment / metrics) and record per-phase "
                             "device seconds in the summary's chunk stats")
    parser.add_argument("--infer_clamp", action="store_true",
                        help="shrink single-batch inference fits' static "
                             "batch to the split's row count (float-"
                             "reduction-order deltas only) — default OFF "
                             "since the round-5 on-chip A/B measured it "
                             "0.92x (docs/measurements/r5/clamp.log)")
    parser.add_argument("--no_infer_clamp", action="store_true",
                        help="(default since round 5; kept for "
                             "compatibility) keep the reference's fixed "
                             "batch_size*8 for single-batch inference fits")
    parser.add_argument("--infer_warm_start", action="store_true",
                        help="initialize valid/test inference fits from the "
                             "trained decoder's closed-form latent estimate "
                             "(train/warm_start.py) instead of the SIF "
                             "embedding — opt-in, NOT reference-parity; "
                             "pair with --infer_epochs")
    parser.add_argument("--infer_epochs", type=int, default=0,
                        help="cap inference-fit epochs (0 = the config's "
                             "full n_epochs, reference semantics) — shrinks "
                             "the inference scan length; opt-in, NOT "
                             "reference-parity")
    parser.add_argument("--top_k_artifacts", type=int, default=0,
                        help="after the sweep, re-run the top-K configs "
                             "through the full runner to persist reference-"
                             "layout artifacts (model_saves/...); the re-run "
                             "uses the same optimizer path that selected the "
                             "config (lazy Adam unless --exact_adam)")
    parser.add_argument("--n_runs", type=int, default=1,
                        help="repetitions per config with independent seeds")
    parser.add_argument("--validation_curve", action="store_true",
                        help="emit per-config recursive validation curves "
                             "(reference cadence 80 epochs; expensive)")
    parser.add_argument("--semi_sup_idxes",
                        choices=["0.%d" % i for i in range(1, 10)],
                        help="semi-supervised labeled fraction (reference "
                             "--semi_sup_idxes): e2e joint losses mask "
                             "unlabeled rows; sentiment trains on the subset")
    parser.add_argument("--unroll", type=int, default=1,
                        help="scan unroll factor (amortizes per-step overhead "
                             "at the cost of compile time)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from mmtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmtpu.config import make_grid
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.registry import load_dataset
    from mmtpu.sweep import run_sweep

    if args.configs_dir:
        configs = []
        for path in sorted(glob.glob(os.path.join(args.configs_dir, "config_*.json"))):
            configs.append(json.load(open(path)))
        configs.sort(key=lambda c: c.get("config_num", 0))
    else:
        configs = make_grid()
    if args.limit:
        configs = configs[: args.limit]
    if not configs:
        print("no configs found", file=sys.stderr)
        return 1

    pos_dims = tuple(sorted({c.get("pos_embed_dim", 0) for c in configs} - {0}))
    t0 = time.time()
    ds = load_dataset(args.dataset, data_dir=args.data_dir, emotion=args.emotion)
    if ds.get("synthetic"):
        print("[mmtpu] real data blobs not found — using synthetic stand-ins")
    prep = prepare_device_data(
        ds,
        pos_mode="shared" if pos_dims else "baked",
        pos_dims=pos_dims or None,
    )
    print(f"[sweep] {len(configs)} configs on {args.dataset} "
          f"(prep {time.time() - t0:.1f}s)")

    if args.multihost:
        # must run BEFORE anything touches jax.devices() (e.g. make_mesh):
        # backend init precludes jax.distributed.initialize
        from mmtpu.parallel.multihost import init_multihost

        init_multihost()

    mesh = None
    if args.mesh:
        import jax

        from mmtpu.parallel import make_mesh

        # multihost: each process sweeps its config shard on its OWN chips
        # (a global-device mesh would device_put to non-addressable devices)
        devices = jax.local_devices() if args.multihost else None
        mesh = make_mesh(devices=devices)
        print(f"[sweep] mesh over {mesh.devices.size} devices")

    mask = None
    if args.semi_sup_idxes:
        from mmtpu.runner import semi_sup_mask

        mask = semi_sup_mask(
            args.dataset, args.semi_sup_idxes,
            prep.labels["train"].shape[0], seed=args.seed,
            data_dir=args.data_dir,
        )
        print(f"[sweep] semi-supervised: {int(mask.sum())} labeled rows")

    sweep_kw = dict(
        batch_size=args.batch_size,
        unimodal=args.unimodal,
        seed=args.seed,
        chunk_size=args.chunk_size,
        mesh=mesh,
        checkpoint_dir=args.resume_dir,
        unroll=args.unroll,
        n_runs=args.n_runs,
        use_pallas=(False if args.no_pallas else (args.pallas or None)),
        senti_mask=mask,
        validation_curve=args.validation_curve,
        lazy_adam=False if args.exact_adam else None,
        infer_batch_clamp=args.infer_clamp and not args.no_infer_clamp,
        phase_timing=args.phase_timing,
        fused_dec_update=args.fused_dec,
        infer_warm_start=args.infer_warm_start,
        infer_epochs_cap=args.infer_epochs,
    )
    if args.multihost:
        from mmtpu.parallel.multihost import run_sweep_multihost

        res = run_sweep_multihost(configs, prep, **sweep_kw)
        import jax

        if jax.process_index() != 0:
            return 0  # host 0 writes the CSV/summary/artifacts
    else:
        res = run_sweep(configs, prep, **sweep_kw)

    os.makedirs(args.out, exist_ok=True)
    records = res.to_records()
    cfg_by_num = {c.get("config_num", i): c for i, c in enumerate(configs)}
    # flatten per-trait lists (POM) for the CSV
    for rec in records:
        cfg = cfg_by_num.get(rec["config_num"], {})
        for k in ("lr", "sentiment_lr", "n_epochs", "optimizer", "norm",
                  "pos_embed_dim", "sentiment_hidden_size", "word_loss_weight",
                  "likelihood_weight"):
            if k in cfg:
                rec[k] = cfg[k]
    csv_path = os.path.join(args.out, f"{args.name}.csv")
    keys = sorted({k for r in records for k in r}, key=str)
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in records:
            w.writerow({k: (json.dumps(v) if isinstance(v, list) else v)
                        for k, v in r.items()})
    summary = {
        "n_configs": res.n_configs,
        "wall_time_s": round(res.wall_time_s, 2),
        "compile_time_s": round(res.compile_time_s, 2),
        # exec time is the relay-stable signal — the same cached programs
        # load in 54-344 s depending on the relay instance (BASELINE.md)
        "exec_time_s": round(res.exec_time_s, 2),
        "configs_per_hour": round(res.n_configs / res.wall_time_s * 3600, 1),
        "configs_per_hour_exec": round(
            res.n_configs / max(res.exec_time_s, 1e-9) * 3600, 1),
        "dataset": args.dataset,
        "chunks": res.chunk_stats or [],
    }
    json.dump(summary, open(os.path.join(args.out, f"{args.name}_summary.json"), "w"),
              indent=2)
    print(f"[sweep] done: {summary}")
    print(f"[sweep] wrote {csv_path}")

    if args.top_k_artifacts > 0:
        from mmtpu.config import ExperimentConfig
        from mmtpu.runner import run_experiment

        # rank by the dataset's primary metric
        if args.dataset == "mosi":
            key, reverse = "mae", False
        elif args.dataset == "iemocap":
            key, reverse = "accuracy", True
        else:  # pom: mean per-trait correlation
            key, reverse = "corr", True

        def score(rec):
            v = rec.get(key)
            if isinstance(v, list):
                v = sum(v) / len(v)
            if v is None or v != v:  # NaN → worst
                return float("inf") if not reverse else float("-inf")
            return v

        ranked = sorted(records, key=score, reverse=reverse)
        top = ranked[: args.top_k_artifacts]
        print(f"[sweep] persisting artifacts for top-{len(top)} configs by {key}")
        cfg_by_num2 = {c.get("config_num", i): c for i, c in enumerate(configs)}
        for rec in top:
            raw = dict(cfg_by_num2[rec["config_num"]])
            raw.pop("_run_idx", None)
            cfg = ExperimentConfig.from_dict(
                raw, dataset=args.dataset, batch_size=args.batch_size,
                unimodal=args.unimodal or None, emotion=args.emotion,
                config_name=args.name, seed=args.seed,
                semi_sup_idxes=args.semi_sup_idxes or None,
            )
            run_experiment(cfg, data_dir=args.data_dir, run_idx=rec["run"],
                           verbose=False,
                           # re-score on the optimizer path that selected it
                           lazy_adam=not args.exact_adam)
            print(f"[sweep]   config {rec['config_num']} run {rec['run']} saved")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
