"""CLI — flag-for-flag compatible with the reference driver.

Usage (reference ``simplesif.py:186-238``)::

    python -m mmtpu.run <config.json> {mosi,pom,iemocap} [--unimodal]
        [--pos_embed_dim N] [--batch_size N] [--n_runs N]
        [--semi_sup_idxes 0.1..0.9] [--config_name NAME] [--lr_decay F]
        [--early_stopping] [--sentiment_epochs N] [--emotion E]
        [--optimizer {sgd,adam}] [--norm {layer_norm,batch_norm}]
        [--likelihood_weight F] [--e2e {y,n}] [--time_test]

mmtpu extensions: ``--data_dir``, ``--out_root``, ``--parity``, ``--seed``,
``--no_artifacts``.  (The reference's ``--cuda``/``--cuda_device`` flags are
accepted and ignored — device selection is jax's.)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from mmtpu.config import ExperimentConfig
from mmtpu.runner import prepare, run_experiment


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(prog="mmtpu.run", description=__doc__)
    parser.add_argument("config_file", help="JSON config (reference format)")
    parser.add_argument("dataset", choices=["mosi", "pom", "iemocap"])
    parser.add_argument("--unimodal", action="store_true",
                        help="run MMB1 (unimodal factorization)")
    parser.add_argument("--pos_embed_dim", type=int)
    # None defaults so an unset flag never overrides a config-JSON value —
    # the reference precedence is args.update(config) (simplesif.py:210-238);
    # the reference defaults live on ExperimentConfig's fields instead
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--n_runs", type=int, default=None)
    parser.add_argument(
        "--semi_sup_idxes",
        choices=["{:.1f}".format(x) for x in np.arange(0.1, 1, 0.1)],
    )
    parser.add_argument("--config_name")
    parser.add_argument("--lr_decay", type=float, default=None)
    parser.add_argument("--early_stopping", action="store_true")
    parser.add_argument("--sentiment_epochs", type=int)
    parser.add_argument("--emotion", choices=["happy", "angry", "neutral", "sad"])
    parser.add_argument("--optimizer", choices=["sgd", "adam"])
    parser.add_argument("--norm", choices=["layer_norm", "batch_norm"])
    parser.add_argument("--likelihood_weight", type=float)
    parser.add_argument("--e2e", choices=["y", "n"])
    parser.add_argument("--time_test", action="store_true")
    # accepted for reference-CLI compatibility; ignored (jax owns devices)
    parser.add_argument("--cuda", action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--cuda_device", type=int, help=argparse.SUPPRESS)
    # mmtpu extensions
    parser.add_argument("--data_dir", default=".")
    parser.add_argument("--out_root", default="model_saves")
    parser.add_argument("--parity", action="store_true",
                        help="reproduce reference quirks (pos-embed bug) and "
                             "force float32 matmul precision")
    parser.add_argument("--validation_curve", action="store_true",
                        help="reference-style recursive validation every 80 "
                             "epochs during training (expensive)")
    parser.add_argument("--precision", choices=["default", "highest"],
                        help="matmul precision (TPU default truncates inputs "
                             "to bf16; 'highest' keeps float32)")
    parser.add_argument("--pallas", action="store_true",
                        help="use the fused Pallas kernel for the angular "
                             "word-likelihood partition")
    parser.add_argument("--mesh", metavar="AXES", nargs="?", const="data,vocab",
                        help="span ONE config across all devices on a "
                             "('data','vocab') mesh: 'data' (all devices on "
                             "the batch axis), 'vocab', 'data,vocab' (split), "
                             "or explicit sizes 'data=4,vocab=2'")
    parser.add_argument("--lazy_adam", action="store_true",
                        help="epoch-level lazy-Adam fast path for the latent "
                             "tables (the sweep executor's default; "
                             "float-rounding-level trajectory deltas vs the "
                             "torch-exact dense Adam this CLI defaults to)")
    parser.add_argument("--resume_dir", metavar="DIR",
                        help="epoch-segment checkpoint dir: a killed run "
                             "restarted with the same DIR resumes where it "
                             "stopped (non-e2e fits)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no_artifacts", action="store_true")
    parser.add_argument("--profile", metavar="DIR", nargs="?",
                        const="/tmp/mmtpu_trace",
                        help="capture a jax.profiler device trace of the run")
    return parser.parse_args(argv)


def _parse_mesh(spec: str):
    """'data' | 'vocab' | 'data,vocab' | 'data=4,vocab=2' → a
    ``mmtpu.parallel.make_fit_mesh`` ("data","vocab") Mesh over all devices."""
    import jax

    from mmtpu.parallel import make_fit_mesh

    sizes = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, val = part.partition("=")
        if name not in ("data", "vocab"):
            raise ValueError(f"unknown mesh axis {name!r} (want data/vocab)")
        sizes[name] = int(val) if val else None
    n = len(jax.devices())
    n_b, n_v = sizes.get("data", 1), sizes.get("vocab", 1)
    if "data" in sizes and "vocab" in sizes and n_b is None and n_v is None:
        n_v = 2 if n % 2 == 0 and n > 1 else 1  # default split
        n_b = n // n_v
    return make_fit_mesh(n_b, n_v)


def main(argv=None) -> int:
    args = parse_args(argv)

    from mmtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    overrides = dict(
        dataset=args.dataset,
        unimodal=args.unimodal or None,
        pos_embed_dim=args.pos_embed_dim,
        batch_size=args.batch_size,
        n_runs=args.n_runs,
        semi_sup_idxes=args.semi_sup_idxes,
        config_name=args.config_name,
        lr_decay=args.lr_decay,
        early_stopping=args.early_stopping or None,
        sentiment_epochs=args.sentiment_epochs,
        emotion=args.emotion,
        optimizer=args.optimizer,
        norm=args.norm,
        likelihood_weight=args.likelihood_weight,
        e2e=args.e2e,
        parity=args.parity or None,
        seed=args.seed,
        use_pallas=args.pallas or None,
    )
    precision = args.precision or ("highest" if args.parity else None)
    if precision:
        import jax

        jax.config.update("jax_default_matmul_precision", precision)

    cfg = ExperimentConfig.from_json(args.config_file, **overrides)
    print("######################################")
    print(f"Config: {cfg.config_num}")
    print(json.dumps(cfg.to_dict(), indent=2))

    prep = prepare(cfg, args.data_dir)
    if prep.synthetic:
        print("[mmtpu] real data blobs not found — using synthetic stand-ins")

    mesh = None
    if args.mesh:
        mesh = _parse_mesh(args.mesh)
        print(f"[mmtpu] mesh {dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"over {mesh.devices.size} device(s)")

    import contextlib

    from mmtpu.utils.profiling import trace

    profile_cm = trace(args.profile) if args.profile else contextlib.nullcontext()
    all_results = []
    with profile_cm:
        for r in range(cfg.n_runs):
            res = run_experiment(
                cfg,
                data_dir=args.data_dir,
                out_root=args.out_root,
                prep=prep,
                run_idx=r,
                save_artifacts=not args.no_artifacts,
                time_test=args.time_test,
                validation_curve=args.validation_curve,
                mesh=mesh,
                resume_dir=(f"{args.resume_dir}_run{r}" if args.resume_dir
                            and cfg.n_runs > 1 else args.resume_dir),
                lazy_adam=args.lazy_adam,
            )
            all_results.append(res)
            print(f"run {r}: train_time={res['train_time_s']:.2f}s "
                  f"final_loss={res['final_train_loss']:.3f}")
    if args.profile:
        print(f"[mmtpu] profiler trace written to {args.profile}")
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
