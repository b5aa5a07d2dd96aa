"""Diagnose the round-2 bench regression (BENCH_r02 545k vs r01 718k utt/s).

Round 2 made the Pallas angular-partition kernel the default for the
single-config B=64 bench fit (bench.py) because it won 13-29% on 32-config
sweep chunks (2048-row calls).  Hypothesis (VERDICT.md): at 64 rows the fused
kernel loses to XLA.  This script measures, ON THE CHIP:

1. the full bench fit (fit_latents, 100 epochs) with Pallas on/off;
2. the standalone partition fwd+VJP at row counts 64 / 512 / 2048;
3. on-device numerics of the Mosaic-compiled kernel vs the XLA path.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/diag_b64_pallas.py
(DIAG_SECTIONS=fits,part,num selects sections; remote compiles are slow —
run one section per invocation when the relay is cold.)
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from mmtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mmtpu.data.pipeline import prepare_device_data
from mmtpu.data.synthetic import synthesize_dataset
from mmtpu.kernels.angular import angular_partition_pallas
from mmtpu.models.decoder import NORM_CODES, init_decoder
from mmtpu.ops.wordprob import angular_partition
from mmtpu.train.latents import LatentFitSpec, fit_latents
from mmtpu.train.optim import OPT_CODES


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(np.asarray, out)  # force materialization (axon relay)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    sections = os.environ.get("DIAG_SECTIONS", "fits,part,num").split(",")
    print(f"backend={jax.default_backend()} {jax.devices()[0].device_kind} "
          f"sections={sections}", flush=True)
    results = {}

    # ---- 1. the bench fit, Pallas on/off ----
    n_epochs, n_train = 100, 1284
    ds = synthesize_dataset(
        "mosi", n_train=n_train, n_valid=8, n_test=8,
        vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
    )
    prep = prepare_device_data(ds, pos_embed_dim=0)
    data = {k: jnp.asarray(v) for k, v in prep.splits["train"].items()}
    vocab = jnp.asarray(prep.vocab_embeddings)
    init_embed = jnp.asarray(prep.sif_init["train"])
    dec = init_decoder(jax.random.key(0), prep.embed_dim, prep.audio_dim,
                       prep.visual_dim, unimodal=False)
    hp = {
        "lr": jnp.float32(1e-4),
        "word_loss_weight": jnp.float32(0.001),
        "opt_code": jnp.int32(OPT_CODES["sgd"]),
        "norm_code": jnp.int32(NORM_CODES["layer_norm"]),
        "n_epochs": jnp.int32(n_epochs),
    }
    fit = jax.jit(fit_latents, static_argnums=(6,))
    if "fits" in sections:
        for label, pfn in (("xla", None), ("pallas", angular_partition_pallas)):
            spec = LatentFitSpec(
                n_epochs_max=n_epochs, batch_size=64, train_decoder=True,
                unimodal=False, word_metric="angular", opt_kind="sgd",
                partition_fn=pfn,
            )
            t0 = time.time()
            dt, out = _time(lambda s=spec: fit(jax.random.key(1), init_embed,
                                               dec, data, vocab, hp, s))
            print(f"fit[{label}]: steady={dt:.3f}s "
                  f"({n_train*n_epochs/dt:.0f} utt/s) "
                  f"warm+steady wall={time.time()-t0:.1f}s", flush=True)
            results[f"fit_{label}_s"] = round(dt, 4)

    # ---- 2. standalone partition fwd+VJP by row count ----
    def loss_xla(lat, voc):
        return jnp.sum(angular_partition(lat, voc))

    def loss_pal(lat, voc):
        return jnp.sum(angular_partition_pallas(lat, voc))

    key = jax.random.key(7)
    for rows in (64, 512, 2048) if "part" in sections else ():
        lat = jax.random.normal(jax.random.fold_in(key, rows), (rows, 300),
                                jnp.float32)
        # time N iterations back-to-back to beat relay dispatch jitter
        n_it = max(1, 4096 // rows)

        def many(fn, lat):
            def body(c, _):
                v, g = fn(c, vocab)
                return c + 1e-6 * g, v
            return jax.lax.scan(body, lat, None, length=n_it)

        mx = jax.jit(lambda l: many(jax.value_and_grad(loss_xla), l))
        mp = jax.jit(lambda l: many(jax.value_and_grad(loss_pal), l))
        tx, _ = _time(mx, lat)
        tp, _ = _time(mp, lat)
        print(f"partition rows={rows:5d} (x{n_it:3d} iters): "
              f"xla={tx*1e3/n_it:7.3f}ms  pallas={tp*1e3/n_it:7.3f}ms  "
              f"ratio={tp/tx:.2f}", flush=True)
        results[f"part_{rows}_xla_ms"] = round(tx * 1e3 / n_it, 4)
        results[f"part_{rows}_pallas_ms"] = round(tp * 1e3 / n_it, 4)

    # ---- 3. on-device numerics (fwd + grad) ----
    if "num" in sections:
        lat = jax.random.normal(key, (2048, 300), jnp.float32)
        vx, gxa = jax.jit(jax.value_and_grad(loss_xla))(lat, vocab)
        vp, gpa = jax.jit(jax.value_and_grad(loss_pal))(lat, vocab)
        fwd_rel = abs(float(vx) - float(vp)) / abs(float(vx))
        grad_rel = float(jnp.max(jnp.abs(gxa - gpa)) /
                         jnp.maximum(jnp.max(jnp.abs(gxa)), 1e-12))
        print(f"numerics: fwd rel-err={fwd_rel:.2e}  "
              f"grad max-rel={grad_rel:.2e}", flush=True)
        results["fwd_rel_err"] = fwd_rel
        results["grad_max_rel"] = grad_rel
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
