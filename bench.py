"""mmtpu benchmark — prints ONE JSON line for the driver.

Workload: the reference's hot path (SURVEY.md §3.1 hot loop #1) at real MOSI
scale on synthetic data — MMB2 latent+decoder training (`fit_latents`,
train_decoder=True, layer_norm, SGD, batch 64, angular word metric, 1284
train utterances, vocab 3016×300, audio 74 / visual 47 features, seq 20).

Metric: utterances/sec/chip, steady state (post-compile).
Baseline: the reference implementation driven unmodified on CPU measures
19.7 utt/s on the identical workload (BASELINE.md) — the torch reference has
no TPU path, so CPU is its best available number in this environment.

Env knobs: MMTPU_BENCH_EPOCHS (default 100), MMTPU_BENCH_SWEEP=1 additionally
reports an in-process multi-config sweep rate to stderr.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_CPU_UTT_PER_S = 19.7  # BASELINE.md, measured 2026-08-16

# peak dense-matmul throughput per chip (bf16 FLOP/s), by device_kind substring
_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
    "cpu": 1e11,  # nominal, for the forced-CPU test path
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for k, v in _PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12  # default: v5e


def model_flops_per_step(B, V, D, L, A, Vi, unimodal=False) -> float:
    """Matmul-only FLOPs of one MMB training step (fwd + bwd) — the model
    FLOP count used for MFU (VPU/elementwise work excluded, so this is a
    lower bound; the roofline discussion lives in docs/DESIGN.md).

    Terms:
    - angular partition Z_s: (B,D)x(D,V) fwd + the same-shape bwd wrt latents
      (reference losses.py:76-78 — the dominant term);
    - per-token scores: (B,L,D)·(B,D) fwd + bwd;
    - decoder heads: 2 linears (mu, log_sigma) per head, fwd + 2x bwd
      (grads wrt both input and weights).
    """
    heads_f = (A + Vi) if unimodal else (3 * D + 4 * A + 4 * Vi)
    partition = 2 * 2 * B * V * D
    token = 2 * 2 * B * L * D
    decoder = 3 * 2 * B * D * (2 * heads_f)
    return float(partition + token + decoder)


def main() -> None:
    import jax

    # persistent compilation cache: the driver invokes bench.py in a fresh
    # process each round; caching makes the warm-up near-instant after the
    # first ever run on a given software version.
    try:
        from mmtpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        
    except Exception:
        pass
    import jax.numpy as jnp

    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset
    from mmtpu.models.decoder import NORM_CODES, init_decoder
    from mmtpu.train.latents import LatentFitSpec, fit_latents
    from mmtpu.train.optim import OPT_CODES

    n_epochs = int(os.environ.get("MMTPU_BENCH_EPOCHS", "100"))
    n_train = 1284

    ds = synthesize_dataset(
        "mosi", n_train=n_train, n_valid=8, n_test=8,
        vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
    )
    prep = prepare_device_data(ds, pos_embed_dim=0)
    data = {k: jnp.asarray(v) for k, v in prep.splits["train"].items()}
    vocab = jnp.asarray(prep.vocab_embeddings)
    init_embed = jnp.asarray(prep.sif_init["train"])

    dec = init_decoder(
        jax.random.key(0), prep.embed_dim, prep.audio_dim, prep.visual_dim,
        unimodal=False,
    )
    hp = {
        "lr": jnp.float32(1e-4),  # grid value; keeps the trajectory finite at MOSI scale
        "word_loss_weight": jnp.float32(0.001),
        "opt_code": jnp.int32(OPT_CODES["sgd"]),
        "norm_code": jnp.int32(NORM_CODES["layer_norm"]),
        "n_epochs": jnp.int32(n_epochs),
    }
    partition_fn = None
    if jax.default_backend() == "tpu":
        # production default (mmtpu.sweep): the fused Pallas partition kernel
        from mmtpu.kernels.angular import angular_partition_pallas

        partition_fn = angular_partition_pallas
    spec = LatentFitSpec(
        n_epochs_max=n_epochs, batch_size=64, train_decoder=True,
        unimodal=False, word_metric="angular",
        opt_kind="sgd",  # static kind: sparse embedding updates (production path)
        partition_fn=partition_fn,
    )
    fit = jax.jit(fit_latents, static_argnums=(6,))

    # compile + warm run (np.asarray forces full materialization — on the
    # axon backend block_until_ready alone returns before execution finishes)
    t0 = time.time()
    out = fit(jax.random.key(1), init_embed, dec, data, vocab, hp, spec)
    np.asarray(out[0])
    warm = time.time() - t0
    # steady state: best of 3 (the relay adds multi-ms dispatch jitter)
    dt = float("inf")
    for i in range(3):
        t0 = time.time()
        out = fit(jax.random.key(2 + i), init_embed, dec, data, vocab, hp, spec)
        embed_out = np.asarray(out[0])
        losses = np.asarray(out[2])
        dt = min(dt, time.time() - t0)
    utt_per_s = n_train * n_epochs / dt
    assert np.isfinite(losses).all(), "bench trajectory went non-finite"
    assert np.isfinite(embed_out).all()

    # ---- MFU: model (matmul-only) FLOPs vs chip peak ----
    B = 64
    n_batches = -(-n_train // B)  # padded static batches — every step is full
    step_flops = model_flops_per_step(
        B, prep.vocab_embeddings.shape[0], prep.embed_dim, 20,
        prep.audio_dim, prep.visual_dim,
    )
    total_flops = step_flops * n_batches * n_epochs
    peak = _peak_flops(jax.devices()[0])
    mfu = total_flops / dt / peak
    achieved_tflops = total_flops / dt / 1e12

    print(
        f"[bench] backend={jax.default_backend()} "
        f"({jax.devices()[0].device_kind}) warm={warm:.2f}s "
        f"steady={dt:.3f}s for {n_epochs} epochs "
        f"({utt_per_s:.0f} utt/s; reference CPU {REFERENCE_CPU_UTT_PER_S}); "
        f"{achieved_tflops:.1f} TFLOP/s model = {mfu * 100:.1f}% of "
        f"{peak / 1e12:.0f} TFLOP/s peak",
        file=sys.stderr,
    )

    if os.environ.get("MMTPU_BENCH_SWEEP") == "1":
        _sweep_rate(prep, file=sys.stderr)

    print(json.dumps({
        "metric": "utterances/sec/chip (MMB2 train)",
        "value": round(utt_per_s, 1),
        "unit": "utterances/sec",
        "vs_baseline": round(utt_per_s / REFERENCE_CPU_UTT_PER_S, 2),
        "mfu_pct": round(mfu * 100, 2),
        "model_tflops_per_s": round(achieved_tflops, 2),
    }))


def _sweep_rate(prep, file=sys.stderr) -> None:
    """Optional: full-pipeline in-process sweep rate (configs/hour) + the
    sweep-mode MFU (the production path — K vmapped configs multiply every
    matmul's effective batch)."""
    import jax

    from mmtpu.config import make_grid
    from mmtpu.data.pipeline import prepare_device_data
    from mmtpu.data.synthetic import synthesize_dataset
    from mmtpu.sweep import run_sweep

    ds = synthesize_dataset(
        "mosi", n_train=1284, n_valid=229, n_test=686,
        vocab_size=3016, embed_dim=300, audio_dim=74, visual_dim=47,
    )
    prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
    cfgs = make_grid()[:16]
    res = run_sweep(cfgs, prep, batch_size=64, chunk_size=16, verbose=False)
    rate = res.n_configs / res.wall_time_s * 3600

    # sweep-mode MFU: count the training-phase matmul FLOPs actually run
    # (e2e train at each config's n_epochs + 2 inference fits at n_epochs,
    # batch 64 train / 512 infer, 1284/229/686 rows)
    step = lambda B, V: model_flops_per_step(B, V, 300, 20, 74 + 6, 47 + 6)
    flops = 0.0
    for c in cfgs:
        ne = c["n_epochs"]
        flops += step(64, 3016) * (-(-1284 // 64)) * ne  # train fit
        flops += step(512, 3016) * (-(-229 // 512)) * ne  # valid fit
        flops += step(512, 3016) * (-(-686 // 512)) * ne  # test fit
    exec_s = res.wall_time_s - res.compile_time_s
    peak = _peak_flops(jax.devices()[0])
    print(
        f"[bench] sweep: {res.n_configs} configs in {res.wall_time_s:.1f}s "
        f"(compile {res.compile_time_s:.1f}s) → {rate:.0f} configs/hour; "
        f"~{flops / max(exec_s, 1e-9) / 1e12:.1f} TFLOP/s model "
        f"= {flops / max(exec_s, 1e-9) / peak * 100:.1f}% MFU (exec time)",
        file=file,
    )


if __name__ == "__main__":
    main()
