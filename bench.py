"""mmtpu benchmark — prints ONE JSON line for the driver.

Workload: the reference's hot path (SURVEY.md §3.1 hot loop #1) at real MOSI
scale on synthetic data — MMB2 latent+decoder training (`fit_latents`,
train_decoder=True, layer_norm, SGD, batch 64, angular word metric, 1284
train utterances, vocab 3016×300, audio 74 / visual 47 features, seq 20).

Metric: utterances/sec/chip, steady state (post-compile).  Headline value is
measured with K back-to-back fits chained inside ONE compiled program
(lax.scan), because a single dispatch over the axon relay carries a ~70 ms
constant round-trip (measured 2026-08-17: trivial-op round-trip 0.067-0.080 s
vs 0.19 s for a full 100-epoch fit) — per-dispatch overhead is not device
throughput.  The raw single-dispatch number is reported alongside.

Baseline: the reference implementation driven unmodified on CPU measures
19.7 utt/s on the identical workload (BASELINE.md) — the torch reference has
no TPU path, so CPU is its best available number in this environment.

The JSON line also carries the PRODUCTION sweep numbers (VERDICT.md r2 §2):
a 16-config in-process sweep's configs/hour, exec-vs-compile split, and
sweep-mode model-FLOPs MFU.  Env knobs: MMTPU_BENCH_EPOCHS (default 100),
MMTPU_BENCH_SWEEP=0 skips the sweep section, MMTPU_BENCH_CHAIN (default 4)
sets K.
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
    from mmtpu.kernels.angular import default_partition_fn
    from mmtpu.models.decoder import NORM_CODES, init_decoder
    from mmtpu.train.latents import LatentFitSpec, fit_latents
    from mmtpu.train.optim import OPT_CODES

    n_epochs = int(os.environ.get("MMTPU_BENCH_EPOCHS", "100"))
    k_chain = int(os.environ.get("MMTPU_BENCH_CHAIN", "4"))
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
    spec = LatentFitSpec(
        n_epochs_max=n_epochs, batch_size=64, train_decoder=True,
        unimodal=False, word_metric="angular",
        opt_kind="sgd",  # static kind: sparse embedding updates (production path)
        # 64 rows: below MIN_PALLAS_ROWS — measured PARITY with the fused
        # kernel at this shape (scripts/diag_b64_pallas.py), so skip its
        # compile; sweeps (2048-row chunks) still default the kernel on.
        partition_fn=default_partition_fn(64),
    )
    fit = jax.jit(fit_latents, static_argnums=(6,))

    def run_once(key):
        out = fit(key, init_embed, dec, data, vocab, hp, spec)
        # np.asarray forces full materialization — on the axon backend
        # block_until_ready alone can return before execution finishes
        return np.asarray(out[2]), np.asarray(out[0])

    # compile + settle: the relay's first dispatches after a compile run
    # multi-x slower than steady state (measured: 1.0 s settling to 0.19 s)
    print("[bench] compiling single fit...", file=sys.stderr, flush=True)
    t0 = time.time()
    losses, embed_out = run_once(jax.random.key(1))
    warm = time.time() - t0
    print(f"[bench] warm fit done in {warm:.1f}s", file=sys.stderr, flush=True)
    assert np.isfinite(losses).all(), "bench trajectory went non-finite"
    assert np.isfinite(embed_out).all()
    for i in range(3):
        run_once(jax.random.key(2 + i))

    # raw single-dispatch time (includes ~70 ms relay round-trip), best of 8
    dt_single = float("inf")
    for i in range(8):
        t0 = time.time()
        run_once(jax.random.key(10 + i))
        dt_single = min(dt_single, time.time() - t0)

    # headline: K fits chained in one program — dispatch overhead amortized
    def chain(keys):
        def body(c, k):
            e, _, ls = fit_latents(k, init_embed, dec, data, vocab, hp, spec)
            return c + jnp.sum(e), ls[-1]
        return jax.lax.scan(body, jnp.float32(0), keys)

    print(f"[bench] single-dispatch best={dt_single:.3f}s; compiling "
          f"x{k_chain} chain...", file=sys.stderr, flush=True)
    chain_j = jax.jit(chain)
    keys = jax.random.split(jax.random.key(42), k_chain)
    np.asarray(chain_j(keys)[1])  # compile + warm
    dt_chain = float("inf")
    for _ in range(3):
        t0 = time.time()
        _, last_losses = chain_j(keys)
        last_losses = np.asarray(last_losses)
        dt_chain = min(dt_chain, time.time() - t0)
    assert np.isfinite(last_losses).all()
    dt = dt_chain / k_chain
    utt_per_s = n_train * n_epochs / dt

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
        f"chained={dt:.3f}s/fit (x{k_chain}) single-dispatch={dt_single:.3f}s "
        f"for {n_epochs} epochs "
        f"({utt_per_s:.0f} utt/s; reference CPU {REFERENCE_CPU_UTT_PER_S}); "
        f"{achieved_tflops:.1f} TFLOP/s model = {mfu * 100:.1f}% of "
        f"{peak / 1e12:.0f} TFLOP/s peak",
        file=sys.stderr,
    )

    record = {
        "metric": "utterances/sec/chip (MMB2 train)",
        "value": round(utt_per_s, 1),
        "unit": "utterances/sec",
        "vs_baseline": round(utt_per_s / REFERENCE_CPU_UTT_PER_S, 2),
        "mfu_pct": round(mfu * 100, 2),
        "model_tflops_per_s": round(achieved_tflops, 2),
        "single_dispatch_utt_per_s": round(n_train * n_epochs / dt_single, 1),
    }

    if jax.default_backend() == "tpu":
        # on-TPU Pallas equivalence gate (VERDICT r2 §5): the MOSAIC-compiled
        # kernel (not interpret mode) must match the XLA path fwd+VJP at
        # production shape — kernel drift cannot ship silently
        record.update(_pallas_gate(vocab))

    if os.environ.get("MMTPU_BENCH_SWEEP", "1") != "0":
        try:
            record.update(_sweep_rate(file=sys.stderr))
        except Exception as e:  # pragma: no cover — keep the headline alive
            print(f"[bench] sweep section failed: {e}", file=sys.stderr)

    print(json.dumps(record))


def _pallas_gate(vocab) -> dict:
    """Assert Mosaic-kernel == XLA numerics on-device at the sweep's
    production shape (2048 rows = 32 configs x batch 64, full MOSI vocab)."""
    import jax
    import jax.numpy as jnp

    from mmtpu.kernels.angular import angular_partition_pallas
    from mmtpu.ops.wordprob import angular_partition

    lat = jax.random.normal(jax.random.key(7), (2048, vocab.shape[1]),
                            jnp.float32)
    f_x = jax.jit(jax.value_and_grad(
        lambda l: jnp.sum(angular_partition(l, vocab))))
    f_p = jax.jit(jax.value_and_grad(
        lambda l: jnp.sum(angular_partition_pallas(l, vocab))))
    vx, gx = f_x(lat)
    vp, gp = f_p(lat)
    fwd_rel = abs(float(vx) - float(vp)) / max(abs(float(vx)), 1e-12)
    grad_rel = float(jnp.max(jnp.abs(gx - gp))
                     / jnp.maximum(jnp.max(jnp.abs(gx)), 1e-12))
    print(f"[bench] pallas gate: fwd rel-err={fwd_rel:.2e} "
          f"grad max-rel={grad_rel:.2e}", file=sys.stderr, flush=True)
    assert fwd_rel < 1e-5, f"Pallas fwd drift: {fwd_rel}"
    assert grad_rel < 1e-3, f"Pallas VJP drift: {grad_rel}"
    return {"pallas_fwd_rel_err": round(fwd_rel, 10),
            "pallas_grad_max_rel": round(grad_rel, 10)}


def _sweep_rate(file=sys.stderr) -> dict:
    """PRODUCTION-path numbers: full-pipeline in-process sweep rate
    (configs/hour), exec-vs-compile split, and sweep-mode model-FLOPs MFU
    (K vmapped configs multiply every matmul's effective batch)."""
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
    exec_s = max(res.wall_time_s - res.compile_time_s, 1e-9)
    peak = _peak_flops(jax.devices()[0])
    mfu = flops / exec_s / peak
    print(
        f"[bench] sweep: {res.n_configs} configs in {res.wall_time_s:.1f}s "
        f"(compile {res.compile_time_s:.1f}s) → {rate:.0f} configs/hour; "
        f"~{flops / exec_s / 1e12:.1f} TFLOP/s model "
        f"= {mfu * 100:.1f}% MFU (exec time)",
        file=file,
    )
    return {
        "sweep_configs_per_hour": round(rate, 1),
        "sweep_exec_s": round(exec_s, 2),
        "sweep_compile_s": round(res.compile_time_s, 2),
        "sweep_mfu_pct": round(mfu * 100, 2),
        "sweep_configs_per_hour_exec": round(res.n_configs / exec_s * 3600, 1),
    }


if __name__ == "__main__":
    main()
