"""mmtpu quickstart — train MMB2, sweep hyperparameters, serve.

Runs end-to-end on synthetic data (real MOSI blobs are auto-detected when
present under --data_dir).  Usage: python examples/quickstart.py
"""

import numpy as np
import jax

from mmtpu import ExperimentConfig, run_experiment, run_sweep
from mmtpu.data.pipeline import prepare_device_data
from mmtpu.data.registry import load_dataset
from mmtpu.models.decoder import init_decoder
from mmtpu.serve import ClosedFormServer
from mmtpu.utils.cache import enable_compilation_cache


def main() -> None:
    enable_compilation_cache()

    # ---- 1. one experiment (the reference CLI equivalent) ----
    cfg = ExperimentConfig(
        dataset="mosi", n_epochs=20, n_sentiment_epochs=50, e2e=True,
        norm="layer_norm", optimizer="adam", lr=1e-4, sentiment_lr=1e-2,
        config_name="quickstart",
    )
    res = run_experiment(cfg, verbose=False, time_test=True)
    print(f"single run: final_loss={res['final_train_loss']:.2f} "
          f"test MAE={res['sentiment']['after']['mae']:.3f} "
          f"closed-form latency={res['closed_form']['latency_s'] * 1e3:.1f} ms")

    # ---- 2. an in-process hyperparameter sweep ----
    ds = load_dataset("mosi")
    prep = prepare_device_data(ds, pos_mode="shared", pos_dims=(2, 4))
    grid = [
        dict(cfg.to_dict(), lr=lr, optimizer=opt, config_num=i,
             pos_embed_dim=2)
        for i, (lr, opt) in enumerate(
            [(1e-3, "sgd"), (1e-4, "sgd"), (1e-3, "adam"), (1e-4, "adam")]
        )
    ]
    sweep = run_sweep(grid, prep, verbose=False)
    best = int(np.nanargmin(sweep.metrics["mae"]))
    print(f"sweep: {sweep.n_configs} configs in {sweep.wall_time_s:.1f}s — "
          f"best config {best} (MAE {sweep.metrics['mae'][best]:.3f})")

    # ---- 3. serving ----
    dec = init_decoder(jax.random.key(0), prep.embed_dim,
                       prep.audio_dim, prep.visual_dim, unimodal=False)
    server = ClosedFormServer(dec, batch_sizes=(64,),
                              word_embeddings=prep.vocab_embeddings)
    te = prep.splits["test"]
    req = {k: np.asarray(te[k])[:32] for k in
           ("text_ids", "text_weights", "text_gauss", "audio", "visual")}
    latents, _ = server(req)
    print(f"served {latents.shape[0]} utterances → latents {latents.shape}")


if __name__ == "__main__":
    main()
