"""Artifact store keeping the reference's directory contract.

Reference layout (``simplesif.py:546-624`` + ``sentiment_model.py:217-263``)::

    model_saves/<config_name>/config_<n>_run_<r>/
        config.json
        embed_loss.txt, embed_valid_loss.txt, embed_test_loss.txt
        pre/embed.npy            (reference: embed.bin via torch.save)
        post/embed.npy
        {pre,post}/senti.npz     (reference: senti.bin)
        {pre,post}/senti_train_loss.txt, senti_valid_loss.txt
        {pre,post}/test_acc_{before,after}.txt
        {pre,post}/acc_{before,after}.txt      (mmtpu extra — the reference's
            aggregation scripts expect these names while its trainer writes
            test_acc_*; we write both so scripts/make_result_table.py-style
            crawls work out of the box)
        {pre,post}/test_results_{before,after}.json

Tensors are stored as ``.npy``/``.npz`` instead of torch pickles — the
documented, framework-neutral equivalent.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Mapping, Optional

import numpy as np


class ArtifactStore:
    """One run's artifact folder (``model_saves/<name>/config_<n>_run_<r>``)."""

    def __init__(
        self,
        root: str,
        config_name: str,
        config_num: int,
        run_idx: int = 0,
    ):
        self.folder = os.path.join(
            root, config_name, f"config_{config_num}_run_{run_idx}"
        )
        self.pre = os.path.join(self.folder, "pre")
        self.post = os.path.join(self.folder, "post")
        os.makedirs(self.pre, exist_ok=True)
        os.makedirs(self.post, exist_ok=True)

    def save_config(self, config: Mapping) -> None:
        with open(os.path.join(self.folder, "config.json"), "w") as f:
            json.dump(dict(config), f, indent=2)

    def save_embeddings(self, which: str, embeddings) -> None:
        """``which`` in {'pre', 'post'} (simplesif.py:572-573, 616-617)."""
        path = os.path.join(getattr(self, which), "embed.npy")
        np.save(path, np.asarray(embeddings))

    def load_embeddings(self, which: str) -> np.ndarray:
        return np.load(os.path.join(getattr(self, which), "embed.npy"))

    def save_losses(self, name: str, losses: Iterable[float]) -> None:
        """Loss curves as one-value-per-line txt (simplesif.py:592-597)."""
        with open(os.path.join(self.folder, f"{name}.txt"), "w") as f:
            for loss in losses:
                f.write(f"{float(loss)}\n")

    def save_sentiment_losses(
        self, which: str, train_losses, valid_losses
    ) -> None:
        for nm, arr in (("senti_train_loss", train_losses),
                        ("senti_valid_loss", valid_losses)):
            with open(os.path.join(getattr(self, which), f"{nm}.txt"), "w") as f:
                for loss in arr:
                    f.write(f"{float(loss)}\n")

    def save_results(self, which: str, stage: str, results: Mapping) -> None:
        """``stage`` in {'before', 'after'} (sentiment_model.py:217-223,258-263)."""
        base = getattr(self, which)
        if "accuracy" in results:
            for prefix in ("test_acc", "acc"):
                with open(os.path.join(base, f"{prefix}_{stage}.txt"), "w") as f:
                    f.write(str(results["accuracy"]))
        with open(os.path.join(base, f"test_results_{stage}.json"), "w") as f:
            json.dump(results, f, indent=2)

    def save_sentiment_model(self, which: str, params) -> None:
        import jax

        leaves, _ = jax.tree.flatten(params)
        np.savez(
            os.path.join(getattr(self, which), "senti.npz"),
            **{f"p{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )

    def load_sentiment_model(self, which: str, like) -> object:
        import jax

        data = np.load(os.path.join(getattr(self, which), "senti.npz"))
        leaves, treedef = jax.tree.flatten(like)
        return jax.tree.unflatten(
            treedef, [data[f"p{i}"] for i in range(len(leaves))]
        )
