"""Trajectory parity for fit_e2e and fit_sentiment vs torch transliterations
of the reference e2e loop (simplesif.py:708-800) and sentiment trainer
(sentiment_model.py:76-163)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mmtpu.models.decoder import MMB2_HEADS, head_dims
from mmtpu.train.e2e import E2EFitSpec, fit_e2e
from mmtpu.train.sentiment import SentimentFitSpec, fit_sentiment
from tests.test_train_parity import (
    TorchRefMMB,
    _make_tiny,
    _torch_gauss,
    _torch_word_logprob,
)


class TorchSenti(torch.nn.Module):
    def __init__(self, d, h, n_out):
        super().__init__()
        self.hidden1 = torch.nn.Linear(d, h)
        self.out = torch.nn.Linear(h, n_out)

    def forward(self, x):
        return self.out(torch.relu(self.hidden1(x))).squeeze()


def _copy_decoder_to_jax(tm, D):
    heads = {}
    for h in MMB2_HEADS:
        heads[h] = {
            "w_mu": jnp.array(tm.mods[h]["mu"].weight.detach().numpy().T),
            "b_mu": jnp.array(tm.mods[h]["mu"].bias.detach().numpy()),
            "w_log_sigma": jnp.array(tm.mods[h]["log_sigma"].weight.detach().numpy().T),
            "b_log_sigma": jnp.array(tm.mods[h]["log_sigma"].bias.detach().numpy()),
        }
    return {"heads": heads,
            "norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}}


def _copy_senti_to_jax(sm):
    return {
        "w1": jnp.array(sm.hidden1.weight.detach().numpy().T),
        "b1": jnp.array(sm.hidden1.bias.detach().numpy()),
        "w2": jnp.array(sm.out.weight.detach().numpy().T),
        "b2": jnp.array(sm.out.bias.detach().numpy()),
    }


def test_fit_e2e_matches_torch(rng):
    d = _make_tiny(rng)
    n, D = d["init_embed"].shape
    A, Vis = d["audio"].shape[-1], d["visual"].shape[-1]
    y = rng.standard_normal(n).astype(np.float32)
    n_epochs, bsz, lr, wlw, lw = 3, 5, 1e-3, 0.002, 0.0001

    dims = {h: head_dims(h, D, A, Vis) for h in MMB2_HEADS}
    torch.manual_seed(1)
    tm = TorchRefMMB(MMB2_HEADS, D, dims)
    sm = TorchSenti(D, 4, 1)
    dec_jax = _copy_decoder_to_jax(tm, D)
    senti_jax = _copy_senti_to_jax(sm)

    # ---- torch reference loop (simplesif.py:708-790), no shuffle ----
    vocab_t = torch.tensor(d["vocab"])
    ids_t = torch.tensor(d["ids"], dtype=torch.long)
    se_all = vocab_t[ids_t]
    ww_all = torch.tensor(d["vw"])[ids_t]
    tok_m = torch.tensor(d["token_mask"])
    audio, visual = torch.tensor(d["audio"]), torch.tensor(d["visual"])
    am, vm = torch.tensor(d["audio_mask"]), torch.tensor(d["visual_mask"])
    y_t = torch.tensor(y)
    embed = torch.tensor(d["init_embed"].copy())
    embed.requires_grad = True
    opt = torch.optim.SGD([embed] + list(tm.parameters()) + list(sm.parameters()),
                          lr=lr)
    loss_fn = torch.nn.L1Loss(reduction="none")
    want_losses = []
    for _ in range(n_epochs):
        ep = 0.0
        for s in range(0, n, bsz):
            j = torch.arange(s, min(s + bsz, n))
            opt.zero_grad()
            out = tm(embed[j])
            text = se_all[j]
            data = {
                "audio": audio[j], "visual": visual[j],
                "audiovisual": torch.cat([audio[j], visual[j]], -1),
                "textaudio": torch.cat([text, audio[j]], -1),
                "textvisual": torch.cat([text, visual[j]], -1),
                "textaudiovisual": torch.cat([text, audio[j], visual[j]], -1),
            }
            tm3 = tok_m[j].unsqueeze(-1).expand_as(text)
            masks = {
                "audio": am[j], "visual": vm[j],
                "audiovisual": torch.cat([am[j], vm[j]], -1),
                "textaudio": torch.cat([tm3, am[j]], -1),
                "textvisual": torch.cat([tm3, vm[j]], -1),
                "textaudiovisual": torch.cat([tm3, am[j], vm[j]], -1),
            }
            word_lp = _torch_word_logprob(embed[j], vocab_t, ww_all[j],
                                          se_all[j], tok_m[j])
            lps = [_torch_gauss(out[h]["mu"], out[h]["sigma"], data[h], masks[h])
                   for h in MMB2_HEADS]
            other = (1.0 - wlw) / len(lps)
            log_prob = -(sum(lps) * other + wlw * word_lp)
            senti_loss = loss_fn(sm(embed[j]), y_t[j]).mean(dim=-1)
            loss = lw * log_prob + (1 - lw) * senti_loss  # simplesif.py:786
            loss.mean().backward()
            opt.step()
            ep += float(loss.mean())
        want_losses.append(ep)
    want_embed = embed.detach().numpy()

    # ---- mmtpu ----
    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data_j = {
        "text": text, "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]), "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]), "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]), "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    hp = {
        "lr": jnp.float32(lr), "word_loss_weight": jnp.float32(wlw),
        "likelihood_weight": jnp.float32(lw),
        "opt_code": jnp.int32(0), "norm_code": jnp.int32(0),
        "n_epochs": jnp.int32(n_epochs),
    }
    spec = E2EFitSpec(n_epochs_max=n_epochs, batch_size=bsz, unimodal=False,
                      shuffle=False)
    got_embed, _, _, got_losses = fit_e2e(
        jax.random.key(0), jnp.asarray(d["init_embed"]), dec_jax, senti_jax,
        data_j, jnp.asarray(y), vocab, hp, spec,
    )
    np.testing.assert_allclose(np.asarray(got_losses), np.asarray(want_losses),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_embed), want_embed, atol=2e-4)


def test_fit_e2e_freeze_weights_matches_torch(rng):
    """freeze_weights in e2e: the reference puts every gen_model parameter in
    the optimizer but freeze_weights() sets requires_grad=False on the
    embed2out linears only (simplesif.py:689-691, models.py:170-178) — heads
    stay at init while embeddings + sentiment keep training.  mmtpu's
    hp["train_heads"]=0 gate must reproduce the torch trajectory."""
    d = _make_tiny(rng)
    n, D = d["init_embed"].shape
    A, Vis = d["audio"].shape[-1], d["visual"].shape[-1]
    y = rng.standard_normal(n).astype(np.float32)
    n_epochs, bsz, lr, wlw, lw = 3, 5, 1e-3, 0.002, 0.0001

    dims = {h: head_dims(h, D, A, Vis) for h in MMB2_HEADS}
    torch.manual_seed(5)
    tm = TorchRefMMB(MMB2_HEADS, D, dims)
    sm = TorchSenti(D, 4, 1)
    dec_jax = _copy_decoder_to_jax(tm, D)
    senti_jax = _copy_senti_to_jax(sm)

    # reference freeze: heads detached, but still handed to the optimizer
    for p in tm.parameters():
        p.requires_grad = False

    vocab_t = torch.tensor(d["vocab"])
    ids_t = torch.tensor(d["ids"], dtype=torch.long)
    se_all = vocab_t[ids_t]
    ww_all = torch.tensor(d["vw"])[ids_t]
    tok_m = torch.tensor(d["token_mask"])
    audio, visual = torch.tensor(d["audio"]), torch.tensor(d["visual"])
    am, vm = torch.tensor(d["audio_mask"]), torch.tensor(d["visual_mask"])
    y_t = torch.tensor(y)
    embed = torch.tensor(d["init_embed"].copy())
    embed.requires_grad = True
    opt = torch.optim.SGD([embed] + list(tm.parameters()) + list(sm.parameters()),
                          lr=lr)
    loss_fn = torch.nn.L1Loss(reduction="none")
    want_losses = []
    for _ in range(n_epochs):
        ep = 0.0
        for s in range(0, n, bsz):
            j = torch.arange(s, min(s + bsz, n))
            opt.zero_grad()
            out = tm(embed[j])
            text = se_all[j]
            data = {
                "audio": audio[j], "visual": visual[j],
                "audiovisual": torch.cat([audio[j], visual[j]], -1),
                "textaudio": torch.cat([text, audio[j]], -1),
                "textvisual": torch.cat([text, visual[j]], -1),
                "textaudiovisual": torch.cat([text, audio[j], visual[j]], -1),
            }
            tm3 = tok_m[j].unsqueeze(-1).expand_as(text)
            masks = {
                "audio": am[j], "visual": vm[j],
                "audiovisual": torch.cat([am[j], vm[j]], -1),
                "textaudio": torch.cat([tm3, am[j]], -1),
                "textvisual": torch.cat([tm3, vm[j]], -1),
                "textaudiovisual": torch.cat([tm3, am[j], vm[j]], -1),
            }
            word_lp = _torch_word_logprob(embed[j], vocab_t, ww_all[j],
                                          se_all[j], tok_m[j])
            lps = [_torch_gauss(out[h]["mu"], out[h]["sigma"], data[h], masks[h])
                   for h in MMB2_HEADS]
            other = (1.0 - wlw) / len(lps)
            log_prob = -(sum(lps) * other + wlw * word_lp)
            senti_loss = loss_fn(sm(embed[j]), y_t[j]).mean(dim=-1)
            loss = lw * log_prob + (1 - lw) * senti_loss
            loss.mean().backward()
            opt.step()
            ep += float(loss.mean())
        want_losses.append(ep)
    want_embed = embed.detach().numpy()

    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data_j = {
        "text": text, "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]), "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]), "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]), "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    hp = {
        "lr": jnp.float32(lr), "word_loss_weight": jnp.float32(wlw),
        "likelihood_weight": jnp.float32(lw),
        "opt_code": jnp.int32(0), "norm_code": jnp.int32(0),
        "n_epochs": jnp.int32(n_epochs),
        "train_heads": jnp.float32(0.0),
    }
    spec = E2EFitSpec(n_epochs_max=n_epochs, batch_size=bsz, unimodal=False,
                      shuffle=False)
    got_embed, got_dec, _, got_losses = fit_e2e(
        jax.random.key(0), jnp.asarray(d["init_embed"]), dec_jax, senti_jax,
        data_j, jnp.asarray(y), vocab, hp, spec,
    )
    np.testing.assert_allclose(np.asarray(got_losses), np.asarray(want_losses),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_embed), want_embed, atol=2e-4)
    # heads must be exactly at init
    for h in MMB2_HEADS:
        for k in ("w_mu", "b_mu", "w_log_sigma", "b_log_sigma"):
            np.testing.assert_array_equal(
                np.asarray(got_dec["heads"][h][k]),
                np.asarray(dec_jax["heads"][h][k]),
            )


def test_fit_sentiment_matches_torch(rng):
    """No-early-stopping path vs sentiment_model.py:98-111 (SGD, L1)."""
    n, D, H = 17, 6, 4
    x = rng.standard_normal((n, D)).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    lr, n_epochs, bsz = 0.05, 4, 5
    torch.manual_seed(2)
    sm = TorchSenti(D, H, 1)
    p_jax = _copy_senti_to_jax(sm)

    opt = torch.optim.SGD(sm.parameters(), lr=lr)
    loss_fn = torch.nn.L1Loss(reduction="none")
    want_losses = []
    for _ in range(n_epochs):
        ep, nb = 0.0, 0
        for s in range(0, n, bsz):
            j = torch.arange(s, min(s + bsz, n))
            sm.zero_grad()
            loss = loss_fn(sm(torch.tensor(x[j.numpy()])), torch.tensor(y[j.numpy()]))
            loss.mean().backward()
            opt.step()
            ep += float(loss.mean())
            nb += 1
        want_losses.append(ep / nb)

    hp = {"lr": jnp.float32(lr), "lr_decay": jnp.float32(0.5),
          "n_epochs": jnp.int32(n_epochs)}
    spec = SentimentFitSpec(n_epochs_max=n_epochs, batch_size=bsz,
                            early_stopping=False, shuffle=False)
    last, _, tr_losses, _ = fit_sentiment(
        jax.random.key(0), p_jax, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(x), jnp.asarray(y), hp, spec,
    )
    np.testing.assert_allclose(np.asarray(tr_losses), np.asarray(want_losses),
                               rtol=1e-4, atol=1e-5)
    want_pred = sm(torch.tensor(x)).detach().numpy()
    from mmtpu.models.sentiment import apply_sentiment

    got_pred = np.asarray(apply_sentiment(last, jnp.asarray(x)))
    np.testing.assert_allclose(got_pred, want_pred, atol=1e-5)
