"""End-to-end parity: mmtpu.train.fit_latents vs a direct torch
transliteration of the reference training loop (simplesif.py:49-162 +
losses.py:216-274 + models.py:107-202) on tiny synthetic data.

Shuffling is disabled and parameters are copied torch→jax so trajectories are
deterministic and comparable step-for-step.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmtpu.models.decoder import MMB2_HEADS, NORM_CODES, head_dims
from mmtpu.train.latents import LatentFitSpec, fit_latents
from mmtpu.train.optim import OPT_CODES


def _make_tiny(rng, n=13, L=5, V=25, D=8, A=4, Vis=3):
    vocab = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(1, V, size=(n, L))
    ids[rng.random((n, L)) < 0.2] = 0  # padding id
    vw = (rng.random(V) * 0.9 + 0.05).astype(np.float32)
    audio = rng.standard_normal((n, L, A)).astype(np.float32)
    visual = rng.standard_normal((n, L, Vis)).astype(np.float32)
    audio_mask = (rng.random((n, L, A)) < 0.85).astype(np.float32)
    visual_mask = (rng.random((n, L, Vis)) < 0.85).astype(np.float32)
    token_mask = (ids != 0).astype(np.float32)
    init_embed = rng.standard_normal((n, D)).astype(np.float32)
    return dict(
        vocab=vocab, ids=ids, vw=vw, audio=audio, visual=visual,
        audio_mask=audio_mask, visual_mask=visual_mask,
        token_mask=token_mask, init_embed=init_embed,
    )


class TorchRefMMB(torch.nn.Module):
    """Faithful-by-construction torch model with externally set weights."""

    def __init__(self, heads, D, dims):
        super().__init__()
        self.mods = torch.nn.ModuleDict()
        for h in heads:
            f = dims[h]
            self.mods[h] = torch.nn.ModuleDict({
                "mu": torch.nn.Linear(D, f),
                "log_sigma": torch.nn.Linear(D, f),
            })

    def forward(self, x):
        return {
            h: {"mu": m["mu"](x), "sigma": m["log_sigma"](x).exp()}
            for h, m in self.mods.items()
        }


def _torch_word_logprob(latents, vocab, ww, se, mask2d, a=1e-3):
    coss = torch.nn.CosineSimilarity(dim=-1)
    cos = coss(latents.unsqueeze(1), vocab.unsqueeze(0))
    z = (1.0 - cos.acos() / np.pi).sum(-1, keepdim=True)
    alpha = 1.0 / (z * a + 1.0)
    unigram = alpha * ww
    score = 1.0 - (coss(se, latents.unsqueeze(1)).acos() / np.pi)
    context = (1.0 - alpha) * score / z
    return (torch.log(unigram + context) * mask2d).sum(dim=-1)


def _torch_gauss(mu, sigma, values, mask):
    sig_sq = sigma.unsqueeze(1).pow(2)
    term1 = torch.log(1.0 / torch.sqrt(2.0 * np.pi * sig_sq))
    term2 = (values - mu.unsqueeze(1)).pow(2) / (2.0 * sig_sq)
    return ((term1 - term2) * mask).sum(-1).sum(-1)


def _run_torch_reference(d, unimodal, n_epochs, lr, batch_size, word_weight,
                         optimizer_kind, torch_model, init_embed,
                         word_fn=None):
    """Transliteration of optimize_latents (simplesif.py:49-162), train=True,
    no shuffle, MOSI-style data (text_gauss == text).  ``word_fn`` overrides
    the word-likelihood (default: angular2)."""
    word_fn = word_fn or _torch_word_logprob
    n = d["ids"].shape[0]
    vocab = torch.tensor(d["vocab"])
    se_all = vocab[torch.tensor(d["ids"], dtype=torch.long)]
    ww_all = torch.tensor(d["vw"])[torch.tensor(d["ids"], dtype=torch.long)]
    tok_m = torch.tensor(d["token_mask"])
    audio = torch.tensor(d["audio"])
    visual = torch.tensor(d["visual"])
    am = torch.tensor(d["audio_mask"])
    vm = torch.tensor(d["visual_mask"])

    embeddings = torch.tensor(init_embed.copy())
    embeddings.requires_grad = True
    params = [embeddings] + list(torch_model.parameters())
    if optimizer_kind == "adam":
        opt = torch.optim.Adam(params, lr=lr)
    else:
        opt = torch.optim.SGD(params, lr=lr)

    heads = ["audio", "visual"] if unimodal else list(MMB2_HEADS)
    epoch_losses = []
    for _ in range(n_epochs):
        epoch_loss = 0.0
        for s in range(0, n, batch_size):
            j = torch.arange(s, min(s + batch_size, n))
            opt.zero_grad()
            out = torch_model(embeddings[j])
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
            word_lp = word_fn(
                embeddings[j], vocab, ww_all[j], se_all[j], tok_m[j]
            )
            lps = [
                _torch_gauss(out[h]["mu"], out[h]["sigma"], data[h], masks[h])
                for h in heads
            ]
            other = (1.0 - word_weight) / len(lps)
            total = sum(lps) * other + word_weight * word_lp
            loss = (-total).mean()
            loss.backward()
            opt.step()
            epoch_loss += float(loss)
        epoch_losses.append(epoch_loss)
    return embeddings.detach().numpy(), epoch_losses


@pytest.mark.parametrize("optimizer_kind", ["sgd", "adam"])
def test_fit_latents_matches_torch_reference(rng, optimizer_kind):
    d = _make_tiny(rng)
    n, D = d["init_embed"].shape
    A, Vis = d["audio"].shape[-1], d["visual"].shape[-1]
    n_epochs, lr, bsz, wlw = 3, 1e-2 if optimizer_kind == "sgd" else 1e-2, 5, 0.002

    dims = {h: head_dims(h, D, A, Vis) for h in MMB2_HEADS}
    tm = TorchRefMMB(MMB2_HEADS, D, dims)

    # copy torch params → jax pytree ((in, out) layout).  NB jnp.array, not
    # asarray: on the CPU backend asarray zero-copies contiguous numpy views
    # of torch storage, which torch's in-place training would then mutate.
    heads_jax = {}
    for h in MMB2_HEADS:
        heads_jax[h] = {
            "w_mu": jnp.array(tm.mods[h]["mu"].weight.detach().numpy().T),
            "b_mu": jnp.array(tm.mods[h]["mu"].bias.detach().numpy()),
            "w_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].weight.detach().numpy().T
            ),
            "b_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].bias.detach().numpy()
            ),
        }
    dec_params = {
        "heads": heads_jax,
        "norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }

    want_embed, want_losses = _run_torch_reference(
        d, False, n_epochs, lr, bsz, wlw, optimizer_kind, tm, d["init_embed"]
    )

    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data = {
        "text": text,
        "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]),
        "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]),
        "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]),
        "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    hp = {
        "lr": jnp.float32(lr),
        "word_loss_weight": jnp.float32(wlw),
        "opt_code": jnp.int32(OPT_CODES[optimizer_kind]),
        "norm_code": jnp.int32(NORM_CODES[None]),
        "n_epochs": jnp.int32(n_epochs),
    }
    spec = LatentFitSpec(
        n_epochs_max=n_epochs, batch_size=bsz, train_decoder=True,
        unimodal=False, shuffle=False,
    )
    got_embed, _, got_losses = jax.jit(
        lambda r, e, p: fit_latents(r, e, p, data, vocab, hp, spec)
    )(jax.random.key(0), jnp.asarray(d["init_embed"]), dec_params)

    np.testing.assert_allclose(
        np.asarray(got_losses), np.asarray(want_losses), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_embed), want_embed, rtol=0, atol=2e-4
    )


@pytest.mark.parametrize("norm", ["layer_norm", "batch_norm"])
def test_fit_latents_norm_matches_torch(rng, norm):
    """Trajectory parity including the norm layer (models.py:161-168,187-191;
    BatchNorm1d always in training mode — reference never calls .eval())."""
    d = _make_tiny(rng)  # n=13 → last batch of 3 exercises masked-BN padding
    n, D = d["init_embed"].shape
    A, Vis = d["audio"].shape[-1], d["visual"].shape[-1]
    n_epochs, lr, bsz, wlw = 2, 1e-3, 5, 0.002

    dims = {h: head_dims(h, D, A, Vis) for h in MMB2_HEADS}
    tm = TorchRefMMB(MMB2_HEADS, D, dims)
    t_norm = (torch.nn.LayerNorm(D) if norm == "layer_norm"
              else torch.nn.BatchNorm1d(D))

    # snapshot initial weights BEFORE torch trains them in place
    heads_jax = {}
    for h in MMB2_HEADS:
        heads_jax[h] = {
            "w_mu": jnp.array(tm.mods[h]["mu"].weight.detach().numpy().T),
            "b_mu": jnp.array(tm.mods[h]["mu"].bias.detach().numpy()),
            "w_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].weight.detach().numpy().T),
            "b_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].bias.detach().numpy()),
        }
    dec_params = {"heads": heads_jax,
                  "norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}}

    # torch loop with norm before the heads
    vocab_t = torch.tensor(d["vocab"])
    ids_t = torch.tensor(d["ids"], dtype=torch.long)
    se_all = vocab_t[ids_t]
    ww_all = torch.tensor(d["vw"])[ids_t]
    tok_m = torch.tensor(d["token_mask"])
    audio, visual = torch.tensor(d["audio"]), torch.tensor(d["visual"])
    am, vm = torch.tensor(d["audio_mask"]), torch.tensor(d["visual_mask"])
    embed = torch.tensor(d["init_embed"].copy())
    embed.requires_grad = True
    opt = torch.optim.SGD(
        [embed] + list(tm.parameters()) + list(t_norm.parameters()), lr=lr
    )
    want_losses = []
    for _ in range(n_epochs):
        ep = 0.0
        for s in range(0, n, bsz):
            j = torch.arange(s, min(s + bsz, n))
            opt.zero_grad()
            x = t_norm(embed[j])
            out = {
                h: {"mu": m["mu"](x), "sigma": m["log_sigma"](x).exp()}
                for h, m in tm.mods.items()
            }
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
            loss = (-(sum(lps) * other + wlw * word_lp)).mean()
            loss.backward()
            opt.step()
            ep += float(loss)
        want_losses.append(ep)

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
        "opt_code": jnp.int32(0), "norm_code": jnp.int32(NORM_CODES[norm]),
        "n_epochs": jnp.int32(n_epochs),
    }
    spec = LatentFitSpec(n_epochs_max=n_epochs, batch_size=bsz,
                         train_decoder=True, unimodal=False, shuffle=False)
    _, _, got_losses = fit_latents(
        jax.random.key(0), jnp.asarray(d["init_embed"]), dec_params, data_j,
        vocab, hp, spec,
    )
    np.testing.assert_allclose(np.asarray(got_losses), np.asarray(want_losses),
                               rtol=3e-4, atol=3e-4)


def test_fit_latents_norms_run(rng):
    """layer_norm / batch_norm paths compile and decrease the loss."""
    d = _make_tiny(rng)
    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data = {
        "text": text,
        "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]),
        "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]),
        "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]),
        "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    from mmtpu.models.decoder import init_decoder

    dec = init_decoder(jax.random.key(1), 8, 4, 3, unimodal=True)
    for norm in ("layer_norm", "batch_norm"):
        hp = {
            "lr": jnp.float32(1e-3),
            "word_loss_weight": jnp.float32(0.002),
            "opt_code": jnp.int32(OPT_CODES["adam"]),
            "norm_code": jnp.int32(NORM_CODES[norm]),
            "n_epochs": jnp.int32(4),
        }
        spec = LatentFitSpec(
            n_epochs_max=4, batch_size=5, train_decoder=True, unimodal=True
        )
        _, _, losses = fit_latents(
            jax.random.key(2), jnp.asarray(d["init_embed"]), dec, data, vocab,
            hp, spec,
        )
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


def test_epoch_masking_freezes_state(rng):
    """Configs with n_epochs < n_epochs_max must stop updating exactly there."""
    d = _make_tiny(rng)
    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data = {
        "text": text,
        "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]),
        "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]),
        "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]),
        "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    from mmtpu.models.decoder import init_decoder

    dec = init_decoder(jax.random.key(1), 8, 4, 3, unimodal=False)

    def run(n_epochs, n_epochs_max):
        hp = {
            "lr": jnp.float32(1e-2),
            "word_loss_weight": jnp.float32(0.002),
            "opt_code": jnp.int32(OPT_CODES["sgd"]),
            "norm_code": jnp.int32(0),
            "n_epochs": jnp.int32(n_epochs),
        }
        spec = LatentFitSpec(
            n_epochs_max=n_epochs_max, batch_size=5, train_decoder=True,
            unimodal=False, shuffle=False,
        )
        e, p, _ = fit_latents(
            jax.random.key(2), jnp.asarray(d["init_embed"]), dec, data, vocab,
            hp, spec,
        )
        return np.asarray(e), p

    e_exact, _ = run(2, 2)
    e_masked, _ = run(2, 5)
    np.testing.assert_allclose(e_masked, e_exact, rtol=0, atol=1e-6)


def test_unroll_is_semantics_neutral(rng):
    """lax.scan unroll merges iterations without changing results."""
    from mmtpu.models.decoder import init_decoder

    d = _make_tiny(rng)
    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data = {
        "text": text, "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]), "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]), "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]), "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    dec = init_decoder(jax.random.key(1), 8, 4, 3, unimodal=False)
    hp = {"lr": jnp.float32(1e-3), "word_loss_weight": jnp.float32(0.002),
          "opt_code": jnp.int32(1), "norm_code": jnp.int32(1),
          "n_epochs": jnp.int32(4)}
    by_layout = {}
    for stacked in (False, True):
        outs = []
        for u in (1, 4):
            spec = LatentFitSpec(n_epochs_max=4, batch_size=5,
                                 train_decoder=True, unimodal=False,
                                 shuffle=False, unroll=u,
                                 stacked_heads=stacked)
            e, _, l = fit_latents(jax.random.key(2),
                                  jnp.asarray(d["init_embed"]),
                                  dec, data, vocab, hp, spec)
            outs.append((np.asarray(e), np.asarray(l)))
        if stacked:
            # the wide stacked GEMM may tile differently across unroll
            # factors — bit-level only (measured max 3e-8)
            np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=0, atol=1e-6)
            np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=0, atol=1e-4)
        else:
            np.testing.assert_array_equal(outs[0][0], outs[1][0])
            np.testing.assert_array_equal(outs[0][1], outs[1][1])
        by_layout[stacked] = outs[0]
    # layout equivalence: stacking is the same math per output element
    # (measured: 1.8e-7 embed / 1.5e-5 on ~3e3-magnitude loss sums)
    np.testing.assert_allclose(by_layout[True][0], by_layout[False][0],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(by_layout[True][1], by_layout[False][1],
                               rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("kind", ["sgd", "adam"])
def test_static_kind_matches_branchless(rng, kind):
    """The static-kind fits (epoch-permuted tables, contiguous slices,
    Adam's permuted moment tables + dense-grad-by-update-slice) must equal
    the branchless runtime-code path (classic dense layout) exactly — the
    two paths are different memory layouts of the same math."""
    d = _make_tiny(rng)
    n, D = d["init_embed"].shape
    dims = {h: head_dims(h, D, d["audio"].shape[-1], d["visual"].shape[-1])
            for h in MMB2_HEADS}
    tm = TorchRefMMB(MMB2_HEADS, D, dims)
    dec_params = {"heads": {
        h: {
            "w_mu": jnp.array(tm.mods[h]["mu"].weight.detach().numpy().T),
            "b_mu": jnp.array(tm.mods[h]["mu"].bias.detach().numpy()),
            "w_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].weight.detach().numpy().T),
            "b_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].bias.detach().numpy()),
        } for h in MMB2_HEADS
    }, "norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}}
    vocab = jnp.asarray(d["vocab"])
    data = {
        "text": jnp.asarray(d["vocab"][d["ids"]]),
        "text_weights": jnp.asarray(d["vw"][d["ids"]]),
        "text_mask": jnp.asarray(d["token_mask"]),
        "text_gauss": jnp.asarray(d["vocab"][d["ids"]]),
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]),
        "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]),
        "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    hp = {
        "lr": jnp.float32(1e-2),
        "word_loss_weight": jnp.float32(0.002),
        "opt_code": jnp.int32(OPT_CODES[kind]),
        "norm_code": jnp.int32(NORM_CODES[None]),
        "n_epochs": jnp.int32(3),
    }
    mk = lambda k: LatentFitSpec(
        n_epochs_max=3, batch_size=5, train_decoder=True, unimodal=False,
        shuffle=True, opt_kind=k,
    )
    run = lambda k: jax.jit(
        lambda r, e, p: fit_latents(r, e, p, data, vocab, hp, mk(k)),
    )(jax.random.key(7), jnp.asarray(d["init_embed"]), dec_params)
    e_ref, dec_ref, l_ref = run(None)
    e_st, dec_st, l_st = run(kind)
    np.testing.assert_allclose(np.asarray(l_st), np.asarray(l_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e_st), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(dec_st), jax.tree.leaves(dec_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fit_latents_dot_prod_matches_torch(rng):
    """Trajectory parity for the dot_prod word metric — a torch
    transliteration of the EVIDENTLY INTENDED semantics (losses.py:126-151,
    get_word_log_prob_dot_prod2; the reference CLI's own dot_prod selection
    is arity-broken at simplesif.py:508-509) through a short fit_latents run.

    The reference L2-normalizes the vocabulary for dot_prod
    (simplesif.py:292-293) — both sides consume the normalized table here.
    """
    d = _make_tiny(rng)
    d["vocab"] /= np.linalg.norm(d["vocab"], axis=-1, keepdims=True)
    n, D = d["init_embed"].shape
    n_epochs, lr, bsz, wlw = 3, 1e-2, 5, 0.002

    dims = {h: head_dims(h, D, d["audio"].shape[-1], d["visual"].shape[-1])
            for h in MMB2_HEADS}
    tm = TorchRefMMB(MMB2_HEADS, D, dims)
    heads_jax = {}
    for h in MMB2_HEADS:
        heads_jax[h] = {
            "w_mu": jnp.array(tm.mods[h]["mu"].weight.detach().numpy().T),
            "b_mu": jnp.array(tm.mods[h]["mu"].bias.detach().numpy()),
            "w_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].weight.detach().numpy().T),
            "b_log_sigma": jnp.array(
                tm.mods[h]["log_sigma"].bias.detach().numpy()),
        }
    dec_params = {
        "heads": heads_jax,
        "norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }

    def torch_word_dotprod(latents, vocab, ww, se, mask2d, a=1e-3):
        # losses.py:138-150 (dot_prod2): softmax-form Arora mixture
        z = latents.matmul(vocab.transpose(0, 1)).exp().sum(-1, keepdim=True)
        alpha = 1.0 / (z * a + 1.0)
        unigram = alpha * ww
        dot = torch.bmm(se, latents.unsqueeze(-1)).squeeze(-1)
        context = (1.0 - alpha) * dot.exp() / z
        return (torch.log(unigram + context) * mask2d).sum(dim=-1)

    # torch reference loop with the word fn swapped (optimize_latents
    # structure is metric-independent, simplesif.py:49-162)
    want_embed, want_losses = _run_torch_reference(
        d, False, n_epochs, lr, bsz, wlw, "sgd", tm, d["init_embed"],
        word_fn=torch_word_dotprod,
    )

    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data = {
        "text": text,
        "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]),
        "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]),
        "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]),
        "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    hp = {
        "lr": jnp.float32(lr),
        "word_loss_weight": jnp.float32(wlw),
        "opt_code": jnp.int32(OPT_CODES["sgd"]),
        "norm_code": jnp.int32(NORM_CODES[None]),
        "n_epochs": jnp.int32(n_epochs),
    }
    spec = LatentFitSpec(
        n_epochs_max=n_epochs, batch_size=bsz, train_decoder=True,
        unimodal=False, shuffle=False, word_metric="dot_prod",
    )
    got_embed, _, got_losses = jax.jit(
        lambda r, e, p: fit_latents(r, e, p, data, vocab, hp, spec)
    )(jax.random.key(0), jnp.asarray(d["init_embed"]), dec_params)

    np.testing.assert_allclose(
        np.asarray(got_losses), np.asarray(want_losses), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_embed), want_embed, rtol=0, atol=2e-4
    )



@pytest.mark.parametrize("shuffle", [False, True])
def test_lazy_adam_matches_dense(rng, shuffle):
    """Epoch-level lazy Adam (slice-only steps + per-epoch catch-up/epilogue
    closed forms — mmtpu/train/optim.py) must reproduce the dense torch-exact
    path to float-rounding noise, including inactive-epoch state freezing
    (n_epochs < n_epochs_max) and shuffled epochs.  Short-horizon losses are
    bit-equal (measured 0 through 3 epochs); longer fits drift only through
    trajectory chaos, well inside the licensed bf16 envelope
    (PRECISION_STUDY.json)."""
    d = _make_tiny(rng)
    ids = jnp.asarray(d["ids"])
    vocab = jnp.asarray(d["vocab"])
    text = vocab[ids]
    data = {
        "text": text, "text_weights": jnp.asarray(d["vw"])[ids],
        "text_mask": jnp.asarray(d["token_mask"]), "text_gauss": text,
        "text_gauss_mask": jnp.asarray(d["token_mask"]),
        "audio": jnp.asarray(d["audio"]),
        "audio_mask": jnp.asarray(d["audio_mask"]),
        "visual": jnp.asarray(d["visual"]),
        "visual_mask": jnp.asarray(d["visual_mask"]),
    }
    from mmtpu.models.decoder import init_decoder

    init = jnp.asarray(d["init_embed"])
    dec = init_decoder(jax.random.key(1), init.shape[1],
                       d["audio"].shape[-1], d["visual"].shape[-1],
                       unimodal=False)
    hp = {"lr": jnp.float32(1e-3), "word_loss_weight": jnp.float32(0.002),
          "opt_code": jnp.int32(OPT_CODES["adam"]),
          "norm_code": jnp.int32(NORM_CODES["layer_norm"]),
          "n_epochs": jnp.int32(5)}
    outs = {}
    for lazy in (False, True):
        spec = LatentFitSpec(n_epochs_max=7, batch_size=5, train_decoder=True,
                             unimodal=False, shuffle=shuffle, opt_kind="adam",
                             lazy_adam=lazy)
        e, _, l = jax.jit(fit_latents, static_argnums=(6,))(
            jax.random.key(2), init, dec, data, vocab, hp, spec)
        outs[lazy] = (np.asarray(e), np.asarray(l))
    # measured: dEmbed <= 4.8e-7, loss rel <= 1.8e-4 at this size/horizon
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=2e-3, atol=1e-6)
    # inactive epochs (5..6) must freeze identically: identical losses there
    np.testing.assert_allclose(outs[True][1][5:], outs[False][1][5:],
                               rtol=2e-3)
