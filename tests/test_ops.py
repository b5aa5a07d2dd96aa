"""Golden-value tests for mmtpu.ops against independent numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from mmtpu import ops
from tests import oracles


def _rand_tokens(rng, n, l, v, neg_frac=0.1):
    ids = rng.integers(0, v, size=(n, l))
    neg = rng.random((n, l)) < neg_frac
    return np.where(neg, -1, ids).astype(np.int64)


class TestSif:
    def test_seq_weights(self, rng):
        ids = _rand_tokens(rng, 7, 11, 50)
        w = rng.random(50).astype(np.float32)
        got = np.asarray(ops.seq_weights(jnp.asarray(ids), jnp.asarray(w)))
        want = oracles.oracle_seq2weight(ids, w)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_weighted_average(self, rng):
        We = rng.standard_normal((50, 16)).astype(np.float32)
        ids = rng.integers(0, 50, size=(9, 12))
        w = rng.random((9, 12)).astype(np.float32)
        w[rng.random((9, 12)) < 0.3] = 0.0
        got = np.asarray(
            ops.sif_weighted_average(jnp.asarray(We), jnp.asarray(ids), jnp.asarray(w))
        )
        want = oracles.oracle_weighted_average(We, ids, w)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_first_pc_matches_sklearn(self, rng):
        from sklearn.decomposition import TruncatedSVD

        x = rng.standard_normal((40, 12)).astype(np.float32) + 0.5
        svd = TruncatedSVD(n_components=1, n_iter=7, random_state=0)
        svd.fit(x)
        want = svd.components_[0]
        got = np.asarray(ops.first_pc(jnp.asarray(x)))
        # sign-invariant, tolerance-based comparison: sklearn's randomized
        # SVD at n_iter=7 is itself approximate vs our exact eigendecomposition
        if np.dot(got, want) < 0:
            got = -got
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-5

    def test_remove_pc_matches_sklearn(self, rng):
        from sklearn.decomposition import TruncatedSVD

        x = rng.standard_normal((40, 12)).astype(np.float32) + 0.5
        svd = TruncatedSVD(n_components=1, n_iter=7, random_state=0)
        svd.fit(x)
        pc = svd.components_
        want = x - x.dot(pc.T) * pc
        got = np.asarray(ops.remove_pc(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-2)

    def test_sif_embedding_end_to_end(self, rng):
        We = rng.standard_normal((60, 8)).astype(np.float32)
        ids = _rand_tokens(rng, 15, 10, 60)
        vw = rng.random(60).astype(np.float32)
        w = oracles.oracle_seq2weight(ids, vw)
        emb_np = oracles.oracle_weighted_average(We, np.maximum(ids, 0), w)
        # the oracle gathers We[x] directly; negative ids have zero weight so
        # clamping to 0 is equivalent
        from sklearn.decomposition import TruncatedSVD

        svd = TruncatedSVD(n_components=1, n_iter=7, random_state=0)
        svd.fit(emb_np)
        pc = svd.components_
        want = emb_np - emb_np.dot(pc.T) * pc

        got = np.asarray(
            ops.sif_embedding(
                jnp.asarray(We),
                jnp.asarray(ids),
                ops.seq_weights(jnp.asarray(ids), jnp.asarray(vw)),
            )
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


class TestGaussian:
    def test_matches_oracle(self, rng):
        B, L, F = 5, 7, 6
        mu = rng.standard_normal((B, F)).astype(np.float32)
        sigma = np.exp(rng.standard_normal((B, F)).astype(np.float32) * 0.3)
        values = rng.standard_normal((B, L, F)).astype(np.float32)
        mask = (rng.random((B, L, F)) < 0.8).astype(np.float32)
        got = np.asarray(
            ops.gaussian_logpdf_masked(
                jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(values), jnp.asarray(mask)
            )
        )
        want = oracles.oracle_gaussian_logprob(mu, sigma, values, mask)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_matches_torch_reference_formula(self, rng):
        """Cross-check against a direct torch transliteration of losses.py:13-33."""
        import torch

        B, L, F = 4, 6, 5
        mu = rng.standard_normal((B, F)).astype(np.float32)
        sigma = np.exp(rng.standard_normal((B, F)).astype(np.float32) * 0.2)
        values = rng.standard_normal((B, L, F)).astype(np.float32)
        mask = (rng.random((B, L, F)) < 0.7).astype(np.float32)

        t_mu = torch.tensor(mu).unsqueeze(1)
        t_sig = torch.tensor(sigma).unsqueeze(1)
        sig_sq = t_sig.pow(2)
        term1 = torch.log(1.0 / torch.sqrt(2.0 * np.pi * sig_sq))
        term2 = (torch.tensor(values) - t_mu).pow(2) / (2.0 * sig_sq)
        want = ((term1 - term2) * torch.tensor(mask)).squeeze().sum(-1).sum(-1).numpy()

        got = np.asarray(
            ops.gaussian_logpdf_masked(
                jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(values), jnp.asarray(mask)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestWordProb:
    def _setup(self, rng, B=4, L=6, V=30, D=8):
        latents = rng.standard_normal((B, D)).astype(np.float32)
        vocab = rng.standard_normal((V, D)).astype(np.float32)
        ids = rng.integers(0, V, size=(B, L))
        vw = (rng.random(V) * 0.9 + 0.05).astype(np.float32)
        word_weights = vw[ids]
        sent_emb = vocab[ids]
        mask = (rng.random((B, L)) < 0.8).astype(np.float32)
        return latents, vocab, word_weights, sent_emb, mask

    def test_angular_matches_oracle(self, rng):
        latents, vocab, ww, se, mask = self._setup(rng)
        got = np.asarray(
            ops.word_logprob_angular(
                jnp.asarray(latents), jnp.asarray(vocab), jnp.asarray(ww),
                jnp.asarray(se), jnp.asarray(mask), a=1e-3,
            )
        )
        want = oracles.oracle_word_logprob_angular(latents, vocab, ww, se, mask, 1e-3)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_angular_matches_torch_reference(self, rng):
        """Cross-check against a direct torch transliteration of losses.py:68-95."""
        import torch

        latents, vocab, ww, se, mask = self._setup(rng, B=3, L=5, V=20, D=6)
        coss = torch.nn.CosineSimilarity(dim=-1)
        t_lat, t_voc = torch.tensor(latents), torch.tensor(vocab)
        cosine_sims = coss(t_lat.unsqueeze(1), t_voc.unsqueeze(0))
        z = (1.0 - cosine_sims.acos() / np.pi).sum(-1, keepdim=True)
        alpha = 1.0 / (z * 1e-3 + 1.0)
        unigram = alpha * torch.tensor(ww)
        score = 1.0 - (coss(torch.tensor(se), t_lat.unsqueeze(1)).acos() / np.pi)
        context = (1.0 - alpha) * score / z
        mask3 = np.broadcast_to(mask[:, :, None], se.shape).copy()
        logp = torch.log(unigram + context) * torch.tensor(mask3)[:, :, 0]
        want = logp.sum(dim=-1).numpy()

        got = np.asarray(
            ops.word_logprob_angular(
                jnp.asarray(latents), jnp.asarray(vocab), jnp.asarray(ww),
                jnp.asarray(se), jnp.asarray(mask3), a=1e-3,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_dot_prod_matches_oracle(self, rng):
        latents, vocab, ww, se, mask = self._setup(rng)
        latents *= 0.3  # keep exp() tame
        got = np.asarray(
            ops.word_logprob_dot_prod(
                jnp.asarray(latents), jnp.asarray(vocab), jnp.asarray(ww),
                jnp.asarray(se), jnp.asarray(mask), a=1e-3,
            )
        )
        want = oracles.oracle_word_logprob_dot(latents, vocab, ww, se, mask, 1e-3)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_angular_grad_finite(self, rng):
        import jax

        latents, vocab, ww, se, mask = self._setup(rng)

        def loss(lat):
            return -ops.word_logprob_angular(
                lat, jnp.asarray(vocab), jnp.asarray(ww), jnp.asarray(se),
                jnp.asarray(mask),
            ).mean()

        g = jax.grad(loss)(jnp.asarray(latents))
        assert np.isfinite(np.asarray(g)).all()

    def test_angular_grad_finite_at_collinear(self, rng):
        """Latent exactly equal to a vocab vector must still have finite grad."""
        import jax

        latents, vocab, ww, se, mask = self._setup(rng)
        latents[0] = vocab[0]
        se[0, 0] = vocab[0]

        def loss(lat):
            return -ops.word_logprob_angular(
                lat, jnp.asarray(vocab), jnp.asarray(ww), jnp.asarray(se),
                jnp.asarray(mask),
            ).mean()

        g = jax.grad(loss)(jnp.asarray(latents))
        assert np.isfinite(np.asarray(g)).all()


class TestPosEnc:
    def test_bug_parity_matches_reference(self, rng):
        data = rng.standard_normal((6, 9, 3)).astype(np.float32)
        for p in (2, 4):
            got = np.asarray(
                ops.add_positional_embeddings(jnp.asarray(data), p, bug_parity=True)
            )
            want = oracles.oracle_posenc_reference_bug(data, p)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_correct_mode_shape_and_values(self):
        pe = np.asarray(ops.positional_encoding(10, 4))
        assert pe.shape == (10, 4)
        # channel 0: sin(pos), channel 1: cos(pos)
        np.testing.assert_allclose(pe[:, 0], np.sin(np.arange(10)), atol=1e-6)
        np.testing.assert_allclose(pe[:, 1], np.cos(np.arange(10)), atol=1e-6)
        # channel 2: sin(pos / 10000^(2/4))
        np.testing.assert_allclose(
            pe[:, 2], np.sin(np.arange(10) / 10000 ** 0.5), atol=1e-6
        )


class TestJoint:
    def test_weighted_sum(self, rng):
        B, L = 3, 4
        dims = {"audio": 5, "visual": 6}
        head_params, data, masks = {}, {}, {}
        want_heads = {}
        for m, f in dims.items():
            mu = rng.standard_normal((B, f)).astype(np.float32)
            sigma = np.exp(rng.standard_normal((B, f)).astype(np.float32) * 0.2)
            vals = rng.standard_normal((B, L, f)).astype(np.float32)
            mask = (rng.random((B, L, f)) < 0.8).astype(np.float32)
            head_params[m] = {"mu": jnp.asarray(mu), "sigma": jnp.asarray(sigma)}
            data[m] = jnp.asarray(vals)
            masks[m] = jnp.asarray(mask)
            want_heads[m] = oracles.oracle_gaussian_logprob(mu, sigma, vals, mask)
        word_lp = rng.standard_normal(B).astype(np.float32)

        w = 0.002
        got = np.asarray(
            ops.joint_log_prob(head_params, data, masks, jnp.asarray(word_lp), w)
        )
        other = (1.0 - w) / 2
        want = (want_heads["audio"] + want_heads["visual"]) * other + w * word_lp
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        got_unweighted = np.asarray(
            ops.joint_log_prob(head_params, data, masks, jnp.asarray(word_lp), None)
        )
        np.testing.assert_allclose(
            got_unweighted,
            want_heads["audio"] + want_heads["visual"] + word_lp,
            rtol=1e-4, atol=1e-4,
        )


class TestClosedForm:
    def test_matches_oracle(self, rng):
        B, L, D = 4, 5, 8
        dims = {"audio": 6, "visual": 7, "audiovisual": 13}
        data_np, heads_np, heads_jax, data_jax = {}, {}, {}, {}
        for k, f in dims.items():
            d = rng.standard_normal((B, L, f)).astype(np.float32)
            w_mu = rng.standard_normal((f, D)).astype(np.float32) * 0.1
            w_ls = rng.standard_normal((f, D)).astype(np.float32) * 0.1
            b_mu = rng.standard_normal(f).astype(np.float32) * 0.1
            b_ls = rng.standard_normal(f).astype(np.float32) * 0.1
            data_np[k] = d
            heads_np[k] = {
                "w_mu": w_mu, "w_log_sigma": w_ls, "b_mu": b_mu, "b_log_sigma": b_ls,
            }
            data_jax[k] = jnp.asarray(d)
            heads_jax[k] = {
                "w_mu": jnp.asarray(w_mu.T),  # mmtpu stores (D, F)
                "w_log_sigma": jnp.asarray(w_ls.T),
                "b_mu": jnp.asarray(b_mu),
                "b_log_sigma": jnp.asarray(b_ls),
            }
        sw = rng.random((B, L)).astype(np.float32)
        se = rng.standard_normal((B, L, D)).astype(np.float32)

        got = np.asarray(
            ops.closed_form_latents(data_jax, heads_jax, jnp.asarray(sw), jnp.asarray(se))
        )
        want = oracles.oracle_closed_form(data_np, heads_np, sw, se)
        # atol dominated by f32-vs-f64 cancellation in the total_weight sum
        # (q_sigma terms have ~zero mean), not by any semantic difference.
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)


class TestGaussianSuffStats:
    def test_exact_equivalence(self, rng):
        """suff-stats form == direct masked form (quadratic-in-mu identity)."""
        from mmtpu.ops.gaussian import (
            gaussian_logpdf_masked,
            gaussian_logpdf_suffstats,
            gaussian_suff_stats,
        )

        B, L, F = 6, 9, 7
        mu = rng.standard_normal((B, F)).astype(np.float32)
        sigma = np.exp(rng.standard_normal((B, F)).astype(np.float32) * 0.3)
        values = rng.standard_normal((B, L, F)).astype(np.float32) * 2
        mask = (rng.random((B, L, F)) < 0.8).astype(np.float32)
        want = gaussian_logpdf_masked(
            jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(values), jnp.asarray(mask)
        )
        s0, s1, s2 = gaussian_suff_stats(jnp.asarray(values), jnp.asarray(mask))
        got = gaussian_logpdf_suffstats(
            jnp.asarray(mu), jnp.asarray(sigma), s0, s1, s2
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)
        # gradients agree too (what training actually consumes)
        import jax as _jax

        g_want = _jax.grad(
            lambda m: gaussian_logpdf_masked(
                m, jnp.asarray(sigma), jnp.asarray(values), jnp.asarray(mask)
            ).sum()
        )(jnp.asarray(mu))
        g_got = _jax.grad(
            lambda m: gaussian_logpdf_suffstats(m, jnp.asarray(sigma), s0, s1, s2).sum()
        )(jnp.asarray(mu))
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-4, atol=1e-4)

    def test_token_mask_form(self, rng):
        from mmtpu.ops.gaussian import (
            gaussian_logpdf_masked,
            gaussian_logpdf_suffstats,
            gaussian_suff_stats,
        )

        B, L, F = 4, 6, 5
        mu = rng.standard_normal((B, F)).astype(np.float32)
        sigma = np.exp(rng.standard_normal((B, F)).astype(np.float32) * 0.2)
        values = rng.standard_normal((B, L, F)).astype(np.float32)
        mask2d = (rng.random((B, L)) < 0.7).astype(np.float32)  # token mask
        want = gaussian_logpdf_masked(
            jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(values),
            jnp.asarray(mask2d),
        )
        s0, s1, s2 = gaussian_suff_stats(jnp.asarray(values), jnp.asarray(mask2d))
        got = gaussian_logpdf_suffstats(jnp.asarray(mu), jnp.asarray(sigma), s0, s1, s2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)
