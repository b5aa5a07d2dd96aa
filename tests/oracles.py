"""Tiny, independent numpy oracles for golden-value tests.

Each oracle re-implements the mathematical *behavior* of a cited reference
routine (file:line noted per function) directly from its definition, in plain
numpy, as straightforwardly as possible — deliberately NOT the vectorized
forms used by mmtpu, so tests cross-check two independent derivations.
"""

import numpy as np


def oracle_seq2weight(seq, weight4ind):
    """Behavior of sif_functions.py:8-15 with an all-ones mask."""
    out = np.zeros(seq.shape, dtype=np.float32)
    for i in range(seq.shape[0]):
        for j in range(seq.shape[1]):
            if seq[i, j] >= 0:
                out[i, j] = weight4ind[seq[i, j]]
    return out


def oracle_weighted_average(We, x, w):
    """Behavior of sif_functions.py:28-56 (per-sentence loop)."""
    emb = np.zeros((x.shape[0], We.shape[1]))
    for i in range(x.shape[0]):
        emb[i, :] = w[i, :].dot(We[x[i, :], :]) / max(np.count_nonzero(w[i, :]), 1)
    return emb


def oracle_gaussian_logprob(mu, sigma, values, mask):
    """Behavior of losses.py:13-33."""
    sig_sq = sigma[:, None, :] ** 2
    term1 = np.log(1.0 / np.sqrt(2.0 * np.pi * sig_sq))
    term2 = (values - mu[:, None, :]) ** 2 / (2.0 * sig_sq)
    return ((term1 - term2) * mask).sum(-1).sum(-1)


def _cos(a, b, eps=1e-8):
    num = (a * b).sum(-1)
    return num / np.maximum(np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), eps)


def oracle_word_logprob_angular(latents, vocab, word_weights, sent_emb, mask2d, a):
    """Behavior of losses.py:68-95 (angular2)."""
    B, L = word_weights.shape
    out = np.zeros(B)
    for i in range(B):
        cos_v = np.array([_cos(latents[i], vocab[v]) for v in range(vocab.shape[0])])
        z = (1.0 - np.arccos(np.clip(cos_v, -1, 1)) / np.pi).sum()
        alpha = 1.0 / (z * a + 1.0)
        total = 0.0
        for l in range(L):
            score = 1.0 - np.arccos(np.clip(_cos(sent_emb[i, l], latents[i]), -1, 1)) / np.pi
            p = alpha * word_weights[i, l] + (1.0 - alpha) * score / z
            total += np.log(p) * mask2d[i, l]
        out[i] = total
    return out


def oracle_word_logprob_dot(latents, vocab, word_weights, sent_emb, mask2d, a):
    """Behavior of losses.py:126-151 (dot_prod2)."""
    B, L = word_weights.shape
    out = np.zeros(B)
    for i in range(B):
        z = np.exp(vocab @ latents[i]).sum()
        alpha = 1.0 / (z * a + 1.0)
        total = 0.0
        for l in range(L):
            p = alpha * word_weights[i, l] + (1.0 - alpha) * np.exp(
                sent_emb[i, l] @ latents[i]
            ) / z
            total += np.log(p) * mask2d[i, l]
        out[i] = total
    return out


def oracle_posenc_reference_bug(data, pos_embed_dim):
    """Behavior of utils.py:130-153, including the batch-axis indexing bug."""
    seq_len = data.shape[1]
    n_points = data.shape[0]
    idxes = np.arange(seq_len, dtype=np.float32)
    idxes = np.tile(idxes, [n_points, pos_embed_dim, 1])
    idxes = np.transpose(idxes, [0, 2, 1])
    for i in range(pos_embed_dim // 2):
        if 2 * i >= n_points:
            break
        idxes[2 * i, :] = np.sin(idxes[2 * i, :] / (10000 ** (2 * i / pos_embed_dim)))
        if 2 * i + 1 < n_points:
            idxes[2 * i + 1, :] = np.cos(
                idxes[2 * i + 1, :] / (10000 ** (2 * i / pos_embed_dim))
            )
    return np.concatenate([data, idxes], axis=-1)


def oracle_closed_form(data, heads, sentence_weights, sent_embeddings):
    """Behavior of sif2.py:103-114 + 164-208.

    `heads[k]` uses torch Linear layout: w_mu/w_log_sigma of shape (F, D),
    biases (F,).
    """
    q_mu, q_sigma = {}, {}
    total = sentence_weights.sum(-1)
    for k, d in data.items():
        b_mu = heads[k]["b_mu"].reshape(1, 1, -1)
        b_ls = heads[k]["b_log_sigma"].reshape(1, 1, -1)
        qm = (d - b_mu) / np.exp(2 * b_ls)
        qs = (d - b_mu) ** 2 / np.exp(2 * b_ls) - 1.0
        q_mu[k], q_sigma[k] = qm, qs
        total = total + qm.sum(-1).sum(-1) + qs.sum(-1).sum(-1)
    total = total.reshape(-1, 1, 1)
    swn = sentence_weights / total[:, :, 0]
    cs = np.einsum("bl,bld->bd", swn, sent_embeddings)
    for k in data:
        cs = cs + np.matmul(q_mu[k] / total, heads[k]["w_mu"]).sum(1)
        cs = cs + np.matmul(q_sigma[k] / total, heads[k]["w_log_sigma"]).sum(1)
    return cs / np.linalg.norm(cs, axis=1, keepdims=True)
