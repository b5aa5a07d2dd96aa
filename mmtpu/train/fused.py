"""Fused decoder-update training step (manual chain rule around the kernel).

Replaces the ``value_and_grad(loss)(embed, dec[, sen]) → opt_update(dec, …)``
pair of a training step with a restructured backward in which the decoder
head weights' gradient GEMM, optimizer update, and latent cotangent all run
inside ONE Pallas pass per weight leaf (``mmtpu.kernels.decoder_update``) —
same math, one contiguous HBM stream instead of ~36 skinny per-head fusions.

Decomposition (heads use the STACKED layout, ``models.decoder.stack_decoder``
with ``pad_to`` = the kernel's F tile):

    x            = apply_norm(rows, norm_params)          [vjp recorded]
    z_mu, z_sig  = x @ w_mu + b_mu,  x @ w_sig + b_sig    [forward GEMMs]
    loss         = L(rows, z_mu, z_sig, extra_params)     [vjp recorded:
                   word likelihood + per-head Gaussians on z slices
                   (+ the e2e sentiment term via ``combine``)]
    g_z*         from the loss vjp;  g_b* = Σ_B g_z*
    w', m', v', g_x = fused kernel(w, m, v, x, g_z)       [one HBM pass]
    g_rows       = g_rows_direct + vjp_norm(Σ g_x)
    b*, norm     updated by plain ``opt_update``          [tiny leaves]

Gradient-equivalence to the autodiff path is exact real arithmetic (the
chain rule is associative); float differences come only from matmul
accumulation order, verified in tests/test_fused_update.py.  The loss the
reference computes per step is unchanged (``losses.py:216-274``,
``simplesif.py:786``).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from mmtpu.kernels.decoder_update import (
    fused_gemm_adam_update,
    fused_gemm_sgd_update,
)
from mmtpu.models.decoder import MMB1_HEADS, MMB2_HEADS, apply_norm
from mmtpu.train.optim import _B1, _B2, OptState, opt_update


def fused_joint_step(
    dec,
    d_opt: OptState,
    rows: jax.Array,
    b: Mapping[str, jax.Array],
    vocab_emb: jax.Array,
    hp: Mapping[str, jax.Array],
    spec,
    row_valid,
    active,
    *,
    heads_gate,
    norm_gate,
    extra_params=None,
    combine=None,
):
    """One training step's loss/gradients with the fused decoder update.

    Args:
        dec: STACKED decoder pytree (``{"heads": {w_mu, b_mu, w_log_sigma,
            b_log_sigma}, "norm": …}``), feature axis optionally zero-padded.
        d_opt: decoder ``OptState`` matching ``dec`` ("adam") or
            ``m=v=None`` ("sgd").
        rows: ``(B, D)`` latent minibatch (the differentiated argument).
        heads_gate / norm_gate: 0/1 per-config freeze gates (``train_dec`` /
            ``train_heads`` semantics — latents.py / e2e.py callers).
        extra_params, combine: optional extra loss term —
            ``combine(extra_params, neg_joint_ps, rows) -> (B,)`` per-sample
            loss (the e2e sentiment term, ``simplesif.py:786``); its
            parameter gradients are returned for the caller's own update.

    Returns:
        ``(loss, g_rows, g_extra, dec2, d_opt2)``.
    """
    from mmtpu.train.latents import _head_log_prob, _word_logprob, head_width

    assert spec.opt_kind in ("sgd", "adam"), "fused path needs a static kind"
    assert spec.batch_shard_axis is None, "fused path is per-shard"
    hs = dec["heads"]
    heads = MMB1_HEADS if spec.unimodal else MMB2_HEADS

    # 1. norm forward, vjp recorded (layer/batch/none by runtime code)
    x, vjp_norm = jax.vjp(
        lambda lat, npar: apply_norm(lat, npar, hp["norm_code"], row_valid),
        rows, dec["norm"],
    )

    # 2. head pre-activations: one wide GEMM per leaf (padded width)
    z_mu = x @ hs["w_mu"] + hs["b_mu"]
    z_sig = x @ hs["w_log_sigma"] + hs["b_log_sigma"]

    # 3. loss from (rows, z): rows feed ONLY the word likelihood (+ extra
    #    term); pad columns of z are never sliced → their cotangent is 0
    def loss_from(lat, zm, zs, extra):
        word_lp = _word_logprob(spec, lat, vocab_emb, b)
        sigma_all = jnp.exp(zs)
        head_lp = []
        ofs = 0
        for h in heads:
            f = head_width(h, b)
            head_lp.append(_head_log_prob(
                h, zm[:, ofs:ofs + f], sigma_all[:, ofs:ofs + f], b))
            ofs += f
        w = hp["word_loss_weight"]
        other = (1.0 - w) / len(head_lp)
        neg = -(sum(head_lp) * other + w * word_lp)  # losses.py:267-270
        ps = neg if combine is None else combine(extra, neg, lat)
        if row_valid is None:
            return jnp.mean(ps)
        return jnp.sum(ps * row_valid) / jnp.maximum(jnp.sum(row_valid), 1.0)

    loss, vjp_loss = jax.vjp(loss_from, rows, z_mu, z_sig, extra_params)
    g_rows_direct, g_zmu, g_zsig, g_extra = vjp_loss(jnp.float32(1.0))

    # 4. fused weight-grad GEMM + optimizer + latent cotangent (one HBM pass
    #    per leaf); biases stay in XLA (their grad is a (F,) reduction)
    act = jnp.asarray(active)
    flag = jnp.asarray(
        jnp.logical_and(act, jnp.asarray(heads_gate) > 0), jnp.float32)
    count1 = (d_opt.count + 1).astype(jnp.float32)
    if spec.opt_kind == "adam":
        bc1 = 1.0 - jnp.power(_B1, count1)
        bc2 = 1.0 - jnp.power(_B2, count1)
        w_mu2, m_mu2, v_mu2, gx_mu = fused_gemm_adam_update(
            hs["w_mu"], d_opt.m["heads"]["w_mu"], d_opt.v["heads"]["w_mu"],
            x, g_zmu, hp["lr"], bc1, bc2, flag)
        w_sig2, m_sig2, v_sig2, gx_sig = fused_gemm_adam_update(
            hs["w_log_sigma"], d_opt.m["heads"]["w_log_sigma"],
            d_opt.v["heads"]["w_log_sigma"], x, g_zsig,
            hp["lr"], bc1, bc2, flag)
    else:
        w_mu2, gx_mu = fused_gemm_sgd_update(
            hs["w_mu"], x, g_zmu, hp["lr"], flag)
        w_sig2, gx_sig = fused_gemm_sgd_update(
            hs["w_log_sigma"], x, g_zsig, hp["lr"], flag)

    # 5. close the chain rule through the norm
    g_rows_norm, g_norm = vjp_norm(gx_mu + gx_sig)
    g_rows = g_rows_direct + g_rows_norm

    # 6. small leaves (biases + norm affine) via the standard opt_update —
    #    shares the step count with the kernel-updated weights
    small = {"b_mu": hs["b_mu"], "b_log_sigma": hs["b_log_sigma"],
             "norm": dec["norm"]}
    g_small = {"b_mu": jnp.sum(g_zmu, axis=0),
               "b_log_sigma": jnp.sum(g_zsig, axis=0), "norm": g_norm}
    gates = {"b_mu": heads_gate, "b_log_sigma": heads_gate,
             "norm": {k: norm_gate for k in dec["norm"]}}
    small_opt = OptState(
        m=None if d_opt.m is None else {
            "b_mu": d_opt.m["heads"]["b_mu"],
            "b_log_sigma": d_opt.m["heads"]["b_log_sigma"],
            "norm": d_opt.m["norm"]},
        v=None if d_opt.v is None else {
            "b_mu": d_opt.v["heads"]["b_mu"],
            "b_log_sigma": d_opt.v["heads"]["b_log_sigma"],
            "norm": d_opt.v["norm"]},
        count=d_opt.count,
    )
    small2, small_opt2 = opt_update(
        small, g_small, small_opt, hp["lr"], hp["opt_code"], active,
        kind=spec.opt_kind, gates=gates)

    dec2 = {
        "heads": {"w_mu": w_mu2, "b_mu": small2["b_mu"],
                  "w_log_sigma": w_sig2, "b_log_sigma": small2["b_log_sigma"]},
        "norm": small2["norm"],
    }
    if spec.opt_kind == "adam":
        d_opt2 = OptState(
            m={"heads": {"w_mu": m_mu2, "b_mu": small_opt2.m["b_mu"],
                         "w_log_sigma": m_sig2,
                         "b_log_sigma": small_opt2.m["b_log_sigma"]},
               "norm": small_opt2.m["norm"]},
            v={"heads": {"w_mu": v_mu2, "b_mu": small_opt2.v["b_mu"],
                         "w_log_sigma": v_sig2,
                         "b_log_sigma": small_opt2.v["b_log_sigma"]},
               "norm": small_opt2.v["norm"]},
            count=small_opt2.count,
        )
    else:
        d_opt2 = OptState(m=None, v=None, count=small_opt2.count)
    return loss, g_rows, g_extra, dec2, d_opt2
