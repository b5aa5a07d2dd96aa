"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np

import jax
import jax.numpy as jnp

from mmtpu.kernels.angular import angular_partition_pallas
from mmtpu.ops.wordprob import angular_partition, word_logprob_angular


class TestAngularKernel:
    def test_forward_matches_xla(self, rng):
        lat = jnp.asarray(rng.standard_normal((16, 36)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((100, 36)).astype(np.float32))
        got = angular_partition_pallas(lat, vocab, 32)
        want = angular_partition(lat, vocab)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    def test_backward_matches_xla(self, rng):
        lat = jnp.asarray(rng.standard_normal((8, 20)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((50, 20)).astype(np.float32))
        gk = jax.grad(lambda l: angular_partition_pallas(l, vocab, 16).sum())(lat)
        gx = jax.grad(lambda l: angular_partition(l, vocab).sum())(lat)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-5)

    def test_nonuniform_cotangent(self, rng):
        lat = jnp.asarray(rng.standard_normal((6, 12)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((40, 12)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((6, 1)).astype(np.float32))
        gk = jax.grad(lambda l: (angular_partition_pallas(l, vocab, 16) * w).sum())(lat)
        gx = jax.grad(lambda l: (angular_partition(l, vocab) * w).sum())(lat)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-5)

    def test_vmap(self, rng):
        lat = jnp.asarray(rng.standard_normal((3, 8, 12)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((40, 12)).astype(np.float32))
        got = jax.vmap(lambda l: angular_partition_pallas(l, vocab, 16))(lat)
        want = jax.vmap(lambda l: angular_partition(l, vocab))(lat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    def test_as_partition_hook(self, rng):
        """Plumbs through word_logprob_angular's partition_fn hook."""
        lat = jnp.asarray(rng.standard_normal((5, 12)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((30, 12)).astype(np.float32))
        ids = rng.integers(0, 30, size=(5, 7))
        ww = jnp.asarray(rng.random((5, 7)).astype(np.float32))
        se = vocab[jnp.asarray(ids)]
        mask = jnp.ones((5, 7))
        got = word_logprob_angular(
            lat, vocab, ww, se, mask,
            partition_fn=lambda l, v: angular_partition_pallas(l, v, 16),
        )
        want = word_logprob_angular(lat, vocab, ww, se, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)

    def test_vmap_grad(self, rng):
        """vmap(grad(...)) — the sweep's actual pattern — must match XLA;
        under a shared vocab the batched kernel flattens to one call."""
        lat = jnp.asarray(rng.standard_normal((3, 8, 12)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((40, 12)).astype(np.float32))
        gk = jax.vmap(jax.grad(
            lambda l: angular_partition_pallas(l, vocab, 16).sum()))(lat)
        gx = jax.vmap(jax.grad(
            lambda l: angular_partition(l, vocab).sum()))(lat)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-5)

    def test_vmap_over_vocab(self, rng):
        """Batched vocab (no shared table) stays correct under vmap."""
        lat = jnp.asarray(rng.standard_normal((3, 6, 12)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((3, 40, 12)).astype(np.float32))
        got = jax.vmap(lambda l, v: angular_partition_pallas(l, v, 16))(lat, vocab)
        want = jax.vmap(angular_partition)(lat, vocab)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    def test_multi_row_tile(self, rng):
        """Row counts beyond one row tile (the flattened-sweep shape) split
        across the 2-D grid and match XLA, padding sliced off."""
        import mmtpu.kernels.angular as ka
        lat = jnp.asarray(rng.standard_normal((37, 12)).astype(np.float32))
        vocab = jnp.asarray(rng.standard_normal((40, 12)).astype(np.float32))
        orig = ka._ROW_TILE
        try:
            ka._ROW_TILE = 16  # force 3 row tiles (37 -> pad 48)
            got = angular_partition_pallas(lat, vocab, 16)
            gk = jax.grad(
                lambda l: angular_partition_pallas(l, vocab, 16).sum())(lat)
        finally:
            ka._ROW_TILE = orig
        want = angular_partition(lat, vocab)
        gx = jax.grad(lambda l: angular_partition(l, vocab).sum())(lat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-5)


def test_default_partition_fn_threshold(monkeypatch):
    """Shape-aware default: kernel only when effective rows amortize it."""
    import mmtpu.kernels.angular as ang

    monkeypatch.setattr(ang, "pallas_available", lambda: True)
    assert ang.default_partition_fn(64) is None
    assert ang.default_partition_fn(ang.MIN_PALLAS_ROWS) is ang.angular_partition_pallas
    assert ang.default_partition_fn(2048) is ang.angular_partition_pallas
    monkeypatch.setattr(ang, "pallas_available", lambda: False)
    assert ang.default_partition_fn(4096) is None
