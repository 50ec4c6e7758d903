"""Parity tests for layer primitives vs the public torch APIs.

These pin the exact numerical semantics needed for importing reference
PyTorch checkpoints: conv/conv-transpose geometry + kernel layout, BatchNorm
train/eval statistics, and the ConvLSTM cell algebra.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aglayout_tpu.models.layers import Conv2d, ConvTranspose2d, adaptive_avg_pool, avg_pool2
from aglayout_tpu.models.norms import ConditionalBatchNorm, MaskedBatchNorm, SPADE

pytestmark = pytest.mark.quick


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 9, 5).astype(np.float32)
    w = rng.randn(4, 5, 3, 3).astype(np.float32)  # torch OIHW
    b = rng.randn(4).astype(np.float32)
    mod = Conv2d(4, 3, stride=2, padding=1)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    ours = mod.apply(params, jnp.asarray(x))
    ref = F.conv2d(torch.as_tensor(x.transpose(0, 3, 1, 2)), torch.as_tensor(w), torch.as_tensor(b), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


def test_conv_transpose2d_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(6, 4, 4, 4).astype(np.float32)  # torch (in, out, kh, kw)
    mod = ConvTranspose2d(4, 4, 2, 1, use_bias=False)
    # torch -> forward-conv HWIO: flip spatial, put (in->I? no: I=x channels)
    kernel = jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())  # (kh,kw,in,out)
    ours = mod.apply({"params": {"kernel": kernel}}, jnp.asarray(x))
    ref = F.conv_transpose2d(torch.as_tensor(x.transpose(0, 3, 1, 2)), torch.as_tensor(w), stride=2, padding=1)
    assert ours.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


def test_batchnorm_train_eval_matches_torch():
    rng = np.random.RandomState(2)
    x1 = rng.randn(4, 6, 6, 3).astype(np.float32)
    x2 = rng.randn(4, 6, 6, 3).astype(np.float32)
    mod = MaskedBatchNorm(3)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    tbn = torch.nn.BatchNorm2d(3)

    state = variables
    for x in (x1, x2):
        ours, mut = mod.apply(state, jnp.asarray(x), mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": mut["batch_stats"]}
        ref = tbn(torch.as_tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref.detach().numpy(), atol=1e-4
        )
    # running stats after two steps
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-5
    )
    # eval mode
    tbn.eval()
    ours_eval = mod.apply(state, jnp.asarray(x1), None, True)
    ref_eval = tbn(torch.as_tensor(x1.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours_eval).transpose(0, 3, 1, 2), ref_eval.detach().numpy(), atol=1e-4
    )


def test_masked_batchnorm_equals_bn_on_valid_rows():
    """Masked BN over padded rows == torch BN over only the real rows."""
    rng = np.random.RandomState(3)
    n_valid = 5
    x = rng.randn(8, 4, 4, 3).astype(np.float32)
    mask = np.zeros(8, np.float32)
    mask[:n_valid] = 1
    mod = MaskedBatchNorm(3)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    ours, mut = mod.apply(variables, jnp.asarray(x), jnp.asarray(mask), mutable=["batch_stats"])
    tbn = torch.nn.BatchNorm2d(3)
    ref = tbn(torch.as_tensor(x[:n_valid].transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours)[:n_valid].transpose(0, 3, 1, 2), ref.detach().numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-5
    )


def test_masked_batchnorm_1d():
    rng = np.random.RandomState(4)
    x = rng.randn(10, 7).astype(np.float32)
    mask = (rng.rand(10) > 0.3).astype(np.float32)
    mod = MaskedBatchNorm(7)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    ours = mod.apply(variables, jnp.asarray(x), jnp.asarray(mask), mutable=["batch_stats"])[0]
    valid = mask.astype(bool)
    tbn = torch.nn.BatchNorm1d(7)
    ref = tbn(torch.as_tensor(x[valid]))
    np.testing.assert_allclose(np.asarray(ours)[valid], ref.detach().numpy(), atol=1e-4)


def test_conditional_batchnorm_matches_reference_algebra():
    """CBN == affine-free BN scaled/shifted by per-class embedding halves."""
    rng = np.random.RandomState(5)
    x = rng.randn(6, 4, 4, 8).astype(np.float32)
    y = rng.randint(0, 10, 6)
    mod = ConditionalBatchNorm(8, 10)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    emb = np.asarray(variables["params"]["embed"]["embedding"])
    # scale half ~ N(1, 0.02), bias half zero
    assert abs(emb[:, :8].mean() - 1.0) < 0.02
    assert np.all(emb[:, 8:] == 0)
    out = mod.apply(variables, jnp.asarray(x), jnp.asarray(y), mutable=["batch_stats"])[0]
    bn = torch.nn.BatchNorm2d(8, affine=False)
    normalized = bn(torch.as_tensor(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    expected = normalized * emb[y, :8][:, None, None, :] + emb[y, 8:][:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_spade_shapes_and_upsample():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 16, 16, 12).astype(np.float32)
    seg = rng.randn(2, 8, 8, 64).astype(np.float32)
    mod = SPADE(12)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(seg))
    out = mod.apply(variables, jnp.asarray(x), jnp.asarray(seg), mutable=["batch_stats"])[0]
    assert out.shape == x.shape
    # nearest upsample must equal torch F.interpolate(mode='nearest')
    up = np.repeat(np.repeat(seg, 2, axis=1), 2, axis=2)
    ref = F.interpolate(torch.as_tensor(seg.transpose(0, 3, 1, 2)), size=(16, 16), mode="nearest")
    np.testing.assert_array_equal(up.transpose(0, 3, 1, 2), ref.numpy())


def test_avg_pools():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ref = F.avg_pool2d(torch.as_tensor(x.transpose(0, 3, 1, 2)), 2).numpy()
    np.testing.assert_allclose(np.asarray(avg_pool2(jnp.asarray(x))).transpose(0, 3, 1, 2), ref, atol=1e-6)
    x16 = rng.randn(2, 16, 16, 3).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.as_tensor(x16.transpose(0, 3, 1, 2)), 8).numpy()
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool(jnp.asarray(x16), 8)).transpose(0, 3, 1, 2), ref, atol=1e-6
    )
