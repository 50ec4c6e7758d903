"""Importer round-trip tests using small torch modules built from public APIs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from aglayout_tpu.models.layers import ConvTranspose2d
from aglayout_tpu.models.norms import ConditionalBatchNorm
from aglayout_tpu.models.sn import SNConv2d, SNDense
from aglayout_tpu.utils.torch_import import _TreeBuilder, _convt_w


def sd_numpy(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_sn_conv_import_matches_torch_eval():
    torch.manual_seed(0)
    conv = nn.utils.spectral_norm(nn.Conv2d(3, 8, 3, padding=1))
    x = torch.randn(2, 3, 8, 8)
    conv.train()
    for _ in range(5):  # advance power iteration
        conv(x)
    conv.eval()
    ref = conv(x).detach().numpy()

    t = _TreeBuilder(sd_numpy(conv))
    t.sn_conv("", ())
    # strip the leading '.' quirk: _get used keys like '.weight_orig'
    mod = SNConv2d(8, 3, padding=1)
    variables = {"params": t.params, "batch_stats": t.stats}
    ours = mod.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=2e-4)


def test_sn_linear_import_matches_torch_eval():
    torch.manual_seed(1)
    lin = nn.utils.spectral_norm(nn.Linear(6, 4))
    x = torch.randn(5, 6)
    lin.train()
    for _ in range(5):
        lin(x)
    lin.eval()
    ref = lin(x).detach().numpy()

    t = _TreeBuilder(sd_numpy(lin))
    t.sn_linear("", ())
    mod = SNDense(4)
    ours = mod.apply({"params": t.params, "batch_stats": t.stats}, jnp.asarray(x.numpy()), False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_convt_import_matches_torch():
    torch.manual_seed(2)
    dc = nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=False)
    x = torch.randn(2, 6, 8, 8)
    ref = dc(x).detach().numpy()
    kernel = _convt_w(dc.weight.detach().numpy())
    mod = ConvTranspose2d(4, 4, 2, 1, use_bias=False)
    ours = mod.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_cbn_import_matches_torch_eval():
    """ConditionalBatchNorm import: BN running stats + embedding halves."""

    class TorchCBN(nn.Module):  # same algebra as reference CBN via public APIs
        def __init__(self, c, n):
            super().__init__()
            self.bn = nn.BatchNorm2d(c, affine=False)
            self.embed = nn.Embedding(n, 2 * c)

        def forward(self, x, y):
            out = self.bn(x)
            gamma, beta = self.embed(y).chunk(2, 1)
            return gamma.view(-1, 8, 1, 1) * out + beta.view(-1, 8, 1, 1)

    torch.manual_seed(3)
    tm = TorchCBN(8, 5)
    x = torch.randn(4, 8, 6, 6)
    y = torch.randint(0, 5, (4,))
    tm.train()
    tm(x, y)  # populate running stats
    tm.eval()
    ref = tm(x, y).detach().numpy()

    t = _TreeBuilder(sd_numpy(tm))
    t.cbn("", ())
    mod = ConditionalBatchNorm(8, 5)
    ours = mod.apply(
        {"params": t.params, "batch_stats": t.stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(y.numpy()),
        None,
        True,
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4)
