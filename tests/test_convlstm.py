"""ConvLSTM cell parity vs torch algebra + masked-scan fusion semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from aglayout_tpu.models.convlstm import ConvLSTMCell, LayoutFuser


def torch_cell(x_nchw, h, c, w, b, hidden):
    """Reference cell algebra via public torch ops
    (conv(cat(x,h)) -> split i,f,o,g; generator_obj_att.py:99-114)."""
    combined = torch.cat([x_nchw, h], dim=1)
    z = F.conv2d(combined, w, b, padding=2)
    i, f, o, g = torch.split(z, hidden, dim=1)
    c2 = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
    h2 = torch.sigmoid(o) * torch.tanh(c2)
    return h2, c2


def test_cell_matches_torch():
    rng = np.random.RandomState(0)
    B, H, W, Cin, Ch = 2, 8, 8, 6, 4
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    h0 = rng.randn(B, H, W, Ch).astype(np.float32)
    c0 = rng.randn(B, H, W, Ch).astype(np.float32)
    w = rng.randn(4 * Ch, Cin + Ch, 5, 5).astype(np.float32)
    b = rng.randn(4 * Ch).astype(np.float32)

    cell = ConvLSTMCell(Ch, 5)
    params = {
        "params": {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    }
    (h2, c2), _ = cell.apply(params, (jnp.asarray(h0), jnp.asarray(c0)), jnp.asarray(x))
    rh, rc = torch_cell(
        torch.as_tensor(x.transpose(0, 3, 1, 2)),
        torch.as_tensor(h0.transpose(0, 3, 1, 2)),
        torch.as_tensor(c0.transpose(0, 3, 1, 2)),
        torch.as_tensor(w),
        torch.as_tensor(b),
        Ch,
    )
    np.testing.assert_allclose(np.asarray(h2).transpose(0, 3, 1, 2), rh.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c2).transpose(0, 3, 1, 2), rc.numpy(), atol=1e-4)


def test_fuser_masked_scan_equals_per_image_loop():
    """Masked scan over padded slots == running only the valid prefix.

    This is the hard part #1 of SURVEY.md §7: the reference fuses only real
    objects per image in dataset order; padded slots must carry state
    through so the final hidden state is identical.
    """
    rng = np.random.RandomState(1)
    B, O, H, W, Cin = 3, 6, 4, 4, 8
    dims = (5, 4)
    x = rng.randn(B, O, H, W, Cin).astype(np.float32)
    n_valid = np.array([6, 3, 1])
    valid = (np.arange(O)[None, :] < n_valid[:, None]).astype(np.float32)

    fuser = LayoutFuser(dims, 3)
    variables = fuser.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid))
    out = fuser.apply(variables, jnp.asarray(x), jnp.asarray(valid))
    assert out.shape == (B, H, W, dims[-1])

    # per-image reference: run each image's valid prefix alone (mask all-ones)
    for bi in range(B):
        nv = n_valid[bi]
        xi = x[bi : bi + 1, :nv]
        vi = np.ones((1, nv), np.float32)
        ref = fuser.apply(variables, jnp.asarray(xi), jnp.asarray(vi))
        np.testing.assert_allclose(np.asarray(out[bi]), np.asarray(ref[0]), atol=1e-5)


def test_fuser_layer_interleaving_equals_layerwise():
    """All-layers-per-timestep == layer-by-layer over the full sequence."""
    rng = np.random.RandomState(2)
    B, O, H, W, Cin = 2, 4, 4, 4, 6
    dims = (5, 4)
    x = rng.randn(B, O, H, W, Cin).astype(np.float32)
    valid = np.ones((B, O), np.float32)
    fuser = LayoutFuser(dims, 3)
    variables = fuser.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid))
    out = fuser.apply(variables, jnp.asarray(x), jnp.asarray(valid))

    # layerwise manual: layer 0 over all t, then layer 1 over its outputs
    p = variables["params"]["step"]
    cell0 = ConvLSTMCell(dims[0], 3)
    cell1 = ConvLSTMCell(dims[1], 3)
    h = np.zeros((B, H, W, dims[0]), np.float32)
    c = np.zeros_like(h)
    outs0 = []
    for t in range(O):
        (h, c), _ = cell0.apply({"params": p["cell_0"]}, (jnp.asarray(h), jnp.asarray(c)), jnp.asarray(x[:, t]))
        h, c = np.asarray(h), np.asarray(c)
        outs0.append(h)
    h1 = np.zeros((B, H, W, dims[1]), np.float32)
    c1 = np.zeros_like(h1)
    for t in range(O):
        (h1, c1), _ = cell1.apply({"params": p["cell_1"]}, (jnp.asarray(h1), jnp.asarray(c1)), jnp.asarray(outs0[t]))
        h1, c1 = np.asarray(h1), np.asarray(c1)
    np.testing.assert_allclose(np.asarray(out), h1, atol=1e-5)
