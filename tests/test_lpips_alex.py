"""LPIPS v0.1 AlexNet path (eval/lpips.py) vs a torch mirror, random weights.

Verifies the flax AlexNet feature stack, the LPIPS scaling layer, the
unit-normalize + linear-head distance, and both .pth loaders — so real
torchvision-alexnet + richzhang-lpips files are a pure drop-in.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from aglayout_tpu.eval.lpips import (  # noqa: E402
    _SCALE,
    _SHIFT,
    load_alexnet_lpips,
    lpips_alex,
)


def _torch_alex_features(x, sd):
    h = x
    feats = []
    keys = ["features.0", "features.3", "features.6", "features.8", "features.10"]
    specs = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]
    for i, (key, (s, p)) in enumerate(zip(keys, specs)):
        h = F.conv2d(h, sd[f"{key}.weight"], sd[f"{key}.bias"], stride=s, padding=p)
        h = F.relu(h)
        feats.append(h)
        if i < 2:
            h = F.max_pool2d(h, 3, 2)
    return feats


def test_lpips_alex_matches_torch(tmp_path):
    torch.manual_seed(0)
    # synthetic torchvision-format alexnet state_dict
    asd = {}
    cins = [3, 64, 192, 384, 256]
    couts = [64, 192, 384, 256, 256]
    ks = [11, 5, 3, 3, 3]
    for key, ci, co, k in zip(
        ["features.0", "features.3", "features.6", "features.8", "features.10"],
        cins, couts, ks,
    ):
        asd[f"{key}.weight"] = torch.randn(co, ci, k, k) * 0.05
        asd[f"{key}.bias"] = torch.randn(co) * 0.1
    # synthetic lpips linear heads (non-negative, as trained LPIPS weights are)
    lsd = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) for i, c in enumerate(couts)}
    apath, lpath = str(tmp_path / "alex.pth"), str(tmp_path / "lpips.pth")
    torch.save(asd, apath)
    torch.save(lsd, lpath)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    convs, lins = load_alexnet_lpips(apath, lpath)
    got = np.asarray(lpips_alex(jnp.asarray(x), jnp.asarray(y), convs, lins))

    # torch reference
    def t(v):
        return torch.from_numpy(v.transpose(0, 3, 1, 2))

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    with torch.no_grad():
        fx = _torch_alex_features((t(x) - shift) / scale, asd)
        fy = _torch_alex_features((t(y) - shift) / scale, asd)
        want = torch.zeros(2)
        for a, b, (i, c) in zip(fx, fy, enumerate(couts)):
            a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
            b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
            w = lsd[f"lin{i}.model.1.weight"].view(1, c, 1, 1)
            want = want + ((a - b) ** 2 * w).sum(dim=1).mean(dim=(1, 2))

    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)
