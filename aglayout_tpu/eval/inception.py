"""InceptionV3 (pool3) in flax for published-comparable FID / IS.

The reference computes FID from a TF1 Inception pool_3 graph
(/root/reference/evaluation/fid.py:282-328) and the Inception Score from
the same graph's logits (evaluation/compute_inception_score.py:111-148).
This environment is zero-egress, so pretrained weights cannot be shipped —
but the NETWORK is fully implemented here: drop a torchvision
`inception_v3_google-*.pth` or pytorch-fid `pt_inception-2015-12-05.pth`
state_dict and `load_torch_weights` maps it 1:1 (module names mirror the
torch keys).

Architecture: torchvision InceptionV3 (the de-facto FID standard via
pytorch-fid). `fid_variant=True` reproduces pytorch-fid's TF-faithful
patches: average pools with count_include_pad=False in InceptionA/C/E_1
and a max pool in the E_2 pool branch.

Input protocol (pytorch-fid): RGB in [0, 255] -> bilinear resize to 299 ->
scale to [-1, 1]. `pool3_features` returns (N, 2048); `logits` the
1000-way classifier output for IS.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool(x, window: int, stride: int, pad: int, count_include_pad: bool):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    if count_include_pad:
        return s / float(window * window)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return s / cnt


def _max_pool(x, window: int, stride: int, pad: int = 0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps 1e-3, frozen stats) + relu."""

    features: int
    kernel: Sequence[int]  # (kh, kw)
    stride: int = 1
    padding: Sequence[int] = (0, 0)  # (ph, pw)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = self.padding
        x = nn.Conv(
            self.features, (kh, kw), strides=self.stride,
            padding=[(ph, ph), (pw, pw)], use_bias=False, name="conv",
        )(x)
        # inference-only BN with loaded statistics
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=not self.fid)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=not self.fid)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_max: bool = False  # FID variant: E_2 (Mixed_7c) uses max pool
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_max and self.fid:
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool(x, 3, 1, 1, count_include_pad=not self.fid)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision-architecture InceptionV3; module names == torch keys."""

    fid_variant: bool = True
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, return_logits: bool = False):
        # x: (N, 299, 299, 3) in [-1, 1]
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, fid=self.fid_variant, name="Mixed_5b")(x)
        x = InceptionA(64, fid=self.fid_variant, name="Mixed_5c")(x)
        x = InceptionA(64, fid=self.fid_variant, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid=self.fid_variant, name="Mixed_6b")(x)
        x = InceptionC(160, fid=self.fid_variant, name="Mixed_6c")(x)
        x = InceptionC(160, fid=self.fid_variant, name="Mixed_6d")(x)
        x = InceptionC(192, fid=self.fid_variant, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(fid=self.fid_variant, name="Mixed_7b")(x)
        x = InceptionE(pool_max=True, fid=self.fid_variant, name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # (N, 2048)
        if not return_logits:
            return pool3
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        return pool3, logits


def preprocess(images_u8: np.ndarray) -> jnp.ndarray:
    """RGB [0, 255] NHWC (any size) -> (N, 299, 299, 3) in [-1, 1]
    (pytorch-fid protocol: bilinear resize, x/255*2-1)."""
    x = jnp.asarray(images_u8, jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    return x * 2.0 - 1.0


def load_torch_weights(path: str, num_classes: int = 1000):
    """torchvision/pytorch-fid `.pth` state_dict -> flax params pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params: dict = {}

    def put(flax_path, array):
        d = params
        for k in flax_path[:-1]:
            d = d.setdefault(k, {})
        d[flax_path[-1]] = jnp.asarray(array)

    consumed = 0
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("AuxLogits",):
            continue
        v = val.numpy()
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(("fc", "kernel"), v.T)
            else:
                put(("fc", "bias"), v)
            consumed += 1
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / ...bn.running_mean
        *mods, leaf_mod, leaf = parts
        flax_mod = tuple(mods)
        if leaf_mod == "conv" and leaf == "weight":
            put(flax_mod + ("conv", "kernel"), v.transpose(2, 3, 1, 0))
        elif leaf_mod == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(leaf)
            if name is None:  # num_batches_tracked
                continue
            put(flax_mod + (name,), v)
        else:
            continue
        consumed += 1
    if consumed < 100:
        raise ValueError(f"unrecognized state_dict format in {path}")
    return {"params": params}


class InceptionExtractor:
    """pool3 feature extractor with the FID-standard protocol."""

    name = "inception-v3 pool3 (pytorch-fid weights)"
    dim = 2048

    def __init__(self, weights: str, fid_variant: bool = True):
        self.model = InceptionV3(fid_variant=fid_variant)
        self.variables = load_torch_weights(weights)
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))
        self._logits_fn = jax.jit(
            lambda v, x: self.model.apply(v, x, return_logits=True)[1]
        )

    def __call__(self, images_u8: np.ndarray, batch_size: int = 64) -> np.ndarray:
        out = np.zeros((len(images_u8), self.dim), np.float32)
        for i in range(0, len(images_u8), batch_size):
            chunk = images_u8[i : i + batch_size]
            out[i : i + len(chunk)] = np.asarray(
                self._fn(self.variables, preprocess(chunk))
            )
        return out

    def logits(self, images_u8: np.ndarray, batch_size: int = 64) -> np.ndarray:
        outs = []
        for i in range(0, len(images_u8), batch_size):
            chunk = images_u8[i : i + batch_size]
            outs.append(np.asarray(self._logits_fn(self.variables, preprocess(chunk))))
        return np.concatenate(outs, 0)
