"""Import reference PyTorch ``iter-N_{appendix}.pkl`` state_dicts.

The reference checkpoints four nets per iteration (train64.py:404-414):
netG, netD_image, netD_object, netD_attribute — plain ``state_dict``
pickles. This module maps them onto our flax param/batch_stats trees for
the per-sample parity validation demanded by BASELINE.md.

Weight-layout conversions (SURVEY.md §7 hard part #4):
  * Conv2d  (O, I, kh, kw)        -> HWIO  transpose(2, 3, 1, 0)
  * ConvT2d (I, O, kh, kw)        -> spatial flip + transpose(2, 3, 0, 1)
    (our ConvTranspose2d stores the equivalent forward-conv kernel)
  * Linear  (out, in)             -> (in, out) transpose
  * Embedding                     -> as-is
  * BatchNorm weight/bias         -> scale/bias; running_mean/var -> mean/var
  * spectral_norm weight_orig     -> kernel (same conv/linear conversion);
    weight_u/weight_v             -> batch_stats .../sn/{u,v}
"""

from __future__ import annotations

import numpy as np


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convt_w(w):
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _linear_w(w):
    return np.ascontiguousarray(w.T)


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


class _TreeBuilder:
    def __init__(self, sd: dict, prefix: str = ""):
        self.sd = sd
        self.params: dict = {}
        self.stats: dict = {}
        self.prefix = prefix
        self.used: set = set()

    def _get(self, key):
        key = key.lstrip(".")  # tolerate empty tkey roots in sub-module tests
        self.used.add(self.prefix + key)
        return self.sd[self.prefix + key]

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def conv(self, tkey, mpath, bias=True):
        self._set(self.params, mpath + ("kernel",), _conv_w(self._get(tkey + ".weight")))
        if bias:
            self._set(self.params, mpath + ("bias",), self._get(tkey + ".bias"))

    def convt(self, tkey, mpath, bias=False):
        self._set(self.params, mpath + ("kernel",), _convt_w(self._get(tkey + ".weight")))
        if bias:
            self._set(self.params, mpath + ("bias",), self._get(tkey + ".bias"))

    def linear(self, tkey, mpath, bias=True):
        self._set(self.params, mpath + ("kernel",), _linear_w(self._get(tkey + ".weight")))
        if bias:
            self._set(self.params, mpath + ("bias",), self._get(tkey + ".bias"))

    def embed(self, tkey, mpath):
        self._set(self.params, mpath + ("embedding",), self._get(tkey + ".weight"))

    def bn(self, tkey, mpath, affine=True):
        if affine:
            self._set(self.params, mpath + ("scale",), self._get(tkey + ".weight"))
            self._set(self.params, mpath + ("bias",), self._get(tkey + ".bias"))
        self._set(self.stats, mpath + ("mean",), self._get(tkey + ".running_mean"))
        self._set(self.stats, mpath + ("var",), self._get(tkey + ".running_var"))

    def cbn(self, tkey, mpath):
        """ConditionalBatchNorm: affine-free BN + class embedding."""
        self.bn(tkey + ".bn", mpath + ("bn",), affine=False)
        self.embed(tkey + ".embed", mpath + ("embed",))

    def spade(self, tkey, mpath):
        self.bn(tkey + ".param_free_norm", mpath + ("param_free_norm",), affine=False)
        self.conv(tkey + ".mlp_shared.0", mpath + ("mlp_shared",))
        self.conv(tkey + ".mlp_gamma", mpath + ("mlp_gamma",))
        self.conv(tkey + ".mlp_beta", mpath + ("mlp_beta",))

    def sn_conv(self, tkey, mpath, bias=True):
        self._set(self.params, mpath + ("kernel",), _conv_w(self._get(tkey + ".weight_orig")))
        self._set(self.stats, mpath + ("sn", "u"), self._get(tkey + ".weight_u"))
        self._set(self.stats, mpath + ("sn", "v"), self._get(tkey + ".weight_v"))
        if bias:
            self._set(self.params, mpath + ("bias",), self._get(tkey + ".bias"))

    def sn_linear(self, tkey, mpath, bias=True):
        self._set(self.params, mpath + ("kernel",), _linear_w(self._get(tkey + ".weight_orig")))
        self._set(self.stats, mpath + ("sn", "u"), self._get(tkey + ".weight_u"))
        self._set(self.stats, mpath + ("sn", "v"), self._get(tkey + ".weight_v"))
        if bias:
            self._set(self.params, mpath + ("bias",), self._get(tkey + ".bias"))


def import_generator(sd: dict, image_size: int = 64, clstm_layers: int = 3, resi_num: int = 6):
    """netG state_dict -> (params, batch_stats) for models.Generator."""
    t = _TreeBuilder(sd)

    # CropEncoder (generator_obj_att.py:367-422); torch names c1..c4, conv5
    ce = ("crop_encoder",)
    for i, tname in enumerate(["c1", "c2", "c3", "c4", "conv5"]):
        t.conv(f"crop_encoder.{tname}", ce + (f"c{i+1}",), bias=False)
        t.cbn(f"crop_encoder.bn{i+1}", ce + (f"bn{i+1}",))
    t.linear("crop_encoder.fc_mu", ce + ("fc_mu",))
    t.linear("crop_encoder.fc_logvar", ce + ("fc_logvar",))

    # LayoutEncoder (:449-513)
    le = ("layout_encoder",)
    for tname, mname, bn in [
        ("c0", "c0", "bn1"),
        ("c2", "c2", "bn2"),
        ("c3", "c3", "bn3"),
        ("c4", "c4", "bn4"),
    ]:
        t.conv(f"layout_encoder.{tname}", le + (mname,), bias=False)
        t.cbn(f"layout_encoder.{bn}", le + (bn,))
    for i in range(clstm_layers):
        t.conv(f"layout_encoder.clstm.cell_list.{i}.conv", le + ("clstm", "step", f"cell_{i}", "conv"))
    for i in range(resi_num):
        base = f"layout_encoder.residual.{i}.main"
        t.conv(f"{base}.0", le + (f"residual_{i}", "c1"), bias=False)
        t.bn(f"{base}.1", le + (f"residual_{i}", "bn1"))
        t.conv(f"{base}.3", le + (f"residual_{i}", "c2"), bias=False)
        t.bn(f"{base}.4", le + (f"residual_{i}", "bn2"))

    # GlobalEncoder (:425-446)
    t.conv("global_encoder.c1", ("global_encoder", "c1"), bias=False)
    t.bn("global_encoder.bn1", ("global_encoder", "bn1"))
    t.conv("global_encoder.c2", ("global_encoder", "c2"), bias=False)

    # Decoder (:516-572 / 128 tail generator_obj_att128.py:542-604)
    de = ("decoder",)
    t.conv("decoder.c0_new", de + ("c0_new",), bias=False)
    for i in range(4):
        t.spade(f"decoder.spade_{i}", de + (f"spade_{i}",))
    for i in range(1, 4):
        t.convt(f"decoder.dc{i}", de + (f"dc{i}",))
    t.conv("decoder.c4", de + ("c4",), bias=True)
    if image_size == 128:
        t.conv("decoder.c5", de + ("c5",), bias=False)
        t.spade("decoder.spade_4", de + ("spade_4",))
        t.conv("decoder.c6", de + ("c6",), bias=False)
        t.spade("decoder.spade_5", de + ("spade_5",))
        t.conv("decoder.c7", de + ("c7",), bias=True)

    # AttributeEncoder (:575-600)
    ae = ("attribute_encoder",)
    t.embed("attribute_encoder.embedding", ae + ("embedding",))
    t.linear("attribute_encoder.c0", ae + ("c0",))
    t.bn("attribute_encoder.bn0", ae + ("bn0",))
    t.linear("attribute_encoder.c1", ae + ("c1",))
    t.bn("attribute_encoder.bn1", ae + ("bn1",))
    t.linear("attribute_encoder.c2", ae + ("c2",))

    return t.params, t.stats


def _import_d_trunk(t: _TreeBuilder, num_blocks: int):
    """main.0 OptimizedBlock + main.1.. DResidualBlocks (discriminator.py)."""
    t.sn_conv("main.0.resi.0", ("block0", "conv1"))
    t.sn_conv("main.0.resi.2", ("block0", "conv2"))
    if "main.0.sc.weight_orig" in t.sd:
        t.sn_conv("main.0.sc", ("block0", "sc"))
    for i in range(1, num_blocks):
        t.sn_conv(f"main.{i}.resi.1", (f"block{i}", "conv1"))
        t.sn_conv(f"main.{i}.resi.3", (f"block{i}", "conv2"))
        if f"main.{i}.sc.weight_orig" in t.sd:
            t.sn_conv(f"main.{i}.sc", (f"block{i}", "sc"))


def import_image_discriminator(sd: dict):
    t = _TreeBuilder(sd)
    _import_d_trunk(t, 5)
    t.sn_linear("classifier", ("classifier",), bias=False)
    return t.params, t.stats


def import_object_discriminator(sd: dict):
    t = _TreeBuilder(sd)
    _import_d_trunk(t, 5)
    t.sn_linear("classifier_src", ("classifier_src",))
    t.sn_linear("classifier_cls", ("classifier_cls",))
    return t.params, t.stats


def import_attribute_discriminator(sd: dict, extra_block: bool = False):
    t = _TreeBuilder(sd)
    _import_d_trunk(t, 6 if extra_block else 5)
    t.sn_linear("classifier_att", ("classifier_att",))
    return t.params, t.stats
