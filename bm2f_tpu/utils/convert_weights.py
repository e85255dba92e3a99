"""Convert detectron2 Mask2Former checkpoints (.pkl / .pth state dicts) to
bm2f_tpu Flax variables — the bridge for AP-parity evaluation against the
reference MODEL_ZOO (reference checkpoint naming observed from
mask2former/modeling/* module definitions; converters in reference tools/
write the matching d2 names).

Layout conversions:
- conv weight OIHW -> HWIO;
- linear weight (out, in) -> (in, out);
- torch MultiheadAttention in_proj_weight (3C, C) -> (C, 3C);
- FrozenBN {weight, bias, running_mean, running_var} folded to the
  affine scale/bias of our 'frozen' collection.
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-5


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        sd = data.get("model", data.get("state_dict", data))
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return {k: np.asarray(v) for k, v in sd.items()}


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # (out, in) -> (in, out)
    return np.transpose(w)


def _set(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    d = tree
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def _fold_bn(sd: Dict, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    w = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    mean = sd.get(f"{prefix}.running_mean")
    var = sd.get(f"{prefix}.running_var")
    if mean is None:  # already-folded caffe weights
        return w, b
    scale = w / np.sqrt(var + BN_EPS)
    return scale, b - mean * scale


def convert_resnet(sd: Dict, params: Dict, frozen: Dict, depth: int = 50):
    from bm2f_tpu.models.resnet import RESNET_STAGES

    def conv_bn(src: str, dst: str):
        _set(params, f"{dst}/conv/kernel", _conv(sd[f"{src}.weight"]))
        s, b = _fold_bn(sd, f"{src}.norm")
        _set(frozen, f"{dst}/norm/scale", s)
        _set(frozen, f"{dst}/norm/bias", b)

    conv_bn("backbone.stem.conv1", "backbone/stem_conv1")
    for si, n in enumerate(RESNET_STAGES[depth]):
        stage = f"res{si + 2}"
        for b in range(n):
            src = f"backbone.{stage}.{b}"
            dst = f"backbone/{stage}_block{b}"
            for c in ("conv1", "conv2", "conv3"):
                conv_bn(f"{src}.{c}", f"{dst}/{c}")
            if f"{src}.shortcut.weight" in sd:
                conv_bn(f"{src}.shortcut", f"{dst}/shortcut")


def convert_swin(sd: Dict, params: Dict, depths: Tuple[int, ...]):
    pre = "backbone"

    def lin(src, dst, bias=True):
        _set(params, f"{dst}/kernel", _lin(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    def ln(src, dst):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    _set(params, "backbone/patch_embed_proj/kernel", _conv(sd[f"{pre}.patch_embed.proj.weight"]))
    _set(params, "backbone/patch_embed_proj/bias", sd[f"{pre}.patch_embed.proj.bias"])
    if f"{pre}.patch_embed.norm.weight" in sd:
        ln(f"{pre}.patch_embed.norm", "backbone/patch_embed_norm")
    def _block_tree(src):
        """One reference block -> our SwinBlock param dict (flat paths)."""
        out = {}
        out["norm1/scale"] = sd[f"{src}.norm1.weight"]
        out["norm1/bias"] = sd[f"{src}.norm1.bias"]
        out["norm2/scale"] = sd[f"{src}.norm2.weight"]
        out["norm2/bias"] = sd[f"{src}.norm2.bias"]
        out["attn/qkv/kernel"] = _lin(sd[f"{src}.attn.qkv.weight"])
        if f"{src}.attn.qkv.bias" in sd:
            out["attn/qkv/bias"] = sd[f"{src}.attn.qkv.bias"]
        out["attn/proj/kernel"] = _lin(sd[f"{src}.attn.proj.weight"])
        out["attn/proj/bias"] = sd[f"{src}.attn.proj.bias"]
        out["attn/relative_position_bias_table"] = sd[
            f"{src}.attn.relative_position_bias_table"
        ]
        out["mlp_fc1/kernel"] = _lin(sd[f"{src}.mlp.fc1.weight"])
        out["mlp_fc1/bias"] = sd[f"{src}.mlp.fc1.bias"]
        out["mlp_fc2/kernel"] = _lin(sd[f"{src}.mlp.fc2.weight"])
        out["mlp_fc2/bias"] = sd[f"{src}.mlp.fc2.bias"]
        return out

    for s, depth in enumerate(depths):
        if depth % 2 == 0:
            # stage scan: stacked (depth/2, ...) params under
            # stage{s}_pairs/block{0,1} (block0 <- even blocks, block1 <- odd)
            for pos in (0, 1):
                trees = [
                    _block_tree(f"{pre}.layers.{s}.blocks.{2 * p + pos}")
                    for p in range(depth // 2)
                ]
                for key in trees[0]:
                    _set(
                        params,
                        f"backbone/stage{s}_pairs/block{pos}/{key}",
                        np.stack([t[key] for t in trees]),
                    )
        else:
            for b in range(depth):
                src = f"{pre}.layers.{s}.blocks.{b}"
                dst = f"backbone/stage{s}_block{b}"
                for key, val in _block_tree(src).items():
                    _set(params, f"{dst}/{key}", val)
        if f"{pre}.layers.{s}.downsample.reduction.weight" in sd:
            lin(f"{pre}.layers.{s}.downsample.reduction",
                f"backbone/downsample{s}/reduction", bias=False)
            ln(f"{pre}.layers.{s}.downsample.norm", f"backbone/downsample{s}/norm")
        if f"{pre}.norm{s}.weight" in sd:
            ln(f"{pre}.norm{s}", f"backbone/out_norm{s}")


def convert_pixel_decoder(sd: Dict, params: Dict, enc_layers: int = 6,
                          num_fpn: int = 1):
    pre = "sem_seg_head.pixel_decoder"
    p = "sem_seg_head/pixel_decoder"

    for i in range(3):
        _set(params, f"{p}/input_proj_{i}_conv/kernel",
             _conv(sd[f"{pre}.input_proj.{i}.0.weight"]))
        _set(params, f"{p}/input_proj_{i}_conv/bias", sd[f"{pre}.input_proj.{i}.0.bias"])
        _set(params, f"{p}/input_proj_{i}_norm/scale", sd[f"{pre}.input_proj.{i}.1.weight"])
        _set(params, f"{p}/input_proj_{i}_norm/bias", sd[f"{pre}.input_proj.{i}.1.bias"])

    _set(params, f"{p}/level_embed", sd[f"{pre}.transformer.level_embed"])

    # encoder layers are a single nn.scan module with STACKED params
    # (leading axis = layer) — stack the reference's per-layer tensors.
    # Zero layers means the model creates NO encoder params (the scan is
    # skipped entirely, models/pixel_decoder.py) — emit none here either.
    def stack_enc(fn):
        return np.stack([fn(f"{pre}.transformer.encoder.layers.{i}")
                         for i in range(enc_layers)])

    if enc_layers > 0:
        dst = f"{p}/encoder_layers"
        for m in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            _set(params, f"{dst}/self_attn/{m}/kernel",
                 stack_enc(lambda s, m=m: _lin(sd[f"{s}.self_attn.{m}.weight"])))
            _set(params, f"{dst}/self_attn/{m}/bias",
                 stack_enc(lambda s, m=m: sd[f"{s}.self_attn.{m}.bias"]))
        for m in ("linear1", "linear2"):
            _set(params, f"{dst}/{m}/kernel",
                 stack_enc(lambda s, m=m: _lin(sd[f"{s}.{m}.weight"])))
            _set(params, f"{dst}/{m}/bias",
                 stack_enc(lambda s, m=m: sd[f"{s}.{m}.bias"]))
        for m in ("norm1", "norm2"):
            _set(params, f"{dst}/{m}/scale",
                 stack_enc(lambda s, m=m: sd[f"{s}.{m}.weight"]))
            _set(params, f"{dst}/{m}/bias",
                 stack_enc(lambda s, m=m: sd[f"{s}.{m}.bias"]))

    _set(params, f"{p}/mask_features/kernel", _conv(sd[f"{pre}.mask_features.weight"]))
    _set(params, f"{p}/mask_features/bias", sd[f"{pre}.mask_features.bias"])

    # extra FPN levels: reference names adapter_1/layer_1 upward; ours are
    # 0-indexed in top-down application order (adapter_0 == d2 adapter_1,
    # the highest-resolution lateral)
    for i in range(num_fpn):
        _set(params, f"{p}/adapter_{i}_conv/kernel",
             _conv(sd[f"{pre}.adapter_{i + 1}.weight"]))
        _set(params, f"{p}/adapter_{i}_norm/scale", sd[f"{pre}.adapter_{i + 1}.norm.weight"])
        _set(params, f"{p}/adapter_{i}_norm/bias", sd[f"{pre}.adapter_{i + 1}.norm.bias"])
        _set(params, f"{p}/layer_{i}_conv/kernel",
             _conv(sd[f"{pre}.layer_{i + 1}.weight"]))
        _set(params, f"{p}/layer_{i}_norm/scale", sd[f"{pre}.layer_{i + 1}.norm.weight"])
        _set(params, f"{p}/layer_{i}_norm/bias", sd[f"{pre}.layer_{i + 1}.norm.bias"])


def convert_predictor(sd: Dict, params: Dict, dec_layers: int = 9):
    pre = "sem_seg_head.predictor"
    p = "sem_seg_head/predictor"

    _set(params, f"{p}/query_feat", sd[f"{pre}.query_feat.weight"])
    _set(params, f"{p}/query_embed", sd[f"{pre}.query_embed.weight"])
    _set(params, f"{p}/level_embed", sd[f"{pre}.level_embed.weight"])
    _set(params, f"{p}/decoder_norm/scale", sd[f"{pre}.decoder_norm.weight"])
    _set(params, f"{p}/decoder_norm/bias", sd[f"{pre}.decoder_norm.bias"])
    _set(params, f"{p}/class_embed/kernel", _lin(sd[f"{pre}.class_embed.weight"]))
    _set(params, f"{p}/class_embed/bias", sd[f"{pre}.class_embed.bias"])
    for i in range(3):
        _set(params, f"{p}/mask_embed/layers_{i}/kernel",
             _lin(sd[f"{pre}.mask_embed.layers.{i}.weight"]))
        _set(params, f"{p}/mask_embed/layers_{i}/bias",
             sd[f"{pre}.mask_embed.layers.{i}.bias"])

    def _mha_tree(src):
        return {
            "in_proj_weight": _lin(sd[f"{src}.in_proj_weight"]),
            "in_proj_bias": sd[f"{src}.in_proj_bias"],
            "out_proj/kernel": _lin(sd[f"{src}.out_proj.weight"]),
            "out_proj/bias": sd[f"{src}.out_proj.bias"],
        }

    def _layer_tree(i):
        """Reference decoder layer i -> {cross_attn, self_attn, ffn} dicts."""
        ca = f"{pre}.transformer_cross_attention_layers.{i}"
        sa = f"{pre}.transformer_self_attention_layers.{i}"
        ff = f"{pre}.transformer_ffn_layers.{i}"
        out = {}
        for k, v in _mha_tree(f"{ca}.multihead_attn").items():
            out[f"cross/multihead_attn/{k}"] = v
        out["cross/norm/scale"] = sd[f"{ca}.norm.weight"]
        out["cross/norm/bias"] = sd[f"{ca}.norm.bias"]
        for k, v in _mha_tree(f"{sa}.self_attn").items():
            out[f"self/self_attn/{k}"] = v
        out["self/norm/scale"] = sd[f"{sa}.norm.weight"]
        out["self/norm/bias"] = sd[f"{sa}.norm.bias"]
        for m in ("linear1", "linear2"):
            out[f"ffn/{m}/kernel"] = _lin(sd[f"{ff}.{m}.weight"])
            out[f"ffn/{m}/bias"] = sd[f"{ff}.{m}.bias"]
        out["ffn/norm/scale"] = sd[f"{ff}.norm.weight"]
        out["ffn/norm/bias"] = sd[f"{ff}.norm.bias"]
        return out

    n_levels = 3
    if dec_layers % n_levels == 0:
        # rounds-scan layout: layer i -> round r = i//3 (stacked leading
        # axis), sublayer position pos = i%3 (cross_attn_{pos}, ...)
        n_rounds = dec_layers // n_levels
        for pos in range(n_levels):
            trees = [_layer_tree(n_levels * r + pos) for r in range(n_rounds)]
            for key in trees[0]:
                sub, rest = key.split("/", 1)
                mod = {"cross": f"cross_attn_{pos}", "self": f"self_attn_{pos}",
                       "ffn": f"ffn_{pos}"}[sub]
                _set(params, f"{p}/rounds/{mod}/{rest}",
                     np.stack([t[key] for t in trees]))
    else:  # unrolled fallback layout
        for i in range(dec_layers):
            for key, v in _layer_tree(i).items():
                sub, rest = key.split("/", 1)
                mod = {"cross": f"cross_attn_{i}", "self": f"self_attn_{i}",
                       "ffn": f"ffn_{i}"}[sub]
                _set(params, f"{p}/{mod}/{rest}", v)


def convert_checkpoint(
    path_or_sd,
    backbone: str = "resnet",
    depth: int = 50,
    swin_depths: Tuple[int, ...] = (2, 2, 18, 2),
    dec_layers: int = 9,
    enc_layers: int = 6,
) -> Dict[str, Any]:
    """Returns {"params": ..., "frozen": ...} matching
    bm2f_tpu.models.MaskFormer.init's tree."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else
        {k: np.asarray(v) for k, v in path_or_sd.items()}
    )
    # handle legacy "static_query" naming (reference
    # mask2former_transformer_decoder.py:212-233 upgrade path)
    for k in list(sd):
        if "static_query" in k:
            sd[k.replace("static_query", "query_feat")] = sd.pop(k)

    params: Dict = {}
    frozen: Dict = {}
    if backbone == "resnet":
        convert_resnet(sd, params, frozen, depth)
    else:
        convert_swin(sd, params, swin_depths)
    convert_pixel_decoder(sd, params, enc_layers=enc_layers)
    convert_predictor(sd, params, dec_layers=dec_layers)
    return {"params": params, "frozen": frozen}
