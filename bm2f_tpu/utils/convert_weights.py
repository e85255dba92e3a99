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
    for s, depth in enumerate(depths):
        for b in range(depth):
            src = f"{pre}.layers.{s}.blocks.{b}"
            dst = f"backbone/stage{s}_block{b}"
            ln(f"{src}.norm1", f"{dst}/norm1")
            ln(f"{src}.norm2", f"{dst}/norm2")
            lin(f"{src}.attn.qkv", f"{dst}/attn/qkv")
            lin(f"{src}.attn.proj", f"{dst}/attn/proj")
            _set(
                params,
                f"{dst}/attn/relative_position_bias_table",
                sd[f"{src}.attn.relative_position_bias_table"],
            )
            lin(f"{src}.mlp.fc1", f"{dst}/mlp_fc1")
            lin(f"{src}.mlp.fc2", f"{dst}/mlp_fc2")
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

    for i in range(enc_layers):
        src = f"{pre}.transformer.encoder.layers.{i}"
        dst = f"{p}/encoder_layer_{i}"
        for m in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            _set(params, f"{dst}/self_attn/{m}/kernel", _lin(sd[f"{src}.self_attn.{m}.weight"]))
            _set(params, f"{dst}/self_attn/{m}/bias", sd[f"{src}.self_attn.{m}.bias"])
        for m in ("linear1", "linear2"):
            _set(params, f"{dst}/{m}/kernel", _lin(sd[f"{src}.{m}.weight"]))
            _set(params, f"{dst}/{m}/bias", sd[f"{src}.{m}.bias"])
        for m in ("norm1", "norm2"):
            _set(params, f"{dst}/{m}/scale", sd[f"{src}.{m}.weight"])
            _set(params, f"{dst}/{m}/bias", sd[f"{src}.{m}.bias"])

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

    def mha(src, dst):
        _set(params, f"{dst}/in_proj_weight", _lin(sd[f"{src}.in_proj_weight"]))
        _set(params, f"{dst}/in_proj_bias", sd[f"{src}.in_proj_bias"])
        _set(params, f"{dst}/out_proj/kernel", _lin(sd[f"{src}.out_proj.weight"]))
        _set(params, f"{dst}/out_proj/bias", sd[f"{src}.out_proj.bias"])

    for i in range(dec_layers):
        mha(f"{pre}.transformer_cross_attention_layers.{i}.multihead_attn",
            f"{p}/cross_attn_{i}/multihead_attn")
        _set(params, f"{p}/cross_attn_{i}/norm/scale",
             sd[f"{pre}.transformer_cross_attention_layers.{i}.norm.weight"])
        _set(params, f"{p}/cross_attn_{i}/norm/bias",
             sd[f"{pre}.transformer_cross_attention_layers.{i}.norm.bias"])
        mha(f"{pre}.transformer_self_attention_layers.{i}.self_attn",
            f"{p}/self_attn_{i}/self_attn")
        _set(params, f"{p}/self_attn_{i}/norm/scale",
             sd[f"{pre}.transformer_self_attention_layers.{i}.norm.weight"])
        _set(params, f"{p}/self_attn_{i}/norm/bias",
             sd[f"{pre}.transformer_self_attention_layers.{i}.norm.bias"])
        for m in ("linear1", "linear2"):
            _set(params, f"{p}/ffn_{i}/{m}/kernel",
                 _lin(sd[f"{pre}.transformer_ffn_layers.{i}.{m}.weight"]))
            _set(params, f"{p}/ffn_{i}/{m}/bias",
                 sd[f"{pre}.transformer_ffn_layers.{i}.{m}.bias"])
        _set(params, f"{p}/ffn_{i}/norm/scale",
             sd[f"{pre}.transformer_ffn_layers.{i}.norm.weight"])
        _set(params, f"{p}/ffn_{i}/norm/bias",
             sd[f"{pre}.transformer_ffn_layers.{i}.norm.bias"])


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
