"""Full-network torch oracle: a from-scratch PyTorch reimplementation of the
reference Mask2Former R50 forward (reference: maskformer_model.py:258-377 —
backbone -> MSDeformAttn pixel decoder -> masked transformer decoder) that
consumes a detectron2-named state dict, plus the reference's three inference
modes (:509-623). Used by tests/test_full_model_golden.py to prove that
`convert_checkpoint` + our Flax model reproduce the reference end to end —
the strongest in-container stand-in for zoo-checkpoint AP parity.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn.functional as F

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# random d2-named state dict (R50 + 6 enc + 9 dec, conv_dim 256)
# ---------------------------------------------------------------------------


def make_r50_m2f_state_dict(rng: np.random.RandomState, num_classes: int = 80,
                            num_queries: int = 100) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def rnd(*shape):
        return (rng.randn(*shape).astype(np.float32) * 0.05)

    def convbn(prefix, co, ci, k):
        sd[f"{prefix}.weight"] = rnd(co, ci, k, k)
        sd[f"{prefix}.norm.weight"] = rnd(co) + 1.0
        sd[f"{prefix}.norm.bias"] = rnd(co)
        sd[f"{prefix}.norm.running_mean"] = rnd(co)
        sd[f"{prefix}.norm.running_var"] = np.abs(rnd(co)) + 1.0

    convbn("backbone.stem.conv1", 64, 3, 7)
    stages = {"res2": (3, 64, 256, 64), "res3": (4, 256, 512, 128),
              "res4": (6, 512, 1024, 256), "res5": (3, 1024, 2048, 512)}
    for stage, (n, cin0, cout, cb) in stages.items():
        for b in range(n):
            cin = cin0 if b == 0 else cout
            convbn(f"backbone.{stage}.{b}.conv1", cb, cin, 1)
            convbn(f"backbone.{stage}.{b}.conv2", cb, cb, 3)
            convbn(f"backbone.{stage}.{b}.conv3", cout, cb, 1)
            if b == 0:
                convbn(f"backbone.{stage}.{b}.shortcut", cout, cin, 1)

    pre = "sem_seg_head.pixel_decoder"
    for i, ci in enumerate([2048, 1024, 512]):
        sd[f"{pre}.input_proj.{i}.0.weight"] = rnd(256, ci, 1, 1)
        sd[f"{pre}.input_proj.{i}.0.bias"] = rnd(256)
        sd[f"{pre}.input_proj.{i}.1.weight"] = rnd(256) + 1.0
        sd[f"{pre}.input_proj.{i}.1.bias"] = rnd(256)
    sd[f"{pre}.transformer.level_embed"] = rnd(3, 256)
    for i in range(6):
        src = f"{pre}.transformer.encoder.layers.{i}"
        for m, co in (("sampling_offsets", 192), ("attention_weights", 96),
                      ("value_proj", 256), ("output_proj", 256)):
            sd[f"{src}.self_attn.{m}.weight"] = rnd(co, 256)
            sd[f"{src}.self_attn.{m}.bias"] = rnd(co) * (
                0.1 if m == "sampling_offsets" else 1.0
            )
        sd[f"{src}.linear1.weight"] = rnd(1024, 256)
        sd[f"{src}.linear1.bias"] = rnd(1024)
        sd[f"{src}.linear2.weight"] = rnd(256, 1024)
        sd[f"{src}.linear2.bias"] = rnd(256)
        for m in ("norm1", "norm2"):
            sd[f"{src}.{m}.weight"] = rnd(256) + 1.0
            sd[f"{src}.{m}.bias"] = rnd(256)
    sd[f"{pre}.mask_features.weight"] = rnd(256, 256, 1, 1)
    sd[f"{pre}.mask_features.bias"] = rnd(256)
    sd[f"{pre}.adapter_1.weight"] = rnd(256, 256, 1, 1)
    sd[f"{pre}.adapter_1.norm.weight"] = rnd(256) + 1.0
    sd[f"{pre}.adapter_1.norm.bias"] = rnd(256)
    sd[f"{pre}.layer_1.weight"] = rnd(256, 256, 3, 3)
    sd[f"{pre}.layer_1.norm.weight"] = rnd(256) + 1.0
    sd[f"{pre}.layer_1.norm.bias"] = rnd(256)

    pre = "sem_seg_head.predictor"
    sd[f"{pre}.query_feat.weight"] = rnd(num_queries, 256)
    sd[f"{pre}.query_embed.weight"] = rnd(num_queries, 256)
    sd[f"{pre}.level_embed.weight"] = rnd(3, 256)
    sd[f"{pre}.decoder_norm.weight"] = rnd(256) + 1.0
    sd[f"{pre}.decoder_norm.bias"] = rnd(256)
    sd[f"{pre}.class_embed.weight"] = rnd(num_classes + 1, 256)
    sd[f"{pre}.class_embed.bias"] = rnd(num_classes + 1)
    for i in range(3):
        sd[f"{pre}.mask_embed.layers.{i}.weight"] = rnd(256, 256)
        sd[f"{pre}.mask_embed.layers.{i}.bias"] = rnd(256)
    for i in range(9):
        for blk, mha in (("transformer_cross_attention_layers", "multihead_attn"),
                         ("transformer_self_attention_layers", "self_attn")):
            sd[f"{pre}.{blk}.{i}.{mha}.in_proj_weight"] = rnd(768, 256)
            sd[f"{pre}.{blk}.{i}.{mha}.in_proj_bias"] = rnd(768)
            sd[f"{pre}.{blk}.{i}.{mha}.out_proj.weight"] = rnd(256, 256)
            sd[f"{pre}.{blk}.{i}.{mha}.out_proj.bias"] = rnd(256)
            sd[f"{pre}.{blk}.{i}.norm.weight"] = rnd(256) + 1.0
            sd[f"{pre}.{blk}.{i}.norm.bias"] = rnd(256)
        f = f"{pre}.transformer_ffn_layers.{i}"
        sd[f"{f}.linear1.weight"] = rnd(2048, 256)
        sd[f"{f}.linear1.bias"] = rnd(2048)
        sd[f"{f}.linear2.weight"] = rnd(256, 2048)
        sd[f"{f}.linear2.bias"] = rnd(256)
        sd[f"{f}.norm.weight"] = rnd(256) + 1.0
        sd[f"{f}.norm.bias"] = rnd(256)
    return sd


# ---------------------------------------------------------------------------
# torch forward
# ---------------------------------------------------------------------------


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def _conv_bn(sd, prefix, x, stride=1):
    w = _t(sd, f"{prefix}.weight")
    k = w.shape[-1]
    y = F.conv2d(x, w, stride=stride, padding=(k - 1) // 2)
    g, b = _t(sd, f"{prefix}.norm.weight"), _t(sd, f"{prefix}.norm.bias")
    m, v = _t(sd, f"{prefix}.norm.running_mean"), _t(sd, f"{prefix}.norm.running_var")
    scale = (g / torch.sqrt(v + BN_EPS))[None, :, None, None]
    return y * scale + (b - m * g / torch.sqrt(v + BN_EPS))[None, :, None, None]


def torch_resnet50(sd, x) -> Dict[str, torch.Tensor]:
    """Caffe-style R50 with stride_in_1x1 and frozen BN (d2 defaults for the
    Mask2Former R50 configs)."""
    x = F.relu(_conv_bn(sd, "backbone.stem.conv1", x, stride=2))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    outs = {}
    for stage, n in (("res2", 3), ("res3", 4), ("res4", 6), ("res5", 3)):
        for b in range(n):
            stride = 2 if (b == 0 and stage != "res2") else 1
            p = f"backbone.{stage}.{b}"
            sc = (_conv_bn(sd, f"{p}.shortcut", x, stride=stride)
                  if f"{p}.shortcut.weight" in sd else x)
            y = F.relu(_conv_bn(sd, f"{p}.conv1", x, stride=stride))
            y = F.relu(_conv_bn(sd, f"{p}.conv2", y))
            y = _conv_bn(sd, f"{p}.conv3", y)
            x = F.relu(y + sc)
        outs[stage] = x
    return outs


def sine_pos_2d(h, w, num_pos_feats=128) -> torch.Tensor:
    """Reference PositionEmbeddingSine with normalize=True over an all-valid
    mask. Returns (C, H, W)."""
    not_mask = torch.ones(1, h, w)
    y = not_mask.cumsum(1, dtype=torch.float32)
    x = not_mask.cumsum(2, dtype=torch.float32)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((py, px), dim=3)[0].permute(2, 0, 1)  # (C, H, W)


def _lin(sd, prefix, x):
    return F.linear(x, _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"))


def _ln(sd, prefix, x):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, f"{prefix}.weight"),
                        _t(sd, f"{prefix}.bias"), eps=1e-5)


def _gn(sd, prefix, x):
    return F.group_norm(x, 32, _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
                        eps=1e-5)


def ms_deform_core(value, shapes, loc, attn) -> torch.Tensor:
    """Pure-torch deformable attention core (reference
    ms_deform_attn_func.py:52-72 semantics via grid_sample)."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    out = torch.zeros(B, Q, M, D)
    start = 0
    for lid, (H, W) in enumerate(shapes):
        v = value[:, start: start + H * W]
        start += H * W
        v = v.permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = loc[:, :, :, lid] * 2 - 1
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Q, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        s = s.reshape(B, M, D, Q, P)
        w = attn[:, :, :, lid].permute(0, 2, 1, 3)[:, :, None]
        out += (s * w).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(B, Q, M * D)


def torch_pixel_decoder(sd, feats) -> Tuple[torch.Tensor, List[torch.Tensor]]:
    """MSDeformAttnPixelDecoder (reference msdeformattn.py:165-358).
    Returns (mask_features, [stride32, stride16, stride8])."""
    pre = "sem_seg_head.pixel_decoder"
    srcs, poss, shapes = [], [], []
    for i, f in enumerate(["res5", "res4", "res3"]):
        x = F.conv2d(feats[f], _t(sd, f"{pre}.input_proj.{i}.0.weight"),
                     _t(sd, f"{pre}.input_proj.{i}.0.bias"))
        x = _gn(sd, f"{pre}.input_proj.{i}.1", x)
        B, C, H, W = x.shape
        shapes.append((H, W))
        srcs.append(x.flatten(2).transpose(1, 2))  # (B, HW, C)
        pe = sine_pos_2d(H, W, C // 2).flatten(1).transpose(0, 1)  # (HW, C)
        poss.append(pe + _t(sd, f"{pre}.transformer.level_embed")[i])

    src = torch.cat(srcs, 1)
    pos = torch.cat(poss, 0)[None]
    B, S, C = src.shape
    M, L, P = 8, 3, 4

    # reference points: pixel-center grid per level, broadcast over levels
    refs = []
    for h, w in shapes:
        ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
        xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        refs.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = torch.cat(refs, 0)  # (S, 2)
    ref = ref[None, :, None, :].expand(B, S, L, 2)

    normalizer = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)

    for i in range(6):
        lp = f"{pre}.transformer.encoder.layers.{i}"
        q = src + pos
        value = _lin(sd, f"{lp}.self_attn.value_proj", src).view(B, S, M, C // M)
        offsets = _lin(sd, f"{lp}.self_attn.sampling_offsets", q).view(B, S, M, L, P, 2)
        attn = _lin(sd, f"{lp}.self_attn.attention_weights", q).view(B, S, M, L * P)
        attn = F.softmax(attn, -1).view(B, S, M, L, P)
        loc = ref[:, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]
        core = ms_deform_core(value, shapes, loc, attn)
        src = src + _lin(sd, f"{lp}.self_attn.output_proj", core)
        src = _ln(sd, f"{lp}.norm1", src)
        ffn = _lin(sd, f"{lp}.linear2", F.relu(_lin(sd, f"{lp}.linear1", src)))
        src = _ln(sd, f"{lp}.norm2", src + ffn)

    outs = []
    start = 0
    for (H, W) in shapes:
        outs.append(src[:, start: start + H * W].transpose(1, 2).reshape(B, C, H, W))
        start += H * W

    # extra FPN level on res2 (adapter_1/layer_1; lateral convs bias-free
    # because norm="GN", reference msdeformattn.py:270-292)
    lat = F.conv2d(feats["res2"], _t(sd, f"{pre}.adapter_1.weight"))
    lat = _gn(sd, f"{pre}.adapter_1.norm", lat)
    top = F.interpolate(outs[-1], size=lat.shape[-2:], mode="bilinear",
                        align_corners=False)
    y = lat + top
    y = F.conv2d(y, _t(sd, f"{pre}.layer_1.weight"), padding=1)
    y = F.relu(_gn(sd, f"{pre}.layer_1.norm", y))

    mask_features = F.conv2d(y, _t(sd, f"{pre}.mask_features.weight"),
                             _t(sd, f"{pre}.mask_features.bias"))
    return mask_features, outs[:3]


def _mha(sd, prefix, q, k, v, attn_mask=None, num_heads=8):
    out, _ = F.multi_head_attention_forward(
        q.transpose(0, 1), k.transpose(0, 1), v.transpose(0, 1),
        q.shape[-1], num_heads,
        _t(sd, f"{prefix}.in_proj_weight"), _t(sd, f"{prefix}.in_proj_bias"),
        None, None, False, 0.0,
        _t(sd, f"{prefix}.out_proj.weight"), _t(sd, f"{prefix}.out_proj.bias"),
        attn_mask=attn_mask, need_weights=False,
    )
    return out.transpose(0, 1)


def torch_decoder(sd, ms_feats, mask_features, num_classes=80, num_queries=100,
                  dec_layers=9):
    """MultiScaleMaskedTransformerDecoder (reference
    mask2former_transformer_decoder.py:207-465), post-norm."""
    pre = "sem_seg_head.predictor"
    heads = 8
    B = ms_feats[0].shape[0]
    C = 256
    nL = 3

    srcs, poss, sizes = [], [], []
    for i in range(nL):
        x = ms_feats[i]
        _, _, H, W = x.shape
        sizes.append((H, W))
        srcs.append(x.flatten(2).transpose(1, 2)
                    + _t(sd, f"{pre}.level_embed.weight")[i])
        poss.append(sine_pos_2d(H, W, C // 2).flatten(1).transpose(0, 1)[None])

    def heads_fn(output, attn_size):
        dec = _ln(sd, f"{pre}.decoder_norm", output)
        logits = _lin(sd, f"{pre}.class_embed", dec)
        me = dec
        for i in range(3):
            me = _lin(sd, f"{pre}.mask_embed.layers.{i}", me)
            if i < 2:
                me = F.relu(me)
        masks = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        am = F.interpolate(masks, size=attn_size, mode="bilinear",
                           align_corners=False)
        am = (am.sigmoid().flatten(2)[:, None].repeat(1, heads, 1, 1)
              .flatten(0, 1) < 0.5).bool()  # (B*heads, Q, HW) True = blocked
        am[torch.where(am.sum(-1) == am.shape[-1])] = False
        return logits, masks, am.detach()

    output = _t(sd, f"{pre}.query_feat.weight")[None].expand(B, num_queries, C)
    qpos = _t(sd, f"{pre}.query_embed.weight")[None].expand(B, num_queries, C)

    all_logits, all_masks = [], []
    logits, masks, am = heads_fn(output, sizes[0])
    all_logits.append(logits)
    all_masks.append(masks)

    for i in range(dec_layers):
        li = i % nL
        t2 = _mha(sd, f"{pre}.transformer_cross_attention_layers.{i}.multihead_attn",
                  output + qpos, srcs[li] + poss[li], srcs[li], attn_mask=am)
        output = _ln(sd, f"{pre}.transformer_cross_attention_layers.{i}.norm",
                     output + t2)
        t2 = _mha(sd, f"{pre}.transformer_self_attention_layers.{i}.self_attn",
                  output + qpos, output + qpos, output)
        output = _ln(sd, f"{pre}.transformer_self_attention_layers.{i}.norm",
                     output + t2)
        fp = f"{pre}.transformer_ffn_layers.{i}"
        t2 = _lin(sd, f"{fp}.linear2", F.relu(_lin(sd, f"{fp}.linear1", output)))
        output = _ln(sd, f"{fp}.norm", output + t2)
        logits, masks, am = heads_fn(output, sizes[(i + 1) % nL])
        all_logits.append(logits)
        all_masks.append(masks)

    return {
        "pred_logits": all_logits[-1],
        "pred_masks": all_masks[-1],
        "aux_logits": torch.stack(all_logits[:-1]),
        "aux_masks": torch.stack(all_masks[:-1]),
    }


def torch_mask2former_forward(sd, images_nchw: torch.Tensor,
                              num_classes=80, num_queries=100):
    """Full reference forward on normalized images (B, 3, H, W)."""
    feats = torch_resnet50(sd, images_nchw)
    mask_features, ms = torch_pixel_decoder(sd, feats)
    return torch_decoder(sd, ms, mask_features, num_classes, num_queries)


# ---------------------------------------------------------------------------
# reference inference modes (maskformer_model.py:509-623), per image
# ---------------------------------------------------------------------------


def torch_semantic_inference(mask_cls, mask_pred):
    probs = F.softmax(mask_cls, dim=-1)[..., :-1]
    masks = mask_pred.sigmoid()
    return torch.einsum("qc,qhw->chw", probs, masks)


def torch_instance_inference(mask_cls, mask_pred, num_classes, topk=100):
    scores = F.softmax(mask_cls, dim=-1)[:, :-1]
    Q = mask_cls.shape[0]
    labels = torch.arange(num_classes)[None].repeat(Q, 1).flatten(0, 1)
    scores_per_image, topk_indices = scores.flatten(0, 1).topk(topk, sorted=True)
    labels_per_image = labels[topk_indices]
    topk_indices = torch.div(topk_indices, num_classes, rounding_mode="floor")
    mask_pred = mask_pred[topk_indices]
    binary = (mask_pred > 0).float()
    mask_scores = (mask_pred.sigmoid().flatten(1) * binary.flatten(1)).sum(1) / (
        binary.flatten(1).sum(1) + 1e-6
    )
    return scores_per_image * mask_scores, labels_per_image, binary.bool()


def torch_panoptic_inference(mask_cls, mask_pred, num_classes, thing_ids,
                             object_mask_threshold=0.8, overlap_threshold=0.8):
    """Sequential reference fusion (maskformer_model.py:515-571). Returns
    (panoptic_seg (H, W) int32, segments_info)."""
    scores, labels = F.softmax(mask_cls, dim=-1).max(-1)
    mask_pred = mask_pred.sigmoid()
    keep = labels.ne(num_classes) & (scores > object_mask_threshold)
    cur_scores, cur_classes = scores[keep], labels[keep]
    cur_masks = mask_pred[keep]
    cur_prob_masks = cur_scores.view(-1, 1, 1) * cur_masks

    h, w = cur_masks.shape[-2:]
    panoptic_seg = torch.zeros((h, w), dtype=torch.int32)
    segments_info = []
    current_segment_id = 0
    if cur_masks.shape[0] == 0:
        return panoptic_seg, segments_info
    cur_mask_ids = cur_prob_masks.argmax(0)
    stuff_memory_list: Dict[int, int] = {}
    for k in range(cur_classes.shape[0]):
        pred_class = cur_classes[k].item()
        isthing = pred_class in thing_ids
        mask_area = (cur_mask_ids == k).sum().item()
        original_area = (cur_masks[k] >= 0.5).sum().item()
        mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum().item() > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing:
                if int(pred_class) in stuff_memory_list:
                    panoptic_seg[mask] = stuff_memory_list[int(pred_class)]
                    continue
                else:
                    stuff_memory_list[int(pred_class)] = current_segment_id + 1
            current_segment_id += 1
            panoptic_seg[mask] = current_segment_id
            segments_info.append(
                {"id": current_segment_id, "isthing": bool(isthing),
                 "category_id": int(pred_class)}
            )
    return panoptic_seg, segments_info


# ---------------------------------------------------------------------------
# video stack (reference: mask2former_video/) — 3D sine PE, clip decoder,
# full video forward, track inference
# ---------------------------------------------------------------------------


def sine_pos_3d(t, h, w, num_pos_feats=128) -> torch.Tensor:
    """Reference PositionEmbeddingSine3D (mask2former_video/.../
    position_encoding.py:29-57), normalize=True over an all-valid mask.
    Returns (T, C, H, W) with C = 2*num_pos_feats (pos = cat(y, x) + z)."""
    not_mask = torch.ones(1, t, h, w)
    z = not_mask.cumsum(1, dtype=torch.float32)
    y = not_mask.cumsum(2, dtype=torch.float32)
    x = not_mask.cumsum(3, dtype=torch.float32)
    eps, scale = 1e-6, 2 * math.pi
    z = z / (z[:, -1:, :, :] + eps) * scale
    y = y / (y[:, :, -1:, :] + eps) * scale
    x = x / (x[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    dim_t_z = torch.arange(num_pos_feats * 2, dtype=torch.float32)
    dim_t_z = 10000 ** (
        2 * torch.div(dim_t_z, 2, rounding_mode="floor") / (num_pos_feats * 2)
    )
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    pz = z[..., None] / dim_t_z
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=5).flatten(4)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=5).flatten(4)
    pz = torch.stack((pz[..., 0::2].sin(), pz[..., 1::2].cos()), dim=5).flatten(4)
    return (torch.cat((py, px), dim=4) + pz).permute(0, 1, 4, 2, 3)[0]


def torch_video_decoder(sd, ms_feats, mask_features, num_classes=40,
                        num_queries=100, dec_layers=9):
    """VideoMultiScaleMaskedTransformerDecoder (reference
    video_mask2former_transformer_decoder.py:380-460): clip-wide memory
    T*H*W per level, masks via einsum bqc,btchw->bqthw (:449), attention
    mask flattened over T*H*W (:453-458).

    ms_feats: list of (B, T, C, H, W); mask_features: (B, T, C, h4, w4)."""
    pre = "sem_seg_head.predictor"
    heads = 8
    C = 256
    nL = 3
    B, T = ms_feats[0].shape[:2]

    srcs, poss, sizes = [], [], []
    for i in range(nL):
        x = ms_feats[i]
        H, W = x.shape[-2:]
        sizes.append((H, W))
        srcs.append(
            x.permute(0, 1, 3, 4, 2).reshape(B, T * H * W, C)
            + _t(sd, f"{pre}.level_embed.weight")[i]
        )
        pe = sine_pos_3d(T, H, W, C // 2)  # (T, C, H, W)
        poss.append(pe.permute(0, 2, 3, 1).reshape(1, T * H * W, C))

    mf = mask_features

    def heads_fn(output, attn_size):
        dec = _ln(sd, f"{pre}.decoder_norm", output)
        logits = _lin(sd, f"{pre}.class_embed", dec)
        me = dec
        for i in range(3):
            me = _lin(sd, f"{pre}.mask_embed.layers.{i}", me)
            if i < 2:
                me = F.relu(me)
        masks = torch.einsum("bqc,btchw->bqthw", me, mf)
        am = F.interpolate(masks.flatten(0, 1), size=attn_size,
                           mode="bilinear", align_corners=False)
        am = am.reshape(B, num_queries, T * attn_size[0] * attn_size[1])
        am = (am.sigmoid()[:, None].repeat(1, heads, 1, 1).flatten(0, 1)
              < 0.5).bool()
        am[torch.where(am.sum(-1) == am.shape[-1])] = False
        return logits, masks, am.detach()

    output = _t(sd, f"{pre}.query_feat.weight")[None].expand(B, num_queries, C)
    qpos = _t(sd, f"{pre}.query_embed.weight")[None].expand(B, num_queries, C)

    all_logits, all_masks = [], []
    logits, masks, am = heads_fn(output, sizes[0])
    all_logits.append(logits)
    all_masks.append(masks)

    for i in range(dec_layers):
        li = i % nL
        t2 = _mha(sd, f"{pre}.transformer_cross_attention_layers.{i}.multihead_attn",
                  output + qpos, srcs[li] + poss[li], srcs[li], attn_mask=am)
        output = _ln(sd, f"{pre}.transformer_cross_attention_layers.{i}.norm",
                     output + t2)
        t2 = _mha(sd, f"{pre}.transformer_self_attention_layers.{i}.self_attn",
                  output + qpos, output + qpos, output)
        output = _ln(sd, f"{pre}.transformer_self_attention_layers.{i}.norm",
                     output + t2)
        fp = f"{pre}.transformer_ffn_layers.{i}"
        t2 = _lin(sd, f"{fp}.linear2", F.relu(_lin(sd, f"{fp}.linear1", output)))
        output = _ln(sd, f"{fp}.norm", output + t2)
        logits, masks, am = heads_fn(output, sizes[(i + 1) % nL])
        all_logits.append(logits)
        all_masks.append(masks)

    return {
        "pred_logits": all_logits[-1],
        "pred_masks": all_masks[-1],
        "aux_logits": torch.stack(all_logits[:-1]),
        "aux_masks": torch.stack(all_masks[:-1]),
    }


def torch_video_mask2former_forward(sd, clip_ntchw: torch.Tensor,
                                    num_classes=40, num_queries=100,
                                    dec_layers=9):
    """Full reference video forward on a normalized clip (B, T, 3, H, W):
    frames flattened through backbone + pixel decoder in one pass
    (video_maskformer_model.py:316-324), then the clip decoder."""
    B, T = clip_ntchw.shape[:2]
    feats = torch_resnet50(sd, clip_ntchw.flatten(0, 1))
    mask_features, ms = torch_pixel_decoder(sd, feats)
    ms_v = [m.reshape(B, T, *m.shape[1:]) for m in ms]
    mf_v = mask_features.reshape(B, T, *mask_features.shape[1:])
    return torch_video_decoder(sd, ms_v, mf_v, num_classes, num_queries,
                               dec_layers)


def torch_inference_video(pred_cls, pred_masks, num_classes, topk=10):
    """Track inference (reference video_maskformer_model.py:676-694): top-k
    over the flattened Q x K score matrix; masks thresholded at 0. Returns
    (scores (k,), labels (k,), masks (k, T, H, W) bool), sorted by score
    (the reference uses sorted=False; order is irrelevant to track AP)."""
    scores = F.softmax(pred_cls, dim=-1)[:, :-1]
    num_queries = pred_cls.shape[0]
    labels = (torch.arange(num_classes)[None].repeat(num_queries, 1)
              .flatten(0, 1))
    scores_per_video, topk_indices = scores.flatten(0, 1).topk(topk)
    labels_per_video = labels[topk_indices]
    qidx = torch.div(topk_indices, num_classes, rounding_mode="floor")
    masks = pred_masks[qidx] > 0.0
    return scores_per_video, labels_per_video, masks
