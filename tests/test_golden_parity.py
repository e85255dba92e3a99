"""Golden parity tests: torch modules with the reference's exact semantics
vs our Flax modules with converted weights. This is the per-module
equivalent of eval-parity against zoo checkpoints (SURVEY.md §4b)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bm2f_tpu.models.layers import MultiHeadAttention
from bm2f_tpu.models.pixel_decoder import MSDeformAttnModule, encoder_reference_points
from bm2f_tpu.models.position_encoding import sine_position_embedding_2d
from bm2f_tpu.models.resnet import BottleneckBlock
from bm2f_tpu.utils.convert_weights import _conv, _lin

RTOL, ATOL = 2e-4, 2e-4


def test_sine_position_embedding_matches_torch_formula():
    """Reference PositionEmbeddingSine (position_encoding.py:29-52) with an
    all-valid mask == cumsum of ones."""
    H, W, npf = 7, 9, 16
    ours = np.asarray(sine_position_embedding_2d(H, W, npf))

    mask = torch.zeros(1, H, W, dtype=torch.bool)
    not_mask = ~mask
    y = not_mask.cumsum(1, dtype=torch.float32)
    x = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * np.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / npf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    ref = torch.cat((py, px), dim=3)[0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_multihead_attention_matches_torch(rng):
    B, Nq, Nk, C, H = 2, 5, 11, 32, 4
    tm = nn.MultiheadAttention(C, H, batch_first=True)
    q = rng.randn(B, Nq, C).astype(np.float32)
    k = rng.randn(B, Nk, C).astype(np.float32)
    v = rng.randn(B, Nk, C).astype(np.float32)
    # boolean mask: True = blocked
    mask = rng.rand(B * H, Nq, Nk) > 0.7
    mask[:, :, 0] = False  # keep at least one key
    with torch.no_grad():
        ref, _ = tm(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            attn_mask=torch.from_numpy(mask),
        )

    ours_mod = MultiHeadAttention(num_heads=H)
    params = {
        "in_proj_weight": jnp.asarray(_lin(tm.in_proj_weight.detach().numpy())),
        "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
        "out_proj": {
            "kernel": jnp.asarray(_lin(tm.out_proj.weight.detach().numpy())),
            "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
        },
    }
    bias = jnp.where(jnp.asarray(mask.reshape(B, H, Nq, Nk)), -1e9, 0.0)
    out = ours_mod.apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_bottleneck_block_matches_torch(rng):
    """Caffe-style bottleneck (stride_in_1x1) with frozen BN folding."""
    Cin, Cb, Cout, stride = 16, 8, 32, 2
    x = rng.randn(1, Cin, 16, 16).astype(np.float32)

    convs = {}
    for name, (ci, co, k, s) in {
        "conv1": (Cin, Cb, 1, stride),
        "conv2": (Cb, Cb, 3, 1),
        "conv3": (Cb, Cout, 1, 1),
        "shortcut": (Cin, Cout, 1, stride),
    }.items():
        w = (rng.randn(co, ci, k, k) * 0.1).astype(np.float32)
        gamma = rng.rand(co).astype(np.float32) + 0.5
        beta = rng.randn(co).astype(np.float32)
        mean = rng.randn(co).astype(np.float32)
        var = rng.rand(co).astype(np.float32) + 0.5
        convs[name] = (w, gamma, beta, mean, var, s, k)

    def t_convbn(x, name):
        w, g, b, m, v, s, k = convs[name]
        y = F.conv2d(x, torch.from_numpy(w), stride=s, padding=(k - 1) // 2)
        return (y - torch.from_numpy(m)[None, :, None, None]) / torch.sqrt(
            torch.from_numpy(v)[None, :, None, None] + 1e-5
        ) * torch.from_numpy(g)[None, :, None, None] + torch.from_numpy(b)[
            None, :, None, None
        ]

    tx = torch.from_numpy(x)
    out = F.relu(t_convbn(tx, "conv1"))
    out = F.relu(t_convbn(out, "conv2"))
    out = t_convbn(out, "conv3")
    ref = F.relu(out + t_convbn(tx, "shortcut")).numpy()

    params, frozen = {}, {}
    for name in convs:
        w, g, b, m, v, s, k = convs[name]
        params[name] = {"conv": {"kernel": jnp.asarray(_conv(w))}}
        scale = g / np.sqrt(v + 1e-5)
        frozen[name] = {
            "norm": {"scale": jnp.asarray(scale), "bias": jnp.asarray(b - m * scale)}
        }

    block = BottleneckBlock(
        bottleneck_channels=Cb, out_channels=Cout, stride=stride,
        has_shortcut=True,
    )
    ours = block.apply(
        {"params": params, "frozen": frozen},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=RTOL, atol=ATOL
    )


def _torch_ms_deform_core(value, shapes, loc, attn):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    out = torch.zeros(B, Q, M, D)
    start = 0
    for lid, (H, W) in enumerate(shapes):
        v = value[:, start : start + H * W]
        start += H * W
        v = v.permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = loc[:, :, :, lid] * 2 - 1
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Q, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        s = s.reshape(B, M, D, Q, P)
        w = attn[:, :, :, lid].permute(0, 2, 1, 3)[:, :, None]
        out += (s * w).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(B, Q, M * D)


def test_msdeform_module_matches_torch(rng):
    """Full MSDeformAttn module semantics (reference:
    ops/modules/ms_deform_attn.py:82-125): value/offset/weight projections,
    softmax over L*P, loc = ref + offset/normalizer, core, output proj."""
    C, M, P = 32, 4, 4
    shapes = ((8, 10), (4, 5))
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    B, Q = 2, S
    q_in = rng.randn(B, Q, C).astype(np.float32)
    src = rng.randn(B, Q, C).astype(np.float32)

    lins = {}
    for name, co in {
        "sampling_offsets": M * L * P * 2,
        "attention_weights": M * L * P,
        "value_proj": C,
        "output_proj": C,
    }.items():
        lins[name] = (
            (rng.randn(co, C) * 0.05).astype(np.float32),
            (rng.randn(co) * 0.05).astype(np.float32),
        )

    ref_pts = np.asarray(encoder_reference_points(shapes))  # (S, L, 2)

    # torch reference
    tq, tsrc = torch.from_numpy(q_in), torch.from_numpy(src)
    def tl(name, x):
        w, b = lins[name]
        return F.linear(x, torch.from_numpy(w), torch.from_numpy(b))
    value = tl("value_proj", tsrc).view(B, S, M, C // M)
    offsets = tl("sampling_offsets", tq).view(B, Q, M, L, P, 2)
    attn = tl("attention_weights", tq).view(B, Q, M, L * P)
    attn = F.softmax(attn, -1).view(B, Q, M, L, P)
    normalizer = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
    rp = torch.from_numpy(ref_pts)[None, :, None, :, None, :]  # (1,S,1,L,1,2)
    locs = rp + offsets / normalizer[None, None, None, :, None, :]
    core = _torch_ms_deform_core(value, shapes, locs, attn)
    ref = tl("output_proj", core).numpy()

    # ours with converted weights
    mod = MSDeformAttnModule(C, L, M, P)
    params = {
        name: {"kernel": jnp.asarray(_lin(w)), "bias": jnp.asarray(b)}
        for name, (w, b) in lins.items()
    }
    ours = mod.apply(
        {"params": params}, jnp.asarray(q_in), jnp.asarray(ref_pts),
        jnp.asarray(src), shapes,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)


def test_loss_labels_matches_torch_cross_entropy(rng):
    """Weighted CE with eos down-weighting (reference: criterion.py:809-826
    F.cross_entropy(..., empty_weight) with empty_weight[-1]=0.1)."""
    from bm2f_tpu.losses.criterion import SetCriterionConfig, _loss_labels

    B, Q, K, G = 2, 7, 4, 3
    logits = rng.randn(B, Q, K + 1).astype(np.float32)
    labels = rng.randint(0, K, (B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)
    valid[1, 2] = False
    assign = np.stack([rng.permutation(Q)[:G] for _ in range(B)]).astype(np.int32)

    cfg = SetCriterionConfig(num_classes=K, eos_coef=0.1)
    ours = float(_loss_labels(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid),
        jnp.asarray(assign), cfg,
    ))

    target_classes = torch.full((B, Q), K, dtype=torch.long)
    for b in range(B):
        for g in range(G):
            if valid[b, g]:
                target_classes[b, assign[b, g]] = int(labels[b, g])
    empty_weight = torch.ones(K + 1)
    empty_weight[-1] = 0.1
    ref = F.cross_entropy(
        torch.from_numpy(logits).transpose(1, 2), target_classes, empty_weight
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5, atol=1e-6)


def test_point_loss_formulas_match_reference(rng):
    """sigmoid_ce_loss / dice_loss at fixed sampled points (reference:
    criterion.py:80-131): mean over points, sum over masks, / num_masks."""
    N, P = 6, 64
    logits = rng.randn(N, P).astype(np.float32)
    labels = (rng.rand(N, P) > 0.5).astype(np.float32)
    num_masks = 4.0

    tl, tt = torch.from_numpy(logits), torch.from_numpy(labels)
    ce_ref = F.binary_cross_entropy_with_logits(tl, tt, reduction="none").mean(1).sum() / num_masks
    p = tl.sigmoid()
    dice_ref = (1 - (2 * (p * tt).sum(-1) + 1) / (p.sum(-1) + tt.sum(-1) + 1)).sum() / num_masks

    x, t = jnp.asarray(logits), jnp.asarray(labels)
    ce = jnp.maximum(x, 0) - x * t + jax.nn.softplus(-jnp.abs(x))
    ce_ours = float(jnp.sum(ce.mean(-1)) / num_masks)
    sp = jax.nn.sigmoid(x)
    dice_ours = float(jnp.sum(
        1 - (2 * jnp.sum(sp * t, -1) + 1) / (jnp.sum(sp, -1) + jnp.sum(t, -1) + 1)
    ) / num_masks)
    np.testing.assert_allclose(ce_ours, float(ce_ref), rtol=1e-5)
    np.testing.assert_allclose(dice_ours, float(dice_ref), rtol=1e-5)


def test_swin_block_matches_torch(rng):
    """SwinBlock (no shift) vs a from-scratch torch implementation of the
    standard Swin transformer block (reference: swin.py:174-298 semantics:
    LN -> window attention with relative position bias -> residual ->
    LN -> MLP(GELU) -> residual)."""
    import math

    from bm2f_tpu.models.swin import SwinBlock, _relative_position_index

    C, H, W, heads, win = 32, 14, 14, 4, 7
    x = rng.randn(1, H, W, C).astype(np.float32)

    blk = SwinBlock(dim=C, num_heads=heads, window=win, shift=0,
                    mlp_ratio=2.0, qkv_bias=True, qk_scale=None, drop_path=0.0)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    tx = torch.from_numpy(x)

    def ln(v, name):
        return F.layer_norm(
            v, (C,), torch.from_numpy(np.asarray(p[name]["scale"])),
            torch.from_numpy(np.asarray(p[name]["bias"])), eps=1e-5,
        )

    def lin(v, name, sub):
        wgt = torch.from_numpy(np.asarray(p[name][sub]["kernel"])).T
        b = p[name][sub].get("bias")
        return F.linear(v, wgt, torch.from_numpy(np.asarray(b)) if b is not None else None)

    # window attention (H, W divisible by win; no shift -> no mask)
    v = ln(tx, "norm1")
    nwh, nww = H // win, W // win
    vw = v.view(1, nwh, win, nww, win, C).permute(0, 1, 3, 2, 4, 5)
    vw = vw.reshape(nwh * nww, win * win, C)
    qkv = lin(vw, "attn", "qkv").reshape(-1, win * win, 3, heads, C // heads)
    q, k, val = qkv.permute(2, 0, 3, 1, 4)
    attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
    bias_table = torch.from_numpy(np.asarray(p["attn"]["relative_position_bias_table"]))
    idx = torch.from_numpy(_relative_position_index(win).reshape(-1))
    rel = bias_table[idx].reshape(win * win, win * win, heads).permute(2, 0, 1)
    attn = F.softmax(attn + rel[None], dim=-1)
    out = (attn @ val).transpose(1, 2).reshape(-1, win * win, C)
    out = lin(out, "attn", "proj")
    out = out.reshape(1, nwh, nww, win, win, C).permute(0, 1, 3, 2, 4, 5).reshape(1, H, W, C)
    tref = tx + out
    m = ln(tref, "norm2")
    m = F.linear(m, torch.from_numpy(np.asarray(p["mlp_fc1"]["kernel"])).T,
                 torch.from_numpy(np.asarray(p["mlp_fc1"]["bias"])))
    m = F.gelu(m)
    m = F.linear(m, torch.from_numpy(np.asarray(p["mlp_fc2"]["kernel"])).T,
                 torch.from_numpy(np.asarray(p["mlp_fc2"]["bias"])))
    tref = tref + m

    ours = blk.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), tref.detach().numpy(),
                               rtol=5e-4, atol=5e-4)


def test_swin_block_shifted_single_window_matches_torch(rng):
    """Shifted SwinBlock when the padded feature map equals ONE window —
    the reference (mask2former swin.py:174-298) still rolls and applies the
    region mask; disabling shift there diverges for converted checkpoints
    (ADVICE round 1). Torch oracle builds its own region mask."""
    from bm2f_tpu.models.swin import SwinBlock, _relative_position_index

    C, heads, win, shift = 32, 4, 7, 3
    H = W = win  # single-window feature map
    x = rng.randn(1, H, W, C).astype(np.float32)

    blk = SwinBlock(dim=C, num_heads=heads, window=win, shift=shift,
                    mlp_ratio=2.0, qkv_bias=True, qk_scale=None, drop_path=0.0)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    tx = torch.from_numpy(x)

    def ln(v, name):
        return F.layer_norm(
            v, (C,), torch.from_numpy(np.asarray(p[name]["scale"])),
            torch.from_numpy(np.asarray(p[name]["bias"])), eps=1e-5,
        )

    def lin(v, name, sub):
        wgt = torch.from_numpy(np.asarray(p[name][sub]["kernel"])).T
        b = p[name][sub].get("bias")
        return F.linear(v, wgt, torch.from_numpy(np.asarray(b)) if b is not None else None)

    # region mask exactly as reference swin.py builds it per forward
    img_mask = torch.zeros(1, H, W, 1)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mask_windows = img_mask.view(1, 1, win, 1, win, 1).permute(0, 1, 3, 2, 4, 5)
    mask_windows = mask_windows.reshape(-1, win * win)
    attn_mask = mask_windows.unsqueeze(1) - mask_windows.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)

    v = ln(tx, "norm1")
    v = torch.roll(v, (-shift, -shift), dims=(1, 2))
    vw = v.reshape(1, win * win, C)
    qkv = lin(vw, "attn", "qkv").reshape(-1, win * win, 3, heads, C // heads)
    q, k, val = qkv.permute(2, 0, 3, 1, 4)
    attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
    bias_table = torch.from_numpy(np.asarray(p["attn"]["relative_position_bias_table"]))
    idx = torch.from_numpy(_relative_position_index(win).reshape(-1))
    rel = bias_table[idx].reshape(win * win, win * win, heads).permute(2, 0, 1)
    attn = F.softmax(attn + rel[None] + attn_mask[:, None], dim=-1)
    out = (attn @ val).transpose(1, 2).reshape(1, win, win, C)
    out = lin(out, "attn", "proj")
    out = torch.roll(out, (shift, shift), dims=(1, 2))
    tref = tx + out
    m = ln(tref, "norm2")
    m = F.linear(m, torch.from_numpy(np.asarray(p["mlp_fc1"]["kernel"])).T,
                 torch.from_numpy(np.asarray(p["mlp_fc1"]["bias"])))
    m = F.gelu(m)
    m = F.linear(m, torch.from_numpy(np.asarray(p["mlp_fc2"]["kernel"])).T,
                 torch.from_numpy(np.asarray(p["mlp_fc2"]["bias"])))
    tref = tref + m

    ours = blk.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), tref.detach().numpy(),
                               rtol=5e-4, atol=5e-4)


def test_cross_attention_layer_matches_torch(rng):
    """Post-norm CrossAttentionLayer (reference:
    mask2former_transformer_decoder.py:75-135): attn(q+qpos, k+pos, v) ->
    residual -> LayerNorm, with a boolean attention mask."""
    from bm2f_tpu.models.transformer_decoder import CrossAttentionLayer

    B, Q, N, C, H = 2, 6, 20, 32, 4
    tgt = rng.randn(B, Q, C).astype(np.float32)
    mem = rng.randn(B, N, C).astype(np.float32)
    pos = rng.randn(1, N, C).astype(np.float32)
    qpos = rng.randn(B, Q, C).astype(np.float32)
    blocked = rng.rand(B, H, Q, N) > 0.7
    blocked[..., 0] = False

    layer = CrossAttentionLayer(C, H, pre_norm=False)
    bias = jnp.where(jnp.asarray(blocked), -1e9, 0.0)
    variables = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(mem), bias,
        jnp.asarray(pos), jnp.asarray(qpos),
    )
    ours = layer.apply(
        variables, jnp.asarray(tgt), jnp.asarray(mem), bias,
        jnp.asarray(pos), jnp.asarray(qpos),
    )

    p = variables["params"]
    tm = nn.MultiheadAttention(C, H, batch_first=True)
    with torch.no_grad():
        tm.in_proj_weight.copy_(torch.from_numpy(np.asarray(p["multihead_attn"]["in_proj_weight"])).T)
        tm.in_proj_bias.copy_(torch.from_numpy(np.asarray(p["multihead_attn"]["in_proj_bias"])))
        tm.out_proj.weight.copy_(torch.from_numpy(np.asarray(p["multihead_attn"]["out_proj"]["kernel"])).T)
        tm.out_proj.bias.copy_(torch.from_numpy(np.asarray(p["multihead_attn"]["out_proj"]["bias"])))
        t2, _ = tm(
            torch.from_numpy(tgt + qpos),
            torch.from_numpy(mem + pos),
            torch.from_numpy(mem),
            attn_mask=torch.from_numpy(blocked.reshape(B * H, Q, N)),
        )
        ref = F.layer_norm(
            torch.from_numpy(tgt) + t2, (C,),
            torch.from_numpy(np.asarray(p["norm"]["scale"])),
            torch.from_numpy(np.asarray(p["norm"]["bias"])), eps=1e-5,
        )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=5e-4, atol=5e-4)
