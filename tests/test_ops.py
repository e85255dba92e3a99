"""Parity tests for core ops against PyTorch (CPU) as the numerical oracle —
mirrors the reference's only unit test (ops/test.py: CUDA-vs-PyTorch forward
equality + gradcheck)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bm2f_tpu.ops import (
    grid_sample,
    ms_deform_attn,
    point_sample,
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 8), (16, 16)), ((13, 9), (32, 40)), ((32, 48), (7, 11)), ((5, 5), (5, 5))],
)
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw,
        mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((32, 48), (7, 11))])
def test_resize_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = resize_nearest(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest"
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-6, atol=1e-6)


def test_grid_sample_matches_torch(rng):
    B, H, W, C, N = 2, 9, 13, 4, 57
    x = rng.randn(B, H, W, C).astype(np.float32)
    # include out-of-range points to exercise zero padding
    grid = (rng.rand(B, N, 2).astype(np.float32) * 2.6 - 1.3)
    ours = grid_sample(jnp.asarray(x), jnp.asarray(grid))
    theirs = F.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(grid).view(B, N, 1, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    )  # (B, C, N, 1)
    theirs = theirs[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_point_sample_is_grid_sample_01(rng):
    B, H, W, C, N = 1, 8, 8, 2, 16
    x = rng.randn(B, H, W, C).astype(np.float32)
    coords = rng.rand(B, N, 2).astype(np.float32)
    a = point_sample(jnp.asarray(x), jnp.asarray(coords))
    b = grid_sample(jnp.asarray(x), jnp.asarray(coords) * 2 - 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_point_sample_packed_is_exact(rng):
    """The corner-packed one-gather-per-point sampler must be BITWISE equal
    to point_sample (values and grads), including the tricky border cases:
    points within half a pixel of the top/left edge have bilinear base
    (y0, x0) = -1 while their +1 corners are in range."""
    from bm2f_tpu.ops.sampling import build_corner_table, point_sample_packed

    B, H, W, C, N = 3, 17, 23, 5, 400
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    coords = rng.rand(B, N, 2).astype(np.float32)
    coords[:, :40] *= 0.01  # top-left border (base = -1 cases)
    coords[:, 40:80] = 1.0 - coords[:, 40:80] * 0.01  # bottom-right border
    coords[:, 80] = [0.0, 0.0]
    coords[:, 81] = [1.0, 1.0]
    coords[:, 82] = [0.0, 1.0]
    coords[:, 83] = [1.0, 0.0]
    coords = jnp.asarray(coords)

    a = point_sample(x, coords)
    b = point_sample_packed(x, coords)
    assert bool(jnp.all(a == b)), float(jnp.max(jnp.abs(a - b)))

    # prebuilt-table path
    c = point_sample_packed(x, coords, table=build_corner_table(x))
    assert bool(jnp.all(a == c))

    # gradient parity through a nonlinearity
    g1 = jax.grad(lambda im: jnp.sum(jnp.sin(point_sample(im, coords) * 3)))(x)
    g2 = jax.grad(
        lambda im: jnp.sum(jnp.sin(point_sample_packed(im, coords) * 3))
    )(x)
    assert bool(jnp.all(g1 == g2)), float(jnp.max(jnp.abs(g1 - g2)))

    # out-of-range points (grid beyond [-1, 1]) zero out identically
    oor = jnp.asarray(rng.rand(B, 64, 2).astype(np.float32) * 1.4 - 0.2)
    assert bool(jnp.all(point_sample(x, oor) == point_sample_packed(x, oor)))


def _torch_ms_deform_attn(value, spatial_shapes, loc, attn):
    """Independent torch implementation of multi-scale deformable attention
    (standard Deformable-DETR math) used as oracle."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    out = torch.zeros(B, Q, M, D, dtype=value.dtype)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]  # (B, HW, M, D)
        start += H * W
        v = v.permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = loc[:, :, :, lid] * 2 - 1  # (B, Q, M, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Q, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        s = s.reshape(B, M, D, Q, P)
        w = attn[:, :, :, lid].permute(0, 2, 1, 3)[:, :, None]  # (B, M, 1, Q, P)
        out += (s * w).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(B, Q, M * D)


@pytest.mark.parametrize("impl", ["xla"])
def test_ms_deform_attn_matches_torch(rng, impl):
    B, M, D, P = 2, 4, 8, 4
    shapes = ((12, 16), (6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    Q = 33
    L = len(shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = rng.rand(B, Q, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
    attn = rng.rand(B, Q, M, L, P).astype(np.float32)
    attn = attn / attn.sum(axis=(-1, -2), keepdims=True)

    ours = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn), impl=impl
    )
    theirs = _torch_ms_deform_attn(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(attn)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_grads_match_torch(rng):
    B, M, D, P = 1, 2, 4, 2
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    Q, L = 7, len(shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = (rng.rand(B, Q, M, L, P, 2) * 0.8 + 0.1).astype(np.float32)
    attn = rng.rand(B, Q, M, L, P).astype(np.float32)
    attn = attn / attn.sum(axis=(-1, -2), keepdims=True)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = _torch_ms_deform_attn(tv, shapes, tl, ta)
    (out**2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_pallas_interpret_matches(rng):
    from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    B, M, D, P = 1, 2, 32, 4
    shapes = ((8, 8), (4, 4))
    S = sum(h * w for h, w in shapes)
    Q, L = 20, 2
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Q, M, L, P, 2) * 1.2 - 0.1).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, M, L, P) / 8).astype(np.float32))
    a = ms_deform_attn(value, shapes, loc, attn, impl="xla")
    b = ms_deform_attn_pallas(value, shapes, loc, attn, q_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ms_deform_attn_pallas_grads_match(rng):
    """Custom-VJP kernels (d_patches scatter + d_w4 re-gather) against XLA
    autodiff of the im2col path, all three grads."""
    from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    B, M, D, P = 2, 2, 32, 3
    shapes = ((6, 7), (3, 4))
    S = sum(h * w for h, w in shapes)
    Q, L = 29, 2
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Q, M, L, P, 2) * 1.4 - 0.2).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, M, L, P) / 6).astype(np.float32))

    def loss_ref(v, l, a):
        o = ms_deform_attn(v, shapes, l, a, impl="im2col")
        return jnp.sum(jnp.sin(o * 0.3))

    def loss_pal(v, l, a):
        o = ms_deform_attn_pallas(v, shapes, l, a, q_tile=8, interpret=True)
        return jnp.sum(jnp.sin(o * 0.3))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(value, loc, attn)
    for a_, b_ in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["patch", "im2col"])
def test_ms_deform_attn_impl_parity(rng, impl):
    B, M, D, P = 2, 4, 8, 4
    shapes = ((12, 16), (6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    Q, L = 33, 3
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Q, M, L, P, 2) * 1.4 - 0.2).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, M, L, P) / 12).astype(np.float32))
    a = ms_deform_attn(value, shapes, loc, attn, impl="xla")
    b = ms_deform_attn(value, shapes, loc, attn, impl=impl)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_ms_deform_attn_pallas_head_major_parity(rng):
    """head_major value layout (B, M, S, D) gives identical outputs."""
    from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    B, M, D, P = 2, 2, 32, 3
    shapes = ((6, 7), (3, 4))
    S = sum(h * w for h, w in shapes)
    Q, L = 29, 2
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Q, M, L, P, 2) * 1.2 - 0.1).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, M, L, P) / 6).astype(np.float32))
    a = ms_deform_attn_pallas(value, shapes, loc, attn, q_tile=8, interpret=True)
    b = ms_deform_attn_pallas(value.transpose(0, 2, 1, 3), shapes, loc, attn,
                              q_tile=8, interpret=True, head_major=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_ms_deform_attn_pallas_q_minor_out_head_major_parity(rng):
    """Round-3 prep-fusion flags: Q-minor loc/attn inputs + head-major
    output must match the standard-layout call exactly."""
    from bm2f_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    B, M, D, P = 2, 2, 32, 4
    shapes = ((8, 8), (4, 4))
    S = sum(h * w for h, w in shapes)
    Q, L = 20, 2
    value = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, Q, M, L, P, 2) * 1.2 - 0.1).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, M, L, P) / 8).astype(np.float32))

    ref = ms_deform_attn_pallas(value, shapes, loc, attn, q_tile=8,
                                interpret=True)
    got = ms_deform_attn_pallas(
        value.transpose(0, 2, 1, 3), shapes,
        loc.transpose(0, 2, 3, 4, 5, 1), attn.transpose(0, 2, 3, 4, 1),
        q_tile=8, interpret=True,
        head_major=True, q_minor=True, out_head_major=True,
    )  # (B, M, Q, D)
    got = np.asarray(got).transpose(0, 2, 1, 3).reshape(B, Q, M * D)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_msdeform_module_pallas_path_matches_im2col(rng):
    """MSDeformAttnModule's fused pallas branch (_QMinorProj projections +
    head-major output proj) == the nn.Dense im2col branch with the SAME
    param tree (converter/checkpoint compatibility depends on it)."""
    import jax

    from bm2f_tpu.models.pixel_decoder import (
        MSDeformAttnModule, encoder_reference_points,
    )

    B, C, M, L, P = 2, 64, 4, 2, 4
    shapes = ((8, 8), (4, 4))
    S = sum(h * w for h, w in shapes)
    query = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    src = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    refs = encoder_reference_points(shapes)

    mod_i = MSDeformAttnModule(C, L, M, P, impl="im2col")
    mod_p = MSDeformAttnModule(C, L, M, P, impl="pallas")
    vars_p = mod_p.init(jax.random.PRNGKey(0), query, refs, src, shapes)
    vars_i = mod_i.init(jax.random.PRNGKey(0), query, refs, src, shapes)
    # identical param trees (names AND shapes)
    ti = jax.tree_util.tree_structure(vars_i)
    tp = jax.tree_util.tree_structure(vars_p)
    assert ti == tp, (ti, tp)
    # random (not zero-init) weights so the comparison is non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(vars_i)
    leaves = [jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 0.05)
              for l in leaves]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    out_i = mod_i.apply(variables, query, refs, src, shapes)
    out_p = mod_p.apply(variables, query, refs, src, shapes)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_i),
                               rtol=2e-4, atol=2e-5)
