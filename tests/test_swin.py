"""Swin backbone tests: shapes, shifted-window mask correctness, drop-path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.models.swin import (
    SwinTransformer,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 14, 28, 8).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 4, 49, 8)
    back = window_reverse(w, 7, 2, 14, 28)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = _relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
    # symmetric pairs map to mirrored offsets; diagonal is the center entry
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks_cross_region():
    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    # first window (interior) has no masking
    assert (m[0] == 0).all()
    # wrap-around windows must mask something
    assert (m[-1] < 0).any()


@pytest.mark.slow
def test_swin_shapes_and_strides(rng):
    m = SwinTransformer(embed_dim=48, depths=(2, 2, 2, 2), num_heads=(2, 4, 8, 16))
    x = jnp.zeros((1, 96, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out["res2"].shape == (1, 24, 32, 48)
    assert out["res3"].shape == (1, 12, 16, 96)
    assert out["res4"].shape == (1, 6, 8, 192)
    assert out["res5"].shape == (1, 3, 4, 384)


@pytest.mark.slow
def test_swin_droppath_changes_output(rng):
    m = SwinTransformer(
        embed_dim=48, depths=(2, 2), num_heads=(2, 4), drop_path_rate=0.5,
        out_features=("res2", "res3"),
    )
    x = jnp.asarray(rng.randn(4, 56, 56, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    eval_out = m.apply(v, x)["res3"]
    train_out = m.apply(v, x, False, rngs={"dropout": jax.random.PRNGKey(7)})["res3"]
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))


def test_shift_attn_mask_device_matches_numpy():
    """The on-device iota shift mask (used in the traced path so Swin-L HLO
    does not embed ~MBs of mask constants per block) must equal the numpy
    construction bit-for-bit."""
    from bm2f_tpu.models.swin import _shift_attn_mask, _shift_attn_mask_device

    for (hp, wp, w, s) in [(24, 36, 12, 6), (14, 21, 7, 3), (12, 12, 12, 6)]:
        a = _shift_attn_mask(hp, wp, w, s)
        b = np.asarray(_shift_attn_mask_device(hp, wp, w, s))
        np.testing.assert_array_equal(a, b)
