"""Tensor-parallel sharding rules (parallel/tp.py): the DP x TP hybrid mesh
must compute exactly the same training math as pure DP — GSPMD guarantees
semantics for any sharding, so a loss mismatch would mean the rules broke
the step wiring (wrong in/out specs, bad donation), not the math.

TPU analogue of multi-node tests without a cluster (SURVEY.md §4): runs on
the 8-virtual-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from bm2f_tpu.config import get_config
from bm2f_tpu.parallel.mesh import create_mesh, shard_batch
from bm2f_tpu.parallel.tp import count_sharded, partition_spec, state_shardings
from bm2f_tpu.train.trainer import Trainer

TINY = {
    "model.loss.train_num_points": 64,
    "model.backbone.resnet.depth": 14,
    "model.pixel_decoder.conv_dim": 64,
    "model.pixel_decoder.mask_dim": 64,
    "model.pixel_decoder.transformer_enc_layers": 1,
    "model.pixel_decoder.transformer_nheads": 4,
    "model.pixel_decoder.transformer_dim_feedforward": 128,
    "model.decoder.hidden_dim": 64,
    "model.decoder.mask_dim": 64,
    "model.decoder.num_queries": 8,
    "model.decoder.nheads": 4,
    "model.decoder.dim_feedforward": 128,
    "model.decoder.dec_layers": 3,
    "train.matcher": "jv",
}


def _batch(B, H=64, W=64, G=3):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, H, W) > 0.8).astype(np.float32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }


def _run_steps(data, model, n_steps=2, B=2):
    cfg = get_config("coco_instance_r50", {
        **TINY, "mesh.data": data, "mesh.model": model,
        "train.ims_per_batch": B,
    })
    trainer = Trainer(cfg)
    trainer.mesh = create_mesh(data, model, devices=jax.devices()[: data * model])
    batch = _batch(B)
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    step_fn = trainer.compile_step(state)
    losses = []
    with trainer.mesh:
        batch = shard_batch(batch, trainer.mesh)
        state = trainer.shard_state(state)
        for _ in range(n_steps):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["total_loss"]))
    return losses, state


def test_rules_shard_the_wide_params_and_their_moments():
    cfg = get_config("coco_instance_r50", {**TINY, "mesh.data": 2,
                                           "mesh.model": 2,
                                           "train.ims_per_batch": 2})
    trainer = Trainer(cfg)
    trainer.mesh = create_mesh(2, 2, devices=jax.devices()[:4])
    batch = _batch(2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    sh = state_shardings(state, trainer.mesh)

    flat = {
        "/".join(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
                 for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    # FFN up-projection kernel: column-sharded in params AND Adam mu —
    # 2D kernels as P(None, 'model'), scan-stacked 3D ones (the encoder
    # scan's (L, in, out)) as P(None, None, 'model')
    lin1 = [k for k in flat if k.endswith("linear1/kernel")]
    assert lin1, sorted(flat)[:10]
    for k in lin1:
        assert flat[k].spec in (P(None, "model"), P(None, None, "model")), (
            k, flat[k].spec)
    assert any(flat[k].spec == P(None, None, "model") for k in lin1), (
        "expected at least one scan-stacked encoder linear1")
    mu1 = [k for k in flat if "mu/" in k and k.endswith("linear1/kernel")]
    assert mu1 and all(
        flat[k].spec in (P(None, "model"), P(None, None, "model"))
        for k in mu1
    )
    # down-projection row-sharded; its bias replicated
    lin2 = [k for k in flat if k.endswith("linear2/kernel")]
    assert lin2 and all(
        flat[k].spec in (P("model", None), P(None, "model", None))
        for k in lin2
    )
    b2 = [k for k in flat if k.endswith("linear2/bias")]
    assert b2 and all(flat[k].spec == P() for k in b2)
    # packed attention qkv
    qkv = [k for k in flat if k.endswith("in_proj_weight")]
    assert qkv and all(
        flat[k].spec in (P(None, "model"), P(None, None, "model"))
        for k in qkv
    )
    # convs / norms stay replicated
    conv = [k for k in flat if "conv" in k and k.endswith("kernel")]
    assert conv and all(flat[k].spec == P() for k in conv)

    n, sb, tb = count_sharded(state, trainer.mesh)
    assert n > 20 and 0 < sb < tb


def test_rule_skips_indivisible_dims():
    leaf = jnp.zeros((64, 129))  # 129 % 2 != 0 -> stays replicated
    path = (jax.tree_util.DictKey("linear1"), jax.tree_util.DictKey("kernel"))
    assert partition_spec(path, leaf, 2) == P()
    leaf = jnp.zeros((64, 128))
    assert partition_spec(path, leaf, 2) == P(None, "model")
    # trivial model axis: everything replicated
    assert partition_spec(path, leaf, 1) == P()


def test_tp_actually_reduces_per_device_bytes():
    """The TP rules must buy real per-device memory: on a data=2 x model=2
    mesh the state (params + Adam moments) measured from actual shard
    shapes on one device must be smaller than the replicated total by
    exactly half of the model-sharded bytes (VERDICT r4 item 4: the memory
    claim must be measured, not asserted)."""
    cfg = get_config("coco_instance_r50", {**TINY, "mesh.data": 2,
                                           "mesh.model": 2,
                                           "train.ims_per_batch": 2})
    trainer = Trainer(cfg)
    trainer.mesh = create_mesh(2, 2, devices=jax.devices()[:4])
    batch = _batch(2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"][:1])
    with trainer.mesh:
        state = trainer.shard_state(state)
    dev0 = trainer.mesh.devices.flat[0]
    per_dev = 0
    repl_total = 0
    for leaf in jax.tree.leaves(state):
        if not hasattr(leaf, "addressable_shards"):
            continue
        repl_total += leaf.nbytes
        for sh in leaf.addressable_shards:
            if sh.device == dev0:
                per_dev += sh.data.nbytes
    n_rules, sharded_bytes, _ = count_sharded(state, trainer.mesh)
    assert n_rules > 0 and sharded_bytes > 0
    # per-device = replicated total - half of every model-sharded tensor
    assert per_dev == repl_total - sharded_bytes // 2, (
        per_dev, repl_total, sharded_bytes)


@pytest.mark.slow
def test_dp_tp_losses_match_pure_dp():
    """mesh (data=2, model=2) must produce the same per-step losses as
    (data=2, model=1): identical init (same seed), identical global batch.
    f32 CPU; collectives only reorder reductions, so agreement is tight."""
    losses_dp, _ = _run_steps(data=2, model=1)
    losses_tp, state_tp = _run_steps(data=2, model=2)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-4, atol=2e-4)
    # the TP run's wide params really live sharded on device
    flat = jax.tree_util.tree_flatten_with_path(state_tp.params)[0]
    sharded = [
        leaf for path, leaf in flat
        if "/".join(str(getattr(k, "key", k)) for k in path).endswith(
            "linear1/kernel")
    ]
    assert sharded and all(
        x.sharding.spec in (P(None, "model"), P(None, None, "model"))
        for x in sharded
    ), [x.sharding for x in sharded]
