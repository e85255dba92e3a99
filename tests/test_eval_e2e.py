"""End-to-end eval smoke test: synthetic COCO dataset -> run_eval -> AP keys.
Uses a tiny model; mainly validates the eval wiring (device topk + host
resize/rescoring + evaluator)."""

import numpy as np
import pytest

import jax

from bm2f_tpu.config import get_config
from bm2f_tpu.data.catalog import DatasetCatalog


@pytest.mark.slow
def test_run_eval_synthetic():
    from eval import run_eval
    from bm2f_tpu.models import build_model
    from bm2f_tpu.models.maskformer import normalize_images
    from tests.test_data import _synthetic_instance_dicts

    name = "bm2f_eval_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: _synthetic_instance_dicts(3, h=96, w=128))

    cfg = get_config("coco_instance_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
    })
    model = build_model(cfg)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), normalize_images(jnp.zeros((1, 64, 64, 3)), cfg.model)
    )
    res = run_eval(cfg, model, variables, name, short_edge=96, max_size=160,
                   bucket=160)
    assert "AP" in res and np.isfinite(res["AP"])


@pytest.mark.slow
def test_run_video_eval_synthetic():
    from eval_video import run_video_eval
    from bm2f_tpu.models.maskformer import normalize_images
    from bm2f_tpu.video import build_video_model
    from tests.test_ytvis import _synthetic_video_dicts
    import jax.numpy as jnp

    name = "bm2f_video_eval_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)

    # loader must read real files; synthesize tiny frames on disk
    import os, tempfile
    from PIL import Image

    tmp = tempfile.mkdtemp()
    dicts = _synthetic_video_dicts(2, length=3, h=48, w=64)
    for dd in dicts:
        vdir = os.path.join(tmp, str(dd["video_id"]))
        os.makedirs(vdir, exist_ok=True)
        files = []
        for fi in range(dd["length"]):
            p = os.path.join(vdir, f"{fi}.jpg")
            Image.fromarray(dd["images"][fi]).save(p)
            files.append(p)
        dd["file_names"] = files
        dd.pop("images")
    DatasetCatalog.register(name, lambda: dicts)

    cfg = get_config("ytvis2019_video_r50", {
        "model.decoder.dec_layers": 1,
        "model.decoder.num_queries": 8,
        "model.pixel_decoder.transformer_enc_layers": 1,
        "model.num_classes": 5,
        "model.num_frames": 3,
    })
    model = build_video_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        normalize_images(jnp.zeros((1, 3, 64, 64, 3)), cfg.model),
    )
    res = run_video_eval(cfg, model, variables, name, short_edge=48,
                         bucket=64, max_frames=3)
    assert "AP" in res and np.isfinite(res["AP"])
