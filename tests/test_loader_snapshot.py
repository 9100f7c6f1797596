"""Loader smoke over a synthetic HF snapshot directory.

Builds a real on-disk snapshot (model_index.json + per-component
safetensors in HF naming, tiny configs) and checks load_bundle() produces
numerically identical params to the source — the mechanics the reference's
model_loader exercises against real snapshots
(/root/reference/sduss/model_executor/model_loader.py:58-120).
"""

import json
import os

import jax
import numpy as np
import pytest

from test_convert import synth_unet_sd
from test_convert_fullsize import synth_clip_sd, synth_mmdit_sd, synth_t5_sd, synth_vae_sd

from sduss_tpu.models.loader import load_bundle
from sduss_tpu.models.registry import get_bundle

st_numpy = pytest.importorskip("safetensors.numpy")


def _write_component(snapdir, name, sd):
    d = os.path.join(snapdir, name)
    os.makedirs(d, exist_ok=True)
    st_numpy.save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
                        for k, v in sd.items()},
                       os.path.join(d, "diffusion_pytorch_model.safetensors"))


def _leaf_allclose(a, b):
    fa = jax.tree.leaves(a)
    fb = jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=1e-6)


@pytest.mark.parametrize("family,class_name", [
    ("sd15", "StableDiffusionPipeline"),
    ("sd3", "StableDiffusion3Pipeline"),
])
def test_load_bundle_from_synthetic_snapshot(tmp_path, family, class_name):
    src = get_bundle(family, tiny=True)
    src.init_random(seed=0)

    snap = str(tmp_path / "snapshot")
    os.makedirs(snap, exist_ok=True)
    with open(os.path.join(snap, "model_index.json"), "w") as f:
        json.dump({"_class_name": class_name}, f)

    for name, params in src.params.items():
        if name == "unet":
            sd = synth_unet_sd(params, src.models["unet"].cfg.use_linear_projection)
        elif name == "transformer":
            sd = synth_mmdit_sd(params)
        elif name == "vae":
            sd = synth_vae_sd(params)
        elif name == "text_encoder_3":
            sd = synth_t5_sd(params)
        elif name.startswith("text_encoder"):
            sd = synth_clip_sd(params)
        else:
            raise AssertionError(name)
        _write_component(snap, name, sd)

    bundle = load_bundle(family, snapshot=snap, tiny=True)
    assert set(bundle.params) == set(src.params)
    for name in src.params:
        _leaf_allclose(bundle.params[name], src.params[name])


def test_load_bundle_without_snapshot_random():
    bundle = load_bundle("sd15", snapshot=None, tiny=True, seed=3)
    assert "unet" in bundle.params
    ids = bundle.tokenizers["tokenizer"](["hello world"])
    assert ids["input_ids"].shape == (1, 77)
