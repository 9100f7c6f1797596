"""Converter tests: diffusers/transformers state-dict naming -> our pytrees.

Builds synthetic state dicts in the exact HF naming/shape conventions for a
tiny config and checks the converted tree matches our init()'s structure and
shapes leaf-for-leaf — the property that makes real-snapshot loading a
mechanical rename (models/convert.py).
"""

import numpy as np
import pytest

import jax

from sduss_tpu.models import convert
from sduss_tpu.models.unet import TINY_SDXL_UNET, TINY_UNET, UNet2DConditionModel


def tree_specs(tree):
    import jax.tree_util as jtu

    flat = jtu.tree_flatten_with_path(tree)[0]
    return {jtu.keystr(k): tuple(np.shape(v)) for k, v in flat}


def synth_unet_sd(params, use_linear):
    """Invert our pytree into diffusers' UNet naming (tiny configs)."""
    sd = {}

    def lin(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"])

    def conv(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"])

    def norm(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def resnet(prefix, p):
        norm(prefix + ".norm1", p["norm1"])
        conv(prefix + ".conv1", p["conv1"])
        lin(prefix + ".time_emb_proj", p["time_emb_proj"])
        norm(prefix + ".norm2", p["norm2"])
        conv(prefix + ".conv2", p["conv2"])
        if "conv_shortcut" in p:
            conv(prefix + ".conv_shortcut", p["conv_shortcut"])

    def attn(prefix, p):
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.{n}", p[n])
        lin(prefix + ".to_out.0", p["to_out"])

    def tblock(prefix, p):
        norm(prefix + ".norm1", p["norm1"])
        attn(prefix + ".attn1", p["attn1"])
        norm(prefix + ".norm2", p["norm2"])
        attn(prefix + ".attn2", p["attn2"])
        norm(prefix + ".norm3", p["norm3"])
        lin(prefix + ".ff.net.0.proj", p["ff_geglu"])
        lin(prefix + ".ff.net.2", p["ff_out"])

    def transformer(prefix, p):
        norm(prefix + ".norm", p["norm"])
        proj = lin if use_linear else conv
        proj(prefix + ".proj_in", p["proj_in"])
        proj(prefix + ".proj_out", p["proj_out"])
        for i, blk in enumerate(p["blocks"]):
            tblock(f"{prefix}.transformer_blocks.{i}", blk)

    conv("conv_in", params["conv_in"])
    lin("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    lin("time_embedding.linear_2", params["time_embedding"]["linear_2"])
    if "add_embedding" in params:
        lin("add_embedding.linear_1", params["add_embedding"]["linear_1"])
        lin("add_embedding.linear_2", params["add_embedding"]["linear_2"])
    for i, blk in enumerate(params["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            resnet(f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            transformer(f"down_blocks.{i}.attentions.{j}", a)
        if "downsample" in blk:
            conv(f"down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    resnet("mid_block.resnets.0", params["mid_block"]["resnets"][0])
    resnet("mid_block.resnets.1", params["mid_block"]["resnets"][1])
    transformer("mid_block.attentions.0", params["mid_block"]["attentions"][0])
    for i, blk in enumerate(params["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            resnet(f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attentions"]):
            transformer(f"up_blocks.{i}.attentions.{j}", a)
        if "upsample" in blk:
            conv(f"up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    norm("conv_norm_out", params["conv_norm_out"])
    conv("conv_out", params["conv_out"])
    return sd


@pytest.mark.parametrize("cfg,use_linear", [(TINY_UNET, False),
                                            (TINY_SDXL_UNET, True)])
def test_convert_unet_roundtrip_structure(cfg, use_linear):
    model = UNet2DConditionModel(cfg)
    params = model.init(jax.random.key(0))
    sd = synth_unet_sd(params, use_linear)
    back = convert.convert_unet(sd, use_linear)
    assert tree_specs(back) == tree_specs(params)
    # spot-check a value survives the transpose round trip
    np.testing.assert_allclose(
        np.asarray(back["conv_in"]["kernel"]),
        np.asarray(params["conv_in"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["down_blocks"][0]["resnets"][0]["time_emb_proj"]["kernel"]),
        np.asarray(params["down_blocks"][0]["resnets"][0]["time_emb_proj"]["kernel"]),
        atol=1e-6)


def test_convert_unet_loads_into_model():
    model = UNet2DConditionModel(TINY_UNET)
    params = model.init(jax.random.key(0))
    sd = synth_unet_sd(params, False)
    back = convert.convert_unet(sd, False)
    import jax.numpy as jnp

    x = jnp.ones((1, 16, 16, 4))
    ehs = jnp.ones((1, 7, 32))
    a = model.apply(params, x, jnp.asarray([5.0]), ehs)
    b = model.apply(back, x, jnp.asarray([5.0]), ehs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
