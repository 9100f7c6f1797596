"""Full-size converter coverage (round-1 verdict item 6).

Synthetic state dicts in the exact HF naming conventions at the REAL
deployment configurations (SD-1.5/SDXL UNet, SD3.5-medium MMDiT incl. qk
norms + dual-attention layers, SD/SDXL/SD3 VAEs, CLIP-L/G, T5-XXL) must
round-trip through models/convert.py into exactly the structure
``model.init()`` produces, with numeric spot-checks that values survive the
rename/transpose.  Catches layer-count / optional-submodule / naming-quirk
slips that the tiny-config tests (test_convert.py) cannot see.

Param structures come from ``jax.eval_shape`` (no RNG work) and leaves are
int8 zeros (the converters are dtype-agnostic renames/transposes), so
the multi-GB full-size trees stay cheap to build.
"""

import gc

import jax
import numpy as np
import pytest

from test_convert import synth_unet_sd, tree_specs

from sduss_tpu.models import convert
from sduss_tpu.models.clip import CLIP_G, CLIP_L, CLIP_L_PROJ, CLIPTextModel
from sduss_tpu.models.mmdit import SD35_MEDIUM, SD3Transformer2DModel
from sduss_tpu.models.t5 import T5_XXL, T5EncoderModel
from sduss_tpu.models.unet import SD15_UNET, SDXL_UNET, UNet2DConditionModel
from sduss_tpu.models.vae import SD3_VAE, SD15_VAE, SDXL_VAE, AutoencoderKL


pytestmark = pytest.mark.slow  # full-size shapes / long engine loops

def zeros_params(model):
    """Structure-faithful param tree with cheap int8-zero leaves."""
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0)))
    return jax.tree.map(lambda s: np.zeros(s.shape, np.int8), shapes)


def _lin(sd, prefix, p):
    sd[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _conv(sd, prefix, p):
    sd[prefix + ".weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _norm(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


# -- inverse synths (our pytree -> HF naming) --------------------------------


def synth_clip_sd(params):
    sd = {}
    pre = "text_model."
    sd[pre + "embeddings.token_embedding.weight"] = np.asarray(params["token_embedding"])
    sd[pre + "embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"])
    _norm(sd, pre + "final_layer_norm", params["final_layer_norm"])
    for i, lyr in enumerate(params["layers"]):
        lp = f"{pre}encoder.layers.{i}."
        _norm(sd, lp + "layer_norm1", lyr["ln1"])
        _norm(sd, lp + "layer_norm2", lyr["ln2"])
        _lin(sd, lp + "self_attn.q_proj", lyr["q"])
        _lin(sd, lp + "self_attn.k_proj", lyr["k"])
        _lin(sd, lp + "self_attn.v_proj", lyr["v"])
        _lin(sd, lp + "self_attn.out_proj", lyr["out"])
        _lin(sd, lp + "mlp.fc1", lyr["fc1"])
        _lin(sd, lp + "mlp.fc2", lyr["fc2"])
    if "text_projection" in params:
        _lin(sd, "text_projection", params["text_projection"])
    return sd


def synth_t5_sd(params):
    sd = {
        "shared.weight": np.asarray(params["token_embedding"]),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
            np.asarray(params["relative_attention_bias"]),
        "encoder.final_layer_norm.weight":
            np.asarray(params["final_layer_norm"]["scale"]),
    }
    for i, lyr in enumerate(params["layers"]):
        b = f"encoder.block.{i}.layer."
        sd[b + "0.layer_norm.weight"] = np.asarray(lyr["ln_attn"]["scale"])
        for n in ("q", "k", "v", "o"):
            _lin(sd, b + f"0.SelfAttention.{n}", lyr[n])
        sd[b + "1.layer_norm.weight"] = np.asarray(lyr["ln_ff"]["scale"])
        for n in ("wi_0", "wi_1", "wo"):
            _lin(sd, b + f"1.DenseReluDense.{n}", lyr[n])
    return sd


def _synth_vae_resnet(sd, prefix, p):
    _norm(sd, prefix + ".norm1", p["norm1"])
    _conv(sd, prefix + ".conv1", p["conv1"])
    _norm(sd, prefix + ".norm2", p["norm2"])
    _conv(sd, prefix + ".conv2", p["conv2"])
    if "conv_shortcut" in p:
        _conv(sd, prefix + ".conv_shortcut", p["conv_shortcut"])


def _synth_vae_mid(sd, prefix, p):
    _synth_vae_resnet(sd, prefix + ".resnets.0", p["resnets"][0])
    _synth_vae_resnet(sd, prefix + ".resnets.1", p["resnets"][1])
    a = p["attentions"][0]
    _norm(sd, prefix + ".attentions.0.group_norm", a["group_norm"])
    for n in ("to_q", "to_k", "to_v"):
        _lin(sd, prefix + f".attentions.0.{n}", a[n])
    _lin(sd, prefix + ".attentions.0.to_out.0", a["to_out"])


def synth_vae_sd(params):
    sd = {}
    enc = params["encoder"]
    _conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            _synth_vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in blk:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    _synth_vae_mid(sd, "encoder.mid_block", enc["mid_block"])
    _norm(sd, "encoder.conv_norm_out", enc["conv_norm_out"])
    _conv(sd, "encoder.conv_out", enc["conv_out"])
    dec = params["decoder"]
    _conv(sd, "decoder.conv_in", dec["conv_in"])
    _synth_vae_mid(sd, "decoder.mid_block", dec["mid_block"])
    for i, blk in enumerate(dec["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            _synth_vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in blk:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    _norm(sd, "decoder.conv_norm_out", dec["conv_norm_out"])
    _conv(sd, "decoder.conv_out", dec["conv_out"])
    # SD3's AutoencoderKL ships without (post_)quant convs
    # (use_quant_conv=false); the param tree omits them there
    if "quant_conv" in params:
        _conv(sd, "quant_conv", params["quant_conv"])
        _conv(sd, "post_quant_conv", params["post_quant_conv"])
    return sd


def _synth_mmdit_attn(sd, prefix, p):
    for n in ("to_q", "to_k", "to_v"):
        _lin(sd, f"{prefix}.{n}", p[n])
    _lin(sd, prefix + ".to_out.0", p["to_out"])
    for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
        if n in p:
            sd[f"{prefix}.{n}.weight"] = np.asarray(p[n]["scale"])
    for n in ("add_q_proj", "add_k_proj", "add_v_proj", "to_add_out"):
        if n in p:
            _lin(sd, f"{prefix}.{n}", p[n])


def synth_mmdit_sd(params):
    sd = {}
    _conv(sd, "pos_embed.proj", params["patch_embed"])
    _lin(sd, "time_text_embed.timestep_embedder.linear_1",
         params["timestep_embedder"]["linear_1"])
    _lin(sd, "time_text_embed.timestep_embedder.linear_2",
         params["timestep_embedder"]["linear_2"])
    _lin(sd, "time_text_embed.text_embedder.linear_1",
         params["text_embedder"]["linear_1"])
    _lin(sd, "time_text_embed.text_embedder.linear_2",
         params["text_embedder"]["linear_2"])
    _lin(sd, "context_embedder", params["context_embedder"])
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer_blocks.{i}"
        _lin(sd, pre + ".norm1.linear", blk["norm1_proj"])
        _lin(sd, pre + ".norm1_context.linear", blk["norm1_context_proj"])
        _synth_mmdit_attn(sd, pre + ".attn", blk["attn"])
        _lin(sd, pre + ".ff.net.0.proj", blk["ff1"])
        _lin(sd, pre + ".ff.net.2", blk["ff2"])
        if "ff_context1" in blk:
            _lin(sd, pre + ".ff_context.net.0.proj", blk["ff_context1"])
            _lin(sd, pre + ".ff_context.net.2", blk["ff_context2"])
        if "attn2" in blk:
            _synth_mmdit_attn(sd, pre + ".attn2", blk["attn2"])
    _lin(sd, "norm_out.linear", params["norm_out_proj"])
    _lin(sd, "proj_out", params["proj_out"])
    return sd


# -- tests -------------------------------------------------------------------


def _spot(params, path):
    """Fill one leaf with random values; return (leaf_ref, values)."""
    node = params
    for k in path[:-1]:
        node = node[k]
    vals = np.random.default_rng(0).integers(-100, 100, node[path[-1]].shape,
                                             dtype=np.int8)
    node[path[-1]] = vals
    return vals


def _get(params, path):
    node = params
    for k in path:
        node = node[k]
    return np.asarray(node)


@pytest.mark.parametrize("cfg,use_linear", [(SD15_UNET, False), (SDXL_UNET, True)])
def test_convert_unet_fullsize(cfg, use_linear):
    model = UNet2DConditionModel(cfg)
    params = zeros_params(model)
    spot_path = ("down_blocks", 1, "attentions", 0, "blocks", 0, "attn1", "to_q", "kernel")
    want = _spot(params, spot_path)
    sd = synth_unet_sd(params, use_linear)
    back = convert.convert_unet(sd, use_linear)
    assert tree_specs(back) == tree_specs(params)
    np.testing.assert_array_equal(_get(back, spot_path), want)
    del params, sd, back
    gc.collect()


def test_convert_mmdit_fullsize_sd35_medium():
    """SD3.5-medium: 24 layers, qk rms norms, dual attention in blocks 0-12,
    no context stream on the last block (models/mmdit.py SD35_MEDIUM;
    reference serves this via diffusers SD3Transformer2DModel,
    modules/SD3Transformer.py:25)."""
    model = SD3Transformer2DModel(SD35_MEDIUM)
    params = zeros_params(model)
    w1 = _spot(params, ("blocks", 0, "attn2", "to_q", "kernel"))
    w2 = _spot(params, ("blocks", 23, "attn", "norm_q", "scale"))
    sd = synth_mmdit_sd(params)
    back = convert.convert_mmdit(sd, SD35_MEDIUM.num_layers)
    assert tree_specs(back) == tree_specs(params)
    np.testing.assert_array_equal(_get(back, ("blocks", 0, "attn2", "to_q", "kernel")), w1)
    np.testing.assert_array_equal(_get(back, ("blocks", 23, "attn", "norm_q", "scale")), w2)
    # structural invariants of the real config
    assert "attn2" in back["blocks"][12] and "attn2" not in back["blocks"][13]
    assert "ff_context1" not in back["blocks"][23]
    assert "to_add_out" not in back["blocks"][23]["attn"]
    del params, sd, back
    gc.collect()


@pytest.mark.parametrize("cfg", [SD15_VAE, SDXL_VAE, SD3_VAE])
def test_convert_vae_fullsize(cfg):
    model = AutoencoderKL(cfg)
    params = zeros_params(model)
    want = _spot(params, ("decoder", "mid_block", "attentions", 0, "to_q", "kernel"))
    sd = synth_vae_sd(params)
    back = convert.convert_vae(sd)
    assert tree_specs(back) == tree_specs(params)
    np.testing.assert_array_equal(
        _get(back, ("decoder", "mid_block", "attentions", 0, "to_q", "kernel")), want)


@pytest.mark.parametrize("cfg,n", [(CLIP_L, 12), (CLIP_L_PROJ, 12), (CLIP_G, 32)])
def test_convert_clip_fullsize(cfg, n):
    model = CLIPTextModel(cfg)
    params = zeros_params(model)
    want = _spot(params, ("layers", n - 1, "fc1", "kernel"))
    sd = synth_clip_sd(params)
    back = convert.convert_clip(sd, n)
    assert tree_specs(back) == tree_specs(params)
    np.testing.assert_array_equal(_get(back, ("layers", n - 1, "fc1", "kernel")), want)
    assert ("text_projection" in back) == (cfg.projection_dim is not None)


def test_convert_t5_xxl_fullsize():
    model = T5EncoderModel(T5_XXL)
    params = zeros_params(model)
    want = _spot(params, ("layers", 23, "wi_1", "kernel"))
    sd = synth_t5_sd(params)
    back = convert.convert_t5(sd, T5_XXL.num_layers)
    assert tree_specs(back) == tree_specs(params)
    np.testing.assert_array_equal(_get(back, ("layers", 23, "wi_1", "kernel")), want)
    del params, sd, back
    gc.collect()
