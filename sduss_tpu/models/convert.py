"""Torch/HF state-dict -> sduss_tpu param-pytree converters.

Pure numpy: takes a mapping name -> np.ndarray (from safetensors or a torch
state_dict) and produces the nested dicts our functional models consume.
Torch nn.Linear weights are (out, in) -> transposed to (in, out); conv weights
OIHW -> HWIO.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _conv_p(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def convert_clip(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """transformers CLIPTextModel(/WithProjection) state dict -> CLIP pytree."""
    pre = "text_model."
    p = {
        "token_embedding": np.asarray(sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": np.asarray(sd[pre + "embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(sd, pre + "final_layer_norm"),
        "layers": [],
    }
    for i in range(num_layers):
        lp = f"{pre}encoder.layers.{i}."
        p["layers"].append({
            "ln1": _ln(sd, lp + "layer_norm1"),
            "ln2": _ln(sd, lp + "layer_norm2"),
            "q": _lin(sd, lp + "self_attn.q_proj"),
            "k": _lin(sd, lp + "self_attn.k_proj"),
            "v": _lin(sd, lp + "self_attn.v_proj"),
            "out": _lin(sd, lp + "self_attn.out_proj"),
            "fc1": _lin(sd, lp + "mlp.fc1"),
            "fc2": _lin(sd, lp + "mlp.fc2"),
        })
    if "text_projection.weight" in sd:
        p["text_projection"] = {"kernel": _t(sd["text_projection.weight"])}
    return p


def convert_clip_vision(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """transformers CLIPVisionModelWithProjection state dict -> pytree."""
    pre = "vision_model."
    p = {
        "class_embedding": np.asarray(sd[pre + "embeddings.class_embedding"]),
        "patch_embedding": _conv_p(sd, pre + "embeddings.patch_embedding"),
        "position_embedding": np.asarray(sd[pre + "embeddings.position_embedding.weight"]),
        "pre_layernorm": _ln(sd, pre + "pre_layrnorm")
        if pre + "pre_layrnorm.weight" in sd else _ln(sd, pre + "pre_layernorm"),
        "post_layernorm": _ln(sd, pre + "post_layernorm"),
        "visual_projection": {"kernel": _t(sd["visual_projection.weight"])},
        "layers": [],
    }
    for i in range(num_layers):
        lp = f"{pre}encoder.layers.{i}."
        p["layers"].append({
            "ln1": _ln(sd, lp + "layer_norm1"),
            "ln2": _ln(sd, lp + "layer_norm2"),
            "q": _lin(sd, lp + "self_attn.q_proj"),
            "k": _lin(sd, lp + "self_attn.k_proj"),
            "v": _lin(sd, lp + "self_attn.v_proj"),
            "out": _lin(sd, lp + "self_attn.out_proj"),
            "fc1": _lin(sd, lp + "mlp.fc1"),
            "fc2": _lin(sd, lp + "mlp.fc2"),
        })
    return p


def convert_t5(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """transformers T5EncoderModel state dict -> T5 pytree."""
    p = {
        "token_embedding": np.asarray(sd["shared.weight"]),
        "relative_attention_bias": np.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "final_layer_norm": {"scale": np.asarray(sd["encoder.final_layer_norm.weight"])},
        "layers": [],
    }
    for i in range(num_layers):
        b = f"encoder.block.{i}.layer."
        p["layers"].append({
            "ln_attn": {"scale": np.asarray(sd[b + "0.layer_norm.weight"])},
            "q": {"kernel": _t(sd[b + "0.SelfAttention.q.weight"])},
            "k": {"kernel": _t(sd[b + "0.SelfAttention.k.weight"])},
            "v": {"kernel": _t(sd[b + "0.SelfAttention.v.weight"])},
            "o": {"kernel": _t(sd[b + "0.SelfAttention.o.weight"])},
            "ln_ff": {"scale": np.asarray(sd[b + "1.layer_norm.weight"])},
            "wi_0": {"kernel": _t(sd[b + "1.DenseReluDense.wi_0.weight"])},
            "wi_1": {"kernel": _t(sd[b + "1.DenseReluDense.wi_1.weight"])},
            "wo": {"kernel": _t(sd[b + "1.DenseReluDense.wo.weight"])},
        })
    return p


_gn = _ln  # identical scale/bias mapping; one implementation


def _resnet(sd, prefix, with_temb=True):
    p = {
        "norm1": _gn(sd, prefix + ".norm1"),
        "conv1": _conv_p(sd, prefix + ".conv1"),
        "norm2": _gn(sd, prefix + ".norm2"),
        "conv2": _conv_p(sd, prefix + ".conv2"),
    }
    if with_temb and f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, prefix + ".time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv_p(sd, prefix + ".conv_shortcut")
    return p


def _attn_qkv(sd, prefix):
    p = {
        "to_q": _lin(sd, prefix + ".to_q"),
        "to_k": _lin(sd, prefix + ".to_k"),
        "to_v": _lin(sd, prefix + ".to_v"),
        "to_out": _lin(sd, prefix + ".to_out.0"),
    }
    for name in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
        if f"{prefix}.{name}.weight" in sd:
            p[name] = {"scale": np.asarray(sd[f"{prefix}.{name}.weight"])}
    for name in ("add_q_proj", "add_k_proj", "add_v_proj", "to_add_out"):
        if f"{prefix}.{name}.weight" in sd:
            p[name] = _lin(sd, prefix + f".{name}")
    return p


def _tblock(sd, prefix):
    return {
        "norm1": _ln(sd, prefix + ".norm1"),
        "attn1": _attn_qkv(sd, prefix + ".attn1"),
        "norm2": _ln(sd, prefix + ".norm2"),
        "attn2": _attn_qkv(sd, prefix + ".attn2"),
        "norm3": _ln(sd, prefix + ".norm3"),
        "ff_geglu": _lin(sd, prefix + ".ff.net.0.proj"),
        "ff_out": _lin(sd, prefix + ".ff.net.2"),
    }


def _sd_transformer(sd, prefix, use_linear):
    proj = _lin if use_linear else _conv_p
    p = {
        "norm": _gn(sd, prefix + ".norm"),
        "proj_in": proj(sd, prefix + ".proj_in"),
        "proj_out": proj(sd, prefix + ".proj_out"),
        "blocks": [],
    }
    i = 0
    while f"{prefix}.transformer_blocks.{i}.norm1.weight" in sd:
        p["blocks"].append(_tblock(sd, f"{prefix}.transformer_blocks.{i}"))
        i += 1
    return p


def convert_unet(sd: Mapping[str, np.ndarray], use_linear_projection: bool) -> dict:
    """diffusers UNet2DConditionModel state dict -> UNet pytree."""
    p: dict = {
        "conv_in": _conv_p(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "down_blocks": [],
        "up_blocks": [],
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv_p(sd, "conv_out"),
    }
    if "add_embedding.linear_1.weight" in sd:
        p["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }
    i = 0
    while f"down_blocks.{i}.resnets.0.norm1.weight" in sd:
        pre = f"down_blocks.{i}"
        blk = {"resnets": [], "attentions": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(_resnet(sd, f"{pre}.resnets.{j}"))
            if f"{pre}.attentions.{j}.norm.weight" in sd:
                blk["attentions"].append(
                    _sd_transformer(sd, f"{pre}.attentions.{j}", use_linear_projection))
            j += 1
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv_p(sd, f"{pre}.downsamplers.0.conv")
        p["down_blocks"].append(blk)
        i += 1
    p["mid_block"] = {
        "resnets": [_resnet(sd, "mid_block.resnets.0"), _resnet(sd, "mid_block.resnets.1")],
        "attentions": [_sd_transformer(sd, "mid_block.attentions.0", use_linear_projection)],
    }
    i = 0
    while f"up_blocks.{i}.resnets.0.norm1.weight" in sd:
        pre = f"up_blocks.{i}"
        blk = {"resnets": [], "attentions": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(_resnet(sd, f"{pre}.resnets.{j}"))
            if f"{pre}.attentions.{j}.norm.weight" in sd:
                blk["attentions"].append(
                    _sd_transformer(sd, f"{pre}.attentions.{j}", use_linear_projection))
            j += 1
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv_p(sd, f"{pre}.upsamplers.0.conv")
        p["up_blocks"].append(blk)
        i += 1
    return p


def _vae_attn(sd, prefix):
    return {
        "group_norm": _gn(sd, prefix + ".group_norm"),
        "to_q": _lin(sd, prefix + ".to_q"),
        "to_k": _lin(sd, prefix + ".to_k"),
        "to_v": _lin(sd, prefix + ".to_v"),
        "to_out": _lin(sd, prefix + ".to_out.0"),
    }


def _vae_mid(sd, prefix):
    return {
        "resnets": [_resnet(sd, f"{prefix}.resnets.0", with_temb=False),
                    _resnet(sd, f"{prefix}.resnets.1", with_temb=False)],
        "attentions": [_vae_attn(sd, f"{prefix}.attentions.0")],
    }


def convert_vae(sd: Mapping[str, np.ndarray]) -> dict:
    """diffusers AutoencoderKL state dict -> VAE pytree."""
    enc: dict = {
        "conv_in": _conv_p(sd, "encoder.conv_in"),
        "down_blocks": [],
        "mid_block": _vae_mid(sd, "encoder.mid_block"),
        "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv_p(sd, "encoder.conv_out"),
    }
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.norm1.weight" in sd:
        pre = f"encoder.down_blocks.{i}"
        blk = {"resnets": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(_resnet(sd, f"{pre}.resnets.{j}", with_temb=False))
            j += 1
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv_p(sd, f"{pre}.downsamplers.0.conv")
        enc["down_blocks"].append(blk)
        i += 1
    dec: dict = {
        "conv_in": _conv_p(sd, "decoder.conv_in"),
        "mid_block": _vae_mid(sd, "decoder.mid_block"),
        "up_blocks": [],
        "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv_p(sd, "decoder.conv_out"),
    }
    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.norm1.weight" in sd:
        pre = f"decoder.up_blocks.{i}"
        blk = {"resnets": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(_resnet(sd, f"{pre}.resnets.{j}", with_temb=False))
            j += 1
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv_p(sd, f"{pre}.upsamplers.0.conv")
        dec["up_blocks"].append(blk)
        i += 1
    return {
        "encoder": enc,
        "decoder": dec,
        # SD3's AutoencoderKL ships without (post_)quant convs
        # (use_quant_conv=false); only convert them when present
        **({"quant_conv": _conv_p(sd, "quant_conv"),
            "post_quant_conv": _conv_p(sd, "post_quant_conv")}
           if "quant_conv.weight" in sd else {}),
    }


def convert_mmdit(sd: Mapping[str, np.ndarray], num_layers: int) -> dict:
    """diffusers SD3Transformer2DModel state dict -> MMDiT pytree."""
    p: dict = {
        "patch_embed": _conv_p(sd, "pos_embed.proj"),
        "timestep_embedder": {
            "linear_1": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": _lin(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "context_embedder": _lin(sd, "context_embedder"),
        "blocks": [],
        "norm_out_proj": _lin(sd, "norm_out.linear"),
        "proj_out": _lin(sd, "proj_out"),
    }
    for i in range(num_layers):
        pre = f"transformer_blocks.{i}"
        blk = {
            "norm1_proj": _lin(sd, pre + ".norm1.linear"),
            "norm1_context_proj": _lin(sd, pre + ".norm1_context.linear"),
            "attn": _attn_qkv(sd, pre + ".attn"),
            "ff1": _lin(sd, pre + ".ff.net.0.proj"),
            "ff2": _lin(sd, pre + ".ff.net.2"),
        }
        if f"{pre}.ff_context.net.0.proj.weight" in sd:
            blk["ff_context1"] = _lin(sd, pre + ".ff_context.net.0.proj")
            blk["ff_context2"] = _lin(sd, pre + ".ff_context.net.2")
        if f"{pre}.attn2.to_q.weight" in sd:
            blk["attn2"] = _attn_qkv(sd, pre + ".attn2")
        p["blocks"].append(blk)
    return p
