"""HF snapshot loader: model_index.json + safetensors -> ModelBundle params.

Rebuilds the reference's model_loader
(sduss/model_executor/model_loader.py:28-120) for JAX: reads the pipeline's
``model_index.json``, loads each component's safetensors (sharded or single
file) as numpy, runs the converters in sduss_tpu/models/convert.py, and fills
a ModelBundle.  Tokenizers load via transformers from the snapshot's tokenizer
dirs; absent a snapshot a deterministic stub tokenizer keeps the full stack
runnable (tests, benchmarks).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, Optional

import numpy as np

from sduss_tpu.logger import init_logger
from sduss_tpu.models import convert
from sduss_tpu.models.registry import ModelBundle, get_bundle

logger = init_logger(__name__)


def _load_safetensors_dir(component_dir: str) -> Dict[str, np.ndarray]:
    """Load all tensors of a component (single file or sharded via index)."""
    try:
        from safetensors import numpy as st_numpy
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("safetensors is required to load HF snapshots") from e

    files = sorted(f for f in os.listdir(component_dir) if f.endswith(".safetensors"))
    # HF snapshots may ship precision variants alongside the main weights
    # (diffusion_pytorch_model.fp16.safetensors, model.fp16-00001-of-...).
    # Loading both double-reads and lets sort order decide which wins;
    # prefer the non-variant set whenever one exists.
    main = [f for f in files if ".fp16." not in f and ".bf16." not in f]
    if main:
        files = main
    if not files:
        raise FileNotFoundError(f"no safetensors in {component_dir}")
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        sd.update(st_numpy.load_file(os.path.join(component_dir, f)))
    return sd


class StubTokenizer:
    """Deterministic hash tokenizer for weight-less runs.

    Emits BOS + hashed word ids + EOS, padded to model_max_length with
    pad_token_id — structurally identical to CLIP/T5 tokenizer output.
    Word hashing uses crc32, NOT Python hash() (salted per process): ids
    must match across processes for seeded reproducibility.
    """

    def __init__(self, vocab_size: int, model_max_length: int = 77,
                 bos: Optional[int] = 0, eos: int = 2, pad: int = 1):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self.bos, self.eos, self.pad = bos, eos, pad

    def __call__(self, texts, max_length: Optional[int] = None, **_):
        max_length = max_length or self.model_max_length
        ids, mask = [], []
        for t in texts:
            toks = [self.bos] if self.bos is not None else []
            toks += [3 + (zlib.crc32(w.encode()) % (self.vocab_size - 4))
                     for w in t.split()][: max_length - len(toks) - 1]
            toks.append(self.eos)
            m = [1] * len(toks)
            while len(toks) < max_length:
                toks.append(self.pad)
                m.append(0)
            ids.append(toks)
            mask.append(m)
        return {"input_ids": np.asarray(ids, np.int32),
                "attention_mask": np.asarray(mask, np.int32)}


def _load_tokenizer(snapshot: Optional[str], subdir: str, fallback_vocab: int,
                    t5: bool = False):
    if snapshot is not None:
        tok_dir = os.path.join(snapshot, subdir)
        if not os.path.isdir(tok_dir):
            logger.warning("snapshot %s has no %s/ — falling back to the "
                           "HASH STUB tokenizer (outputs will be garbage "
                           "with real weights)", snapshot, subdir)
        else:
            try:
                import transformers

                return transformers.AutoTokenizer.from_pretrained(tok_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("tokenizer load failed for %s: %s; using stub", tok_dir, e)
    if t5:
        return StubTokenizer(fallback_vocab, model_max_length=256, bos=None, eos=1, pad=0)
    return StubTokenizer(fallback_vocab)


def load_bundle(family: str, snapshot: Optional[str] = None, tiny: bool = False,
                dtype=None, seed: int = 0, host_roles=()) -> ModelBundle:
    """Build a ModelBundle; load weights from ``snapshot`` if given.

    ``host_roles``: components to place (or generate) on the CPU host
    instead of the accelerator (ModelConfig.encoders_on_host)."""
    bundle = get_bundle(family, tiny=tiny)

    # Tokenizers (HF snapshot dirs are tokenizer/, tokenizer_2/, tokenizer_3/).
    enc_names = list(bundle.spec.text_encoders)
    for i, role in enumerate(enc_names):
        sub = "tokenizer" if i == 0 else f"tokenizer_{i + 1}"
        key = "tokenizer" if i == 0 else f"tokenizer_{i + 1}"
        te_key = "text_encoder" if i == 0 else f"text_encoder_{i + 1}"
        vocab = (bundle.models[te_key].cfg.vocab_size)
        bundle.tokenizers[key] = _load_tokenizer(snapshot, sub, vocab, t5=(role == "t5"))

    if snapshot is None:
        bundle.init_random(seed=seed, dtype=dtype, host_roles=host_roles)
        return bundle

    with open(os.path.join(snapshot, "model_index.json")) as f:
        index = json.load(f)
    logger.info("loading %s from %s (%s)", family, snapshot, index.get("_class_name"))

    for name, model in bundle.models.items():
        comp_dir = os.path.join(snapshot, name)
        sd = _load_safetensors_dir(comp_dir)
        if name.startswith("text_encoder"):
            if hasattr(model, "position_bias"):  # T5
                bundle.params[name] = convert.convert_t5(sd, model.cfg.num_layers)
            else:
                bundle.params[name] = convert.convert_clip(sd, model.cfg.num_layers)
        elif name == "unet":
            bundle.params[name] = convert.convert_unet(sd, model.cfg.use_linear_projection)
        elif name == "transformer":
            bundle.params[name] = convert.convert_mmdit(sd, model.cfg.num_layers)
        elif name == "vae":
            bundle.params[name] = convert.convert_vae(sd)
        else:  # pragma: no cover
            raise ValueError(name)

    import jax
    import jax.numpy as jnp

    def _place(name, tree):
        if name in host_roles:
            with jax.default_device(jax.devices("cpu")[0]):
                return _to_jnp(tree)
        return _to_jnp(tree)

    bundle.params = {k: _place(k, v) for k, v in bundle.params.items()}
    if dtype is not None:
        bundle.cast(dtype)
    return bundle


def _to_jnp(tree):
    import jax
    import jax.numpy as jnp

    def conv(x):
        a = np.asarray(x)
        if a.dtype == np.float16:
            a = a.astype(np.float32)
        return jnp.asarray(a)

    return jax.tree.map(conv, tree)
