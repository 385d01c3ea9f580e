"""Import HuggingFace Llama-family weights into tpu_flash param trees.

The reference project has no weight loading at all (its "model" is constant
all-ones tensors, tests/main.cu:33-35); the BASELINE configs are Llama-2-7B /
Llama-3-8B attention shapes, so real deployments start from HF checkpoints.
This maps a ``transformers`` Llama ``state_dict`` (torch tensors or numpy
arrays) onto ``FlashTransformer.init``'s pytree.

Layout notes:
* torch ``nn.Linear.weight`` is [out, in]; our dense weights are [in, out]
  (activations are row vectors) — every projection transposes.
* HF's rotary convention is split-half (rotate_half on contiguous halves),
  matching ``models/transformer.py::apply_rope`` — no head permutation is
  needed when the source is an HF-format checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from tpu_flash.models.configs import ModelConfig


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16, which numpy can't hold) → f32 numpy.
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def params_from_hf_llama(
    state_dict: Mapping[str, Any], config: ModelConfig
) -> Dict[str, Any]:
    """Build a FlashTransformer param tree from an HF Llama state dict."""
    dtype = jnp.dtype(config.dtype)

    def dense(name: str) -> jnp.ndarray:
        return jnp.asarray(_to_np(state_dict[name]).T, dtype)

    def vec(name: str) -> jnp.ndarray:
        return jnp.asarray(_to_np(state_dict[name]), dtype)

    layers = []
    for i in range(config.num_layers):
        p = f"model.layers.{i}."
        layers.append(
            {
                "attn_norm": vec(p + "input_layernorm.weight"),
                "wq": dense(p + "self_attn.q_proj.weight"),
                "wk": dense(p + "self_attn.k_proj.weight"),
                "wv": dense(p + "self_attn.v_proj.weight"),
                "wo": dense(p + "self_attn.o_proj.weight"),
                "mlp_norm": vec(p + "post_attention_layernorm.weight"),
                "w_gate": dense(p + "mlp.gate_proj.weight"),
                "w_up": dense(p + "mlp.up_proj.weight"),
                "w_down": dense(p + "mlp.down_proj.weight"),
            }
        )

    embed = jnp.asarray(_to_np(state_dict["model.embed_tokens.weight"]), dtype)
    if "lm_head.weight" in state_dict:
        lm_head = dense("lm_head.weight")
    else:  # tied embeddings (Llama-3.2-style)
        lm_head = embed.T.astype(dtype)
    params = {
        "embed": embed,
        "layers": layers,
        "final_norm": vec("model.norm.weight"),
        "lm_head": lm_head,
    }
    _validate_shapes(params, config)
    return params


def _validate_shapes(params: Dict[str, Any], config: ModelConfig) -> None:
    h = config.hidden_size
    qd = config.num_q_heads * config.head_dim
    kvd = config.num_kv_heads * config.head_dim
    expect = {
        "embed": (config.vocab_size, h),
        "final_norm": (h,),
        "lm_head": (h, config.vocab_size),
    }
    for name, shape in expect.items():
        if params[name].shape != shape:
            raise ValueError(
                f"{name}: got {params[name].shape}, expected {shape}"
            )
    layer_expect = {
        "attn_norm": (h,), "mlp_norm": (h,),
        "wq": (h, qd), "wk": (h, kvd), "wv": (h, kvd), "wo": (qd, h),
        "w_gate": (h, config.intermediate_size),
        "w_up": (h, config.intermediate_size),
        "w_down": (config.intermediate_size, h),
    }
    for i, layer in enumerate(params["layers"]):
        for name, shape in layer_expect.items():
            if layer[name].shape != shape:
                raise ValueError(
                    f"layers[{i}].{name}: got {layer[name].shape}, "
                    f"expected {shape}"
                )


def model_config_from_hf(hf_config: Mapping[str, Any], *,
                         name: str = "hf-import",
                         dtype: str = "bfloat16") -> ModelConfig:
    """Map an HF ``config.json`` dict (Llama / Mistral / Gemma-2 family)
    onto a :class:`ModelConfig`, including the attention-variant fields:
    ``sliding_window`` -> sliding_window, ``attn_logit_softcapping`` ->
    attn_softcap, and ``rope_scaling`` ({"rope_type"/"type", "factor",
    "original_max_position_embeddings"}) -> rope_scaling fields."""
    hidden = hf_config["hidden_size"]
    n_q = hf_config["num_attention_heads"]
    n_kv = hf_config.get("num_key_value_heads", n_q)
    head_dim = hf_config.get("head_dim", hidden // n_q)

    rope_scaling = None
    rope_factor = 1.0
    rope_orig = hf_config.get("max_position_embeddings", 4096)
    rope_low_f, rope_high_f = 1.0, 4.0
    rs = hf_config.get("rope_scaling") or {}
    if rs:
        kind = rs.get("rope_type", rs.get("type", "linear"))
        mapping = {
            "linear": "linear",
            "ntk": "ntk",
            "yarn": "yarn",
            "llama3": "llama3",
            # NOT mapped: "dynamic" (length-dependent NTK — applies no
            # scaling at or below the original context, which the static
            # schemes here cannot reproduce).
        }
        if kind not in mapping:
            raise ValueError(f"unsupported HF rope_scaling type {kind!r}")
        rope_scaling = mapping[kind]
        rope_factor = float(rs.get("factor", 1.0))
        if kind in ("yarn", "llama3"):
            if "original_max_position_embeddings" not in rs:
                # Falling back to the (extended) max_position_embeddings
                # would neuter the interpolation ramp silently.
                raise ValueError(
                    f"rope_scaling type {kind!r} requires "
                    "original_max_position_embeddings in rope_scaling"
                )
            rope_orig = int(rs["original_max_position_embeddings"])
        if kind == "llama3":
            rope_low_f = float(rs.get("low_freq_factor", 1.0))
            rope_high_f = float(rs.get("high_freq_factor", 4.0))

    return ModelConfig(
        name=name,
        vocab_size=hf_config["vocab_size"],
        hidden_size=hidden,
        num_layers=hf_config["num_hidden_layers"],
        num_q_heads=n_q,
        num_kv_heads=n_kv,
        head_dim=head_dim,
        intermediate_size=hf_config["intermediate_size"],
        rope_theta=float(hf_config.get("rope_theta", 10000.0)),
        rms_eps=float(hf_config.get("rms_norm_eps", 1e-5)),
        dtype=dtype,
        sliding_window=hf_config.get("sliding_window"),
        # Gemma-3 publishes the local/global alternation period directly;
        # Gemma-2 alternates every other layer by convention.
        sliding_window_pattern=hf_config.get(
            "sliding_window_pattern",
            2 if hf_config.get("model_type") == "gemma2"
            and hf_config.get("sliding_window") else None,
        ),
        attn_softcap=hf_config.get("attn_logit_softcapping"),
        rope_scaling=rope_scaling,
        rope_scaling_factor=rope_factor,
        rope_orig_context=rope_orig,
        rope_low_freq_factor=rope_low_f,
        rope_high_freq_factor=rope_high_f,
        query_pre_attn_scalar=hf_config.get("query_pre_attn_scalar"),
        # BLOOM publishes alibi via model_type; MPT via attn_config.alibi.
        attn_alibi=bool(
            hf_config.get("alibi")
            or hf_config.get("model_type") == "bloom"
            or (hf_config.get("attn_config") or {}).get("alibi", False)
        ),
    )


def load_hf_dir(path: str, *, dtype: str = "bfloat16"):
    """(FlashTransformer, params) from an HF checkpoint DIRECTORY
    (``config.json`` + ``*.safetensors`` or ``pytorch_model*.bin``
    shards). The weight mapping is :func:`params_from_hf_llama`; the
    config mapping (incl. sliding window / softcap / rope scaling /
    ALiBi) is :func:`model_config_from_hf`."""
    import json
    import os

    from tpu_flash.models import FlashTransformer

    with open(os.path.join(path, "config.json")) as f:
        hf_config = json.load(f)
    config = model_config_from_hf(
        hf_config, name=hf_config.get("model_type", "hf-import"),
        dtype=dtype,
    )
    files = sorted(os.listdir(path))
    state: Dict[str, Any] = {}
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [
        f for f in files if f.endswith(".bin") and "pytorch_model" in f
    ]
    if st_files:
        try:
            from safetensors.numpy import load_file
        except ImportError as e:  # pragma: no cover - env dependent
            raise ImportError(
                "safetensors checkpoint found but the safetensors package "
                "is unavailable; convert to pytorch_model*.bin"
            ) from e
        for f in st_files:
            state.update(load_file(os.path.join(path, f)))
    elif bin_files:
        import torch

        for f in bin_files:
            state.update(
                torch.load(
                    os.path.join(path, f),
                    map_location="cpu",
                    weights_only=True,
                )
            )
    else:
        raise FileNotFoundError(
            f"no *.safetensors or pytorch_model*.bin shards under {path}"
        )
    params = params_from_hf_llama(state, config)
    return FlashTransformer(config), params
