from .config import ModelConfig
from .model import (
    init_params,
    forward_prefill,
    forward_decode,
    forward_decode_ragged,
    make_caches,
    make_ragged_caches,
    rms_norm,
    rope_cos_sin,
    apply_rope,
    moe,
)
from .hf_loader import params_from_hf_state_dict, load_hf_checkpoint
from .quant import (quantize_params, quantize_weight, is_quantized,
                    is_quantized4, quantize_weight_int4,
                    init_quantized_params)

__all__ = [
    "ModelConfig",
    "init_params",
    "forward_prefill",
    "forward_decode",
    "forward_decode_ragged",
    "make_caches",
    "make_ragged_caches",
    "rms_norm",
    "rope_cos_sin",
    "apply_rope",
    "moe",
    "params_from_hf_state_dict",
    "load_hf_checkpoint",
    "quantize_params",
    "quantize_weight",
    "is_quantized",
    "init_quantized_params",
    "is_quantized4",
    "quantize_weight_int4",
]
