from .timing import (
    time_chained,
    sink_attention_flops,
    V5E_PEAK_BF16,
    H200_PEAK_BF16,
    V5E_HBM_BW,
)

__all__ = [
    "time_chained",
    "sink_attention_flops",
    "V5E_PEAK_BF16",
    "H200_PEAK_BF16",
    "V5E_HBM_BW",
]
