from .mesh import (make_mesh, make_multihost_mesh, replicated, shard,
                   DATA_AXIS, SEQ_AXIS, MODEL_AXIS)
from .sp import (
    broadcast_sink_kv,
    reduce_sink_grads,
    local_position_offset,
    sp_sink_flash_attention,
)
from .ulysses import (ulysses_sink_flash_attention,
                      ulysses_sink_flash_attention_packed,
                      slice_s_aux_for_rank)
from .ring import (ring_sink_flash_attention,
                   sharded_sink_flash_attention)
from .pp import (
    stack_pipeline_params,
    unstack_pipeline_params,
    pipeline_forward,
    make_pp_train_step,
    pipeline_param_shardings,
)

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "replicated",
    "shard",
    "DATA_AXIS",
    "SEQ_AXIS",
    "MODEL_AXIS",
    "broadcast_sink_kv",
    "reduce_sink_grads",
    "local_position_offset",
    "sp_sink_flash_attention",
    "ulysses_sink_flash_attention",
    "ulysses_sink_flash_attention_packed",
    "slice_s_aux_for_rank",
    "ring_sink_flash_attention",
    "sharded_sink_flash_attention",
    "stack_pipeline_params",
    "unstack_pipeline_params",
    "pipeline_forward",
    "make_pp_train_step",
    "pipeline_param_shardings",
]
