"""Multi-chip scaling: device meshes, sharded training and serving."""

from resnet_accel_tpu.parallel.mesh import (
    available_devices,
    make_mesh,
    batch_sharding,
    replicated,
    tp_row_sharding,
)
from resnet_accel_tpu.parallel.sharded import (
    make_sharded_train_step,
    make_data_parallel_forward,
)
from resnet_accel_tpu.parallel.pipeline import (
    make_pipeline_forward,
    mnist_pipeline_stages,
    transformer_pipeline_stages,
)
from resnet_accel_tpu.parallel.combined import (
    make_combined_mesh,
    make_combined_forward,
    make_combined_train_step,
)
from resnet_accel_tpu.parallel.sequence import make_sp_transformer_forward
from resnet_accel_tpu.parallel.experts import make_ep_moe_forward
from resnet_accel_tpu.parallel.heads import make_tp_transformer_forward

__all__ = [
    "available_devices",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "tp_row_sharding",
    "make_sharded_train_step",
    "make_data_parallel_forward",
    "make_pipeline_forward",
    "mnist_pipeline_stages",
    "transformer_pipeline_stages",
    "make_combined_mesh",
    "make_combined_forward",
    "make_combined_train_step",
    "make_sp_transformer_forward",
    "make_ep_moe_forward",
    "make_tp_transformer_forward",
]
