"""JAX training: dense trainers + progressive block-sparse pruning."""

from resnet_accel_tpu.train.mnist import (
    init_mnist_params,
    mnist_forward_fp32,
    train_mnist,
    save_checkpoint,
    load_checkpoint,
    export_golden_vectors,
    TrainResult,
)
from resnet_accel_tpu.train.checkpoint import (
    CheckpointManager,
    save_orbax,
    load_orbax,
)
from resnet_accel_tpu.train.resnet18 import (
    train_resnet18,
    export_inference_params,
    resnet18_forward,
)
from resnet_accel_tpu.train.qat import (
    fake_quant,
    fake_quant_per_channel,
    qat_finetune,
    export_qat,
)
from resnet_accel_tpu.train.blocksparse import (
    BlockCfg,
    DEFAULT_FC_CFG,
    DEFAULT_CONV_CFG,
    REF_FC_CFG,
    REF_CONV_CFG,
    compute_block_norms,
    prune_blocks_global,
    expand_mask,
    make_mask_fn,
    make_group_lasso_fn,
    sparsity_of_masks,
    effective_sparsity,
    progressive_prune,
)

__all__ = [
    "CheckpointManager",
    "save_orbax",
    "load_orbax",
    "train_resnet18",
    "export_inference_params",
    "resnet18_forward",
    "fake_quant",
    "fake_quant_per_channel",
    "qat_finetune",
    "export_qat",
    "init_mnist_params",
    "mnist_forward_fp32",
    "train_mnist",
    "save_checkpoint",
    "load_checkpoint",
    "export_golden_vectors",
    "TrainResult",
    "BlockCfg",
    "DEFAULT_FC_CFG",
    "DEFAULT_CONV_CFG",
    "REF_FC_CFG",
    "REF_CONV_CFG",
    "compute_block_norms",
    "prune_blocks_global",
    "expand_mask",
    "make_mask_fn",
    "make_group_lasso_fn",
    "sparsity_of_masks",
    "effective_sparsity",
    "progressive_prune",
]
