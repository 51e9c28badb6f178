"""Model zoo: MNIST CNN, ResNet-18, sparse attention (INT8 inference)."""

from resnet_accel_tpu.models.mnist_cnn import (
    MNISTCNNInt8,
    forward_golden as mnist_forward_golden,
    make_forward as make_mnist_forward,
)
from resnet_accel_tpu.models.resnet18 import (
    ResNet18Int8,
    attach_bsr,
    forward_golden as resnet18_forward_golden,
    init_resnet18_fp32,
    make_forward as make_resnet18_forward,
    prune_params_blockwise,
    quantize_resnet18,
)
from resnet_accel_tpu.models.resnet import (
    init_resnet_fp32,
    quantize_resnet,
)
from resnet_accel_tpu.models.attention import (
    SparseAttentionInt8,
    SparseProjection,
)
from resnet_accel_tpu.models.transformer import TransformerBlockInt8
from resnet_accel_tpu.models.lm import TransformerLMInt8
from resnet_accel_tpu.models.moe import MoEBlockInt8

__all__ = [
    "MNISTCNNInt8",
    "mnist_forward_golden",
    "make_mnist_forward",
    "ResNet18Int8",
    "attach_bsr",
    "resnet18_forward_golden",
    "init_resnet18_fp32",
    "make_resnet18_forward",
    "prune_params_blockwise",
    "quantize_resnet18",
    "init_resnet_fp32",
    "quantize_resnet",
    "SparseAttentionInt8",
    "SparseProjection",
    "TransformerBlockInt8",
    "TransformerLMInt8",
    "MoEBlockInt8",
]
