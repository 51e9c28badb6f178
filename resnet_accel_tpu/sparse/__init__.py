"""BSR block-sparse packing and artifact I/O."""

from resnet_accel_tpu.sparse.bsr import (
    BSRMatrix,
    build_bsr,
    build_bsr_int8_direct,
    conv_weight_to_2d,
)
from resnet_accel_tpu.sparse.io import (
    save_layer_dir,
    load_layer_dir,
    load_layer_scales_bias,
    bsr_metadata,
    serialize_hw_stream,
    deserialize_hw_stream,
    pack_dma_image,
    unpack_dma_image,
)

__all__ = [
    "BSRMatrix",
    "build_bsr",
    "build_bsr_int8_direct",
    "conv_weight_to_2d",
    "save_layer_dir",
    "load_layer_dir",
    "load_layer_scales_bias",
    "bsr_metadata",
    "serialize_hw_stream",
    "deserialize_hw_stream",
    "pack_dma_image",
    "unpack_dma_image",
]
