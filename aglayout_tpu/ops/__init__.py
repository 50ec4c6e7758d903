from aglayout_tpu.ops.bilinear import (
    tensor_linspace,
    interp_matrix,
    crop_bbox,
    crop_bbox_dense,
    crop_bbox_flat,
    uncrop_bbox,
)
from aglayout_tpu.ops.rasterize import rasterize_boxes, shift_boxes
from aglayout_tpu.ops.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    imagenet_preprocess,
    imagenet_deprocess,
    imagenet_deprocess_batch,
)
