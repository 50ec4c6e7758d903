from aglayout_tpu.models.norms import MaskedBatchNorm, ConditionalBatchNorm, SPADE
from aglayout_tpu.models.layers import Conv2d, ConvTranspose2d, Dense, ResidualBlock
from aglayout_tpu.models.convlstm import ConvLSTMCell, LayoutFuser
from aglayout_tpu.models.generator import (
    Generator,
    CropEncoder,
    LayoutEncoder,
    GlobalEncoder,
    Decoder,
    AttributeEncoder,
)
from aglayout_tpu.models.discriminator import (
    ImageDiscriminator,
    ObjectDiscriminator,
    AttributeDiscriminator,
)
