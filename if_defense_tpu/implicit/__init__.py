"""Implicit-function reconstruction networks (IF-Defense core).

- ONet: Occupancy Networks (`ONet/im2mesh/onet/`) — ResnetPointnet encoder
  + conditional-batch-norm decoder, c_dim 512.
- ConvONet: Convolutional Occupancy Networks (`ConvONet/src/conv_onet/`) —
  LocalPoolPointnet 3-plane encoder + 2D UNet + bilinear-plane LocalDecoder,
  c_dim 32.

Both expose the reference model API: `encode_inputs(pc) -> c` and
`decode(p, c) -> occupancy logits` (`ONet/im2mesh/onet/models/__init__.py:
86-112`, `ConvONet/src/conv_onet/models/__init__.py:52-77`).
"""

from if_defense_tpu.implicit.onet import (
    DECODER_REGISTRY,
    LatentEncoder,
    OccupancyNetwork,
    ResnetPointnet,
)
from if_defense_tpu.implicit.convonet import (
    ConvOccupancyNetwork,
    LocalPoolPointnet,
    LocalDecoder,
    PatchLocalPoolPointnet,
)
from if_defense_tpu.implicit.legacy import FeatureDecoder, VoxelDecoder

__all__ = [
    "DECODER_REGISTRY",
    "LatentEncoder",
    "OccupancyNetwork",
    "ResnetPointnet",
    "ConvOccupancyNetwork",
    "LocalPoolPointnet",
    "LocalDecoder",
    "PatchLocalPoolPointnet",
    "FeatureDecoder",
    "VoxelDecoder",
]
