"""TPU-native tensor ops for the MioTTS pipeline.

All ops take/return time-major ``[batch, time, channels]`` arrays and accept
per-example ``lengths`` so that one jitted, length-bucketed graph serves all
request sizes (replacing the reference's per-shape GGML graph rebuild +
GPU graph-copy cache, ``miocodec-decoder.cpp:1106-1120,1530-1535``).
"""

from .masking import time_mask, mask_time
from .norms import layer_norm, masked_group_norm, adaln_modulate
from .rope import apply_rope
from .attention import banded_attention
from .convs import conv1d_same, conv1d_depthwise_same, conv_transpose1d, linear_interpolate
from .istft import istft_overlap_add, spec_to_audio

__all__ = [
    "time_mask", "mask_time",
    "layer_norm", "masked_group_norm", "adaln_modulate",
    "apply_rope",
    "banded_attention",
    "conv1d_same", "conv1d_depthwise_same", "conv_transpose1d", "linear_interpolate",
    "istft_overlap_add", "spec_to_audio",
]
