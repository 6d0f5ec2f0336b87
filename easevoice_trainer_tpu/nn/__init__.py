from .layers import (
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
    LayerNorm,
    sequence_mask,
)
from .attention import MultiHeadAttention, RelPosEncoder
from .wavenet import WaveNet
