from .mlp import LinearChannelMLP, ChannelMLP, SimpleMLP, ConditionedNorm
from .gemb import GeometricEmbedding, node_pos_encode
from .agno import AGNO
from .magno import MAGNOEncoder, MAGNODecoder, flatten_vx_graph
from .transformer import Transformer, TransformerBlock, RMSNorm, GroupQueryAttention, FFN
from .gaot import GAOT, patchify, unpatchify, patch_positions, absolute_embeddings
from .rollout import autoregressive_predict

__all__ = [
    "LinearChannelMLP", "ChannelMLP", "SimpleMLP", "ConditionedNorm",
    "GeometricEmbedding", "node_pos_encode",
    "AGNO",
    "MAGNOEncoder", "MAGNODecoder", "flatten_vx_graph",
    "Transformer", "TransformerBlock", "RMSNorm", "GroupQueryAttention", "FFN",
    "GAOT", "patchify", "unpatchify", "patch_positions", "absolute_embeddings",
    "autoregressive_predict",
]
