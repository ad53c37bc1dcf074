"""GAOT — Geometry-Aware Operator Transformer (Flax).

Encode → process → decode architecture matching the reference GAOT model
(src/model/gaot.py:11-305): a MAGNO encoder maps scattered physical-node
features onto a regular latent grid, a patchified UViT transformer evolves
the latent grid, and a MAGNO decoder maps back to arbitrary query points.
2D and 3D latent grids, fx and vx coordinate modes, absolute-sinusoidal or
RoPE positional embeddings, optional time-conditional normalization.

Patchify/unpatchify are pure reshape+transpose (no data movement beyond one
relayout, fused by XLA) with the exact element ordering of the reference
(src/model/gaot.py:177-231). The autoregressive rollout lives in
models/rollout.py as a lax.scan over time steps.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import ModelConfig
from ..ops.padding import PaddedGraph
from ..parallel.spatial import shard_queries
from .magno import MAGNOEncoder, MAGNODecoder
from .transformer import Transformer


def patch_positions(grid_shape: Sequence[int], patch_size: int) -> np.ndarray:
    """Integer patch-grid positions [num_patches, ndim]
    (reference src/model/gaot.py:92-117)."""
    counts = [s // patch_size for s in grid_shape]
    mesh = np.meshgrid(*[np.arange(c, dtype=np.float32) for c in counts], indexing="ij")
    return np.stack(mesh, axis=-1).reshape(-1, len(counts))


def absolute_embeddings(positions: np.ndarray, embed_dim: int) -> np.ndarray:
    """Sinusoidal absolute positional embeddings
    (reference src/model/gaot.py:119-130)."""
    num_pos_dims = positions.shape[1]
    dim_touse = embed_dim // (2 * num_pos_dims)
    freq_seq = np.arange(dim_touse, dtype=np.float32)
    inv_freq = 1.0 / (10000 ** (freq_seq / dim_touse))
    sinusoid = positions[:, :, None] * inv_freq[None, None, :]
    emb = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    emb = emb.reshape(positions.shape[0], -1)
    if emb.shape[1] < embed_dim:                  # pad if embed_dim % (2*ndim) != 0
        emb = np.pad(emb, ((0, 0), (0, embed_dim - emb.shape[1])))
    return emb


def patchify(x: jnp.ndarray, grid_shape: Sequence[int], patch_size: int) -> jnp.ndarray:
    """[B, prod(grid), C] → [B, num_patches, P^ndim · C] (reference ordering)."""
    b, _, c = x.shape
    p = patch_size
    if len(grid_shape) == 2:
        h, w = grid_shape
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, (h // p) * (w // p), p * p * c)
    h, w, d = grid_shape
    x = x.reshape(b, h // p, p, w // p, p, d // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (h // p) * (w // p) * (d // p), p * p * p * c)


def unpatchify(x: jnp.ndarray, grid_shape: Sequence[int], patch_size: int,
               channels: int) -> jnp.ndarray:
    """Inverse of patchify: [B, num_patches, P^ndim · C] → [B, prod(grid), C]."""
    b = x.shape[0]
    p = patch_size
    if len(grid_shape) == 2:
        h, w = grid_shape
        x = x.reshape(b, h // p, w // p, p, p, channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * w, channels)
    h, w, d = grid_shape
    x = x.reshape(b, h // p, w // p, d // p, p, p, p, channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, h * w * d, channels)


class GAOT(nn.Module):
    """Full GAOT model. Construct via model config + channel counts."""

    input_size: int
    output_size: int
    config: ModelConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        magno = cfg.args.magno
        transformer = cfg.args.transformer
        self.coord_dim = magno.coord_dim
        self.grid_shape = tuple(cfg.latent_tokens_size)
        if len(self.grid_shape) != self.coord_dim:
            raise ValueError(
                f"latent_tokens_size {self.grid_shape} must have {self.coord_dim} dims")
        self.patch_size = transformer.patch_size
        for s in self.grid_shape:
            if s % self.patch_size:
                raise ValueError(
                    f"grid {self.grid_shape} not divisible by patch {self.patch_size}")
        self.node_latent_size = magno.lifting_channels
        self.patch_volume = self.patch_size ** self.coord_dim
        self.positional_embedding = transformer.positional_embedding

        self.encoder = MAGNOEncoder(
            in_channels=self.input_size,
            out_channels=self.node_latent_size,
            config=magno,
            agno_out_channels=self.node_latent_size,
            dtype=self.dtype,
        )
        self.patch_linear = nn.Dense(
            self.patch_volume * self.node_latent_size, dtype=self.dtype)
        self.processor = Transformer(
            output_size=self.patch_volume * self.node_latent_size,
            config=transformer,
            dtype=self.dtype,
        )
        self.decoder = MAGNODecoder(
            in_channels=self.node_latent_size,
            out_channels=self.output_size,
            config=magno,
            agno_out_channels=self.node_latent_size,
            dtype=self.dtype,
        )

        positions = patch_positions(self.grid_shape, self.patch_size)
        embed_dim = self.patch_volume * self.node_latent_size
        # Host constant (NumPy, not jnp): setup may run under different traces
        # when the module is bound and reused; a device array created here
        # would leak tracers across jit boundaries.
        self.pos_emb = absolute_embeddings(positions, embed_dim)

    def encode(self, x_coord, pndata, latent_tokens_coord, encoder_graphs,
               training=False, tgraphs=None):
        return self.encoder(x_coord, pndata, latent_tokens_coord,
                            encoder_graphs, training=training, tgraphs=tgraphs)

    def process(self, rndata: jnp.ndarray, condition: Optional[jnp.ndarray] = None,
                training: bool = False) -> jnp.ndarray:
        """UViT over patch tokens (reference src/model/gaot.py:145-233)."""
        c = rndata.shape[-1]
        tokens = patchify(rndata, self.grid_shape, self.patch_size)
        tokens = shard_queries(self.patch_linear(tokens))
        use_rope = self.positional_embedding == "rope"
        if not use_rope:
            tokens = tokens + jnp.asarray(self.pos_emb, dtype=tokens.dtype)
        tokens = self.processor(tokens, condition=condition, use_rope=use_rope,
                                deterministic=not training)
        return unpatchify(tokens, self.grid_shape, self.patch_size, c)

    def decode(self, latent_tokens_coord, rndata, query_coord, decoder_graphs,
               training=False, tgraphs=None):
        return self.decoder(latent_tokens_coord, rndata, query_coord,
                            decoder_graphs, training=training, tgraphs=tgraphs)

    def __call__(self,
                 latent_tokens_coord: jnp.ndarray,
                 xcoord: jnp.ndarray,
                 pndata: jnp.ndarray,
                 encoder_graphs: Sequence[PaddedGraph],
                 decoder_graphs: Sequence[PaddedGraph],
                 query_coord: Optional[jnp.ndarray] = None,
                 condition: Optional[jnp.ndarray] = None,
                 training: bool = False,
                 encoder_tgraphs=None,
                 decoder_tgraphs=None) -> jnp.ndarray:
        """Forward pass (reference src/model/gaot.py:248-305).

        latent_tokens_coord: [Q, d]; xcoord: [N, d] or [B, N, d];
        pndata: [B, N, Cin]; graphs: per-scale PaddedGraphs;
        query_coord: defaults to xcoord. Returns [B, M, Cout].
        """
        # shard_queries calls are spatial-parallelism hints (parallel/spatial
        # .py): no-ops by default; with setup.spatial_parallel they shard the
        # latent-token / output-query axis over the mesh's 'model' axis.
        rndata = shard_queries(self.encode(
            xcoord, pndata, latent_tokens_coord, encoder_graphs,
            training=training, tgraphs=encoder_tgraphs))
        rndata = self.process(rndata, condition=condition, training=training)
        if query_coord is None:
            query_coord = xcoord
        return shard_queries(self.decode(
            latent_tokens_coord, rndata, query_coord, decoder_graphs,
            training=training, tgraphs=decoder_tgraphs))
