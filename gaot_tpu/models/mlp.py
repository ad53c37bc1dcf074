"""MLP building blocks (Flax).

Functional equivalents of the reference MLP zoo (src/model/layers/mlp.py):
- LinearChannelMLP (kernel MLPs inside AGNO; reference lines 307-337)
- ChannelMLP (pointwise lifting/projection/recovery; reference lines 227-305 —
  the reference uses 1x1 Conv1d, which on TPU is just a Dense over the channel
  axis and compiles straight onto the MXU)
- ConditionedNorm (time-conditioned scale/bias; reference lines 74-124)
- SimpleMLP (generic small MLP; reference lines 41-72)
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _gelu_auto(x: jnp.ndarray) -> jnp.ndarray:
    """GELU whose branch follows the compute dtype.

    The reference uses exact (erf) GELU (F.gelu default, mlp.py:253). On TPU
    XLA expands exact erf into a ~40-op f32 polynomial; on the per-edge
    kernel-MLP tensors of the vx path that costs ~10 ms/step (measured:
    bucketed train_step 130 -> 119.5 ms with tanh GELU). The tanh
    approximation's error (~1e-3 relative) is below bf16 rounding noise, so
    bf16 activations take the cheap branch while fp32 (the convergence-parity
    configuration) keeps the exact erf for bit-faithful reference parity.
    """
    approx = x.dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approx)


class LinearChannelMLP(nn.Module):
    """Dense stack: features[i] outputs per layer, non-linearity between layers."""

    features: Sequence[int]
    non_linearity: Callable = _gelu_auto
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.features)
        for i, width in enumerate(self.features):
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1:
                x = self.non_linearity(x)
        return x


class ChannelMLP(nn.Module):
    """Pointwise channel MLP: n_layers Dense layers over the trailing axis."""

    out_channels: int
    hidden_channels: Optional[int] = None
    n_layers: int = 2
    non_linearity: Callable = _gelu_auto
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.hidden_channels or self.out_channels
        for i in range(self.n_layers):
            width = self.out_channels if i == self.n_layers - 1 else hidden
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < self.n_layers - 1:
                x = self.non_linearity(x)
        return x


class ScaleWeightMLP(nn.Module):
    """Two-linear scale-weight head: Dense -> ReLU -> Dense.

    Mirrors the reference's raw ``nn.Sequential(Linear, ReLU, Linear)``
    used for learned multiscale weights (src/model/layers/magno.py:150-156).
    """

    num_scales: int
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden_size, dtype=self.dtype, name="fc0")(x))
        return nn.Dense(self.num_scales, dtype=self.dtype, name="fc1")(h)


class SimpleMLP(nn.Module):
    """Generic MLP; with num_layers <= 2 collapses to a single Dense
    (matching reference MLP semantics, src/model/layers/mlp.py:49-59)."""

    output_size: int
    hidden_size: int = 64
    num_layers: int = 3
    activation: Callable = nn.silu
    use_activation: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.num_layers <= 2:
            return nn.Dense(self.output_size, kernel_init=self.kernel_init,
                            dtype=self.dtype)(x)
        x = nn.Dense(self.hidden_size, kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.use_activation:
            x = self.activation(x)
        for _ in range(self.num_layers - 2):
            x = nn.Dense(self.hidden_size, kernel_init=self.kernel_init, dtype=self.dtype)(x)
            if self.use_activation:
                x = self.activation(x)
        return nn.Dense(self.output_size, kernel_init=self.kernel_init, dtype=self.dtype)(x)


class ConditionedNorm(nn.Module):
    """Time-conditioned scale/bias: x * (1 + c·S(c)) + c·B(c).

    c: [batch, 1]; x: [batch, seq, features]. Scale/bias MLPs use small-normal
    init so the correction starts near identity (reference
    src/model/layers/mlp.py:103-124).
    """

    output_size: int
    hidden_size: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, c: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.01)
        scale = SimpleMLP(self.output_size, self.hidden_size, num_layers=2,
                          kernel_init=init, dtype=self.dtype, name="mlp_scale")(c)
        bias = SimpleMLP(self.output_size, self.hidden_size, num_layers=2,
                         kernel_init=init, dtype=self.dtype, name="mlp_bias")(c)
        scale = 1.0 + c * scale
        bias = c * bias
        return x * scale[:, None, :] + bias[:, None, :]
