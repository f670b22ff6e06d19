"""NN building blocks (flax.linen, channels-last).

Functional spec: /root/reference/network/models/blocks.py.  1x1 convolutions
over [B, C, N] become `nn.Dense` over the trailing channel of [B, N, C] —
the same matmul, laid out so XLA tiles (B*N, C) x (C, C') onto the MXU.

Norm-momentum convention: flax BatchNorm uses `running = m*running +
(1-m)*batch`, torch uses `running += m_torch * (batch - running)`; pass
`bn_momentum = 1 - m_torch` (the trainer handles the reference's momentum
decay schedule, trainer.py:135-145).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

xavier = nn.initializers.xavier_uniform()


def _activation(name: str):
    return {
        "relu": nn.relu,
        "lrelu": lambda x: nn.leaky_relu(x, 0.2),
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "softplus": nn.softplus,
        "none": lambda x: x,
    }[name]


class PointMLP(nn.Module):
    """Stack of per-point Dense layers: conv -> (dropout) -> norm -> acti
    (reference get_conv_block ordering, blocks.py:89-103; get_point_mlp,
    blocks.py:118-135).

    dims: all layer widths including the output layer.
    norm: 'bn' | 'gn' | 'none' applied to every layer except the last
    (unless last_norm).  final_acti applies to the last layer only.
    """
    dims: Sequence[int]
    norm: str = "bn"
    final_acti: str = "none"
    last_norm: bool = False
    dropout: float | None = None
    bn_momentum: float = 0.9  # flax convention (= 1 - torch 0.1)
    dtype: jnp.dtype | None = None  # compute dtype (bfloat16 on TPU)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, d in enumerate(self.dims):
            last = i == len(self.dims) - 1
            x = nn.Dense(d, kernel_init=xavier, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.dropout and not last:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            norm = self.norm if (not last or self.last_norm) else "none"
            if norm == "bn":
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=self.bn_momentum, dtype=self.dtype,
                                 name=f"norm_{i}")(x)
            elif norm == "gn":
                # reference GroupNorm uses 2 channels per group
                # (blocks.py:69-73) and torch's eps=1e-5 (flax defaults to
                # 1e-6, which diverges on near-zero-variance groups);
                # statistics in f32 regardless of dtype
                x = nn.GroupNorm(num_groups=None, group_size=2, epsilon=1e-5,
                                 dtype=self.dtype, name=f"norm_{i}")(x)
            elif norm != "none":
                raise ValueError(f"unknown norm {norm!r} (bn|gn|none)")
            x = _activation("relu" if not last else self.final_acti)(x)
        return x
