"""NN primitives: MLP factory, dim-matching layer, masked batch norm.

Re-designs of ``make_mlp`` / ``match_dims`` (reference
``Modules/utils.py:169-225``) and ``nn.BatchNorm1d`` on edge logits
(reference ``Modules/gnn_utils.py:179,209``) as flax.linen modules.
Numerics match torch: exact (erf) GELU, LayerNorm eps 1e-5, BatchNorm
momentum 0.1 / eps 1e-5 with unbiased running variance.  Default weight
init follows the reference's ``kaiming_init`` (``Modules/
training_utils.py:48-58``): zero biases, N(0, 1/sqrt(fan_in)) for each
MLP's first layer, N(0, sqrt(2)/sqrt(fan_in)) for the rest.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTIVATIONS: dict[str, Callable] = {
    "GELU": lambda x: jax.nn.gelu(x, approximate=False),
    "Tanh": jnp.tanh,
    "ReLU": jax.nn.relu,
    "SiLU": jax.nn.silu,
    "Sigmoid": jax.nn.sigmoid,
    "ELU": jax.nn.elu,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
}


def activation(name: str) -> Callable:
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}") from None


_PLAIN_CHECKPOINT_ALIASES: dict = {}


def maybe_remat(cls, cfg):
    """Remat-wrap a module class per ``cfg.remat``.

    The reference checkpoints every MLP application unconditionally
    (``Modules/gnn_utils.py:14-15``) because 100k-hit events exhaust GPU
    memory.  On TPU the padded events fit HBM comfortably at TrackML-1GeV
    scale, so the policy is a measured knob:

      * ``true``   — full recompute (reference parity): smallest memory,
        backward re-runs every MLP forward.
      * ``"dots"`` — ``dots_with_no_batch_dims_saveable``: matmul outputs
        are saved (they are what the MXU produced anyway), only the cheap
        elementwise tail (LayerNorm/GELU) is recomputed.
      * ``false``  — save everything; no recompute, most activation HBM.

    Every branch is aliased to the remat auto-name (``Checkpoint<cls>``)
    so the flax param tree — and therefore every saved checkpoint — is
    identical under any setting.
    """
    if cfg.remat == "dots":
        return nn.remat(
            cls,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if cfg.remat:
        return nn.remat(cls)
    alias = _PLAIN_CHECKPOINT_ALIASES.get(cls)
    if alias is None:
        alias = type("Checkpoint" + cls.__name__, (cls,), {})
        _PLAIN_CHECKPOINT_ALIASES[cls] = alias
    return alias


def _fanin_normal(scale: float):
    def init(key, shape, dtype=jnp.float32):
        # flax kernels are [fan_in, fan_out]
        return jax.random.normal(key, shape, dtype) * (scale / jnp.sqrt(shape[0]))
    return init

first_layer_init = _fanin_normal(1.0)
hidden_layer_init = _fanin_normal(math.sqrt(2.0))


class MLP(nn.Module):
    """``Dense -> [LayerNorm] -> act`` x (L-1) -> ``Dense [-> LN -> act]``.

    ``hidden_layers`` counts Dense layers, as in the reference
    ``make_mlp(hidden_layers=...)``; ``output_activation=None`` drops the
    trailing norm+activation (used by every scoring head).
    """

    hidden_size: int
    output_size: int
    hidden_layers: int
    hidden_activation: str = "GELU"
    output_activation: Optional[str] = "GELU"
    layer_norm: bool = False
    compute_dtype: Optional[str] = None  # "bfloat16" runs matmuls at 2x MXU
                                         # rate (params stay f32; LayerNorm
                                         # statistics stay f32)

    @nn.compact
    def __call__(self, x):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        in_dtype = x.dtype  # dtype-preserving: bf16 residual streams stay bf16
        act = activation(self.hidden_activation)
        sizes: Sequence[int] = (
            [self.hidden_size] * (self.hidden_layers - 1) + [self.output_size]
        )
        for i, size in enumerate(sizes[:-1]):
            kinit = first_layer_init if i == 0 else hidden_layer_init
            x = nn.Dense(size, kernel_init=kinit, dtype=dtype,
                         bias_init=nn.initializers.zeros)(x)
            if self.layer_norm:
                # dtype=compute keeps the whole MLP interior in the compute
                # dtype: LayerNorm's default (None) would promote back to
                # f32 against its f32 params, inserting an up/down cast
                # bounce around every hidden layer.
                x = nn.LayerNorm(epsilon=1e-5, dtype=dtype)(x)
            x = act(x)
        kinit = first_layer_init if len(sizes) == 1 else hidden_layer_init
        x = nn.Dense(sizes[-1], kernel_init=kinit, dtype=dtype,
                     bias_init=nn.initializers.zeros)(x)
        if self.output_activation is not None:
            if self.layer_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=dtype)(x)
            x = activation(self.output_activation)(x)
        return x.astype(in_dtype) if dtype is not None else x


class DebugPrint(nn.Module):
    """Debugging pass-through that prints tensor stats in forward
    (equivalent of the reference's ``PrintLayer``, ``utils.py:198-207``,
    but jit-safe via ``jax.debug.print``)."""

    tag: str = "debug"

    @nn.compact
    def __call__(self, x):
        jax.debug.print(
            self.tag + ": shape={s} mean={m} std={d}",
            s=x.shape, m=jnp.mean(x), d=jnp.std(x))
        return x


class MatchDims(nn.Module):
    """Single ``Dense -> [LN] -> [act]``: the gMRT cheap encoder
    (reference ``Modules/utils.py:209-225``)."""

    output_size: int
    output_activation: Optional[str] = "GELU"
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_size, kernel_init=first_layer_init,
                     bias_init=nn.initializers.zeros)(x)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        if self.output_activation is not None:
            x = activation(self.output_activation)(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm over a masked 1-D batch of scalars.

    Equivalent of ``nn.BatchNorm1d(1)`` regularizing edge-weight logits
    (reference ``Modules/gnn_utils.py:179,209``), but ignoring padded edge
    slots in the batch statistics.  Running stats live in the
    ``batch_stats`` collection; training mode uses (masked) batch stats and
    updates the running buffers with torch's momentum-0.1 / unbiased-var
    convention.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    # When set (pooled-space partition, parallel/graph_shard.py), the batch
    # is sharded across this mesh axis: moments psum so every device
    # normalizes with the GLOBAL batch statistics (exact parity with the
    # replicated computation up to summation order).
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, training: bool):
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((1,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((1,), jnp.float32))

        psum = (lambda v: jax.lax.psum(v, self.axis_name)) \
            if self.axis_name and not self.is_initializing() else (lambda v: v)
        if training:
            w = mask.astype(jnp.float32)
            n = jnp.maximum(psum(jnp.sum(w)), 1.0)
            mean = psum(jnp.sum(w * x)) / n
            var = psum(jnp.sum(w * jnp.square(x - mean))) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean = ra_mean.value[0]
            var = ra_var.value[0]

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale[0] + bias[0]
