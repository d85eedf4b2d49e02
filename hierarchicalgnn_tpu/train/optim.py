"""Optimizer: AdamW(amsgrad) + StepLR + linear warmup + gradient clipping.

optax re-design of the reference training regime:
  * AdamW with amsgrad, betas (0.9, 0.999), eps 1e-8, torch's default
    weight decay 0.01 (reference ``edge_classifier_base.py:59-68``)
  * StepLR: lr *= factor every ``patience`` epochs (``:69-80``)
  * linear warmup over ``warmup`` global steps, enforced manually in the
    reference's ``optimizer_step`` (``:207-236``)
  * global-norm gradient clipping 0.5 set at Trainer level
    (``Notebooks/script.py:35``)
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lr_schedule(hparams: dict, steps_per_epoch: int):
    base_lr = hparams["lr"]
    warmup = hparams.get("warmup") or 0
    factor = hparams.get("factor", 1.0)
    patience = max(int(hparams.get("patience", 1)), 1)

    def schedule(step):
        epoch = step // steps_per_epoch
        decay = jnp.power(factor, (epoch // patience).astype(jnp.float32))
        if warmup:
            scale = jnp.minimum(1.0, (step + 1.0) / warmup)
        else:
            scale = 1.0
        return base_lr * decay * scale

    return schedule


def make_optimizer(hparams: dict, steps_per_epoch: int) -> optax.GradientTransformation:
    clip = hparams.get("gradient_clip_val", 0.5)
    chain = []
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    chain.extend([
        optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(1e-2),
        optax.scale_by_learning_rate(lr_schedule(hparams, steps_per_epoch)),
    ])
    return optax.chain(*chain)
