"""LR schedule: IterExponential (reference src/util/lr_scheduler.py:7-32).

Linear warmup 0 -> 1 over warmup_steps, then exponential decay reaching
final_ratio at total_iter_length, constant afterwards. Returned as an optax
schedule (multiplies the base lr).
"""

from __future__ import annotations

import jax.numpy as jnp


def iter_exponential_schedule(
    base_lr: float,
    total_iter_length: int,
    final_ratio: float = 0.01,
    warmup_steps: int = 100,
):
    decay_steps = max(total_iter_length - warmup_steps, 1)
    log_final = jnp.log(final_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        decay = jnp.exp(progress * log_final)
        mult = jnp.where(step < warmup_steps, warm, decay)
        return base_lr * mult

    return schedule
