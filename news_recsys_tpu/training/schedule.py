"""Learning-rate schedules.

``hold_cosine_floor`` reproduces the reference's ``CosinDecayLR``
(``src/model/model_utils/lr_schedule.py:16-28``): constant ``lr`` until
``milestones[0]``, cosine decay from ``lr`` to ``min_lr`` between the two
milestones, constant ``min_lr`` after — expressed as an optax-compatible
``step -> lr`` schedule function usable inside a jitted update.
"""

from __future__ import annotations

import jax.numpy as jnp


def hold_cosine_floor(lr: float, min_lr: float, milestones) -> "callable":
    m0, m1 = int(milestones[0]), int(milestones[1])
    total_decay = max(1, m1 - m0)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        progress = jnp.clip((step - m0) / total_decay, 0.0, 1.0)
        cosine_factor = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        decayed = min_lr + (lr - min_lr) * cosine_factor
        return jnp.where(step < m0, lr, jnp.where(step >= m1, min_lr, decayed))

    return schedule
