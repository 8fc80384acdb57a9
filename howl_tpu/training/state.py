"""Train state: params + batch stats + AdamW with exponential LR decay.

(ref: training/run/train.py:256 — AdamW(lr, weight_decay); train.py:306-307 —
lr *= lr_decay once per epoch. optax.exponential_decay with
``staircase=True`` and ``transition_steps=steps_per_epoch`` reproduces that
schedule exactly.)
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    dropout_key: Any = None
    schedule: Any = struct.field(pytree_node=False, default=None)

    @property
    def learning_rate(self):
        return self.schedule(self.step) if self.schedule is not None else None


def create_train_state(
    model,
    rng: jax.Array,
    example_feats,
    learning_rate: float,
    weight_decay: float = 0.0,
    lr_decay: float = 1.0,
    steps_per_epoch: int = 1,
    extra_init_kwargs: Optional[dict] = None,
) -> TrainState:
    params_key, dropout_key = jax.random.split(rng)
    variables = model.init(
        {"params": params_key, "dropout": dropout_key},
        example_feats,
        train=False,
        **(extra_init_kwargs or {}),
    )
    schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=lr_decay,
        staircase=True,
    )
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        dropout_key=dropout_key,
        schedule=schedule,
    )


def param_count(state: TrainState) -> int:
    return sum(x.size for x in jax.tree.leaves(state.params))
