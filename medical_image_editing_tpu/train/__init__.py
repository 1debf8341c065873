"""Train states and jitted step functions (the trainer layer).

The reference's PyTorch-Lightning trainers (`src/trainers/`) become pure
step functions over an explicit `TrainState` pytree, compiled once with
`jax.jit` (single chip) or `shard_map` over a data mesh (multi-chip)."""

from .state import TrainState, make_optimizer, create_train_state
from .first_stage import make_first_stage_step, init_codebook_step
from .second_stage import SecondStageLossConfig, make_second_stage_step
from .multi_window import (
    make_joint_step,
    make_multi_window_first_stage_step,
    make_multi_window_second_stage_step,
)
from .vqgan_stage import make_vqgan_step
from .prior import (
    PriorTrainState,
    create_prior_state,
    make_prior_sampler,
    make_prior_train_step,
)
from .trainer import Trainer
