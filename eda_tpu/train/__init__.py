"""Training: optimizer groups, schedules, train/eval steps, checkpointing."""

from eda_tpu.train.optim import make_optimizer, make_lr_schedules  # noqa: F401
from eda_tpu.train.step import (  # noqa: F401
    TrainState,
    make_eval_score_step,
    make_eval_step,
    make_train_step,
)
