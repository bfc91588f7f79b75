"""Training: optimizer groups, schedules, train/eval steps, checkpointing."""

from eda_tpu.train.optim import make_optimizer, make_lr_schedules  # noqa: F401
from eda_tpu.train.step import TrainState, make_train_step, make_eval_step  # noqa: F401
