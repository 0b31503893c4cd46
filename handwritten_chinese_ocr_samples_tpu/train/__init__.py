from .step import (  # noqa: F401
    TrainState, create_train_state, make_train_step, make_eval_step,
    adjust_learning_rate, make_optimizer,
)
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
