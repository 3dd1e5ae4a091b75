from .schedule import staged_cyclic_lr
from .step import TrainState, init_train_state, make_train_step, loss_fn

__all__ = ["TrainState", "init_train_state", "loss_fn", "make_train_step", "staged_cyclic_lr"]
