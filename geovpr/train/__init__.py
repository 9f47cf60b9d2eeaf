from geovpr.train.state import TrainState, create_train_state
from geovpr.train.optimizer import build_optimizer
from geovpr.train.steps import make_eval_step, make_train_step
from geovpr.train.loop import Trainer

__all__ = [
    "TrainState",
    "Trainer",
    "build_optimizer",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
]
