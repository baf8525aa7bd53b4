from .schedule import ReduceLROnPlateau, EarlyStopping
from .state import (TrainState, create_train_state, make_optimizer,
                    set_learning_rate, get_learning_rate)
from .checkpoint import (save_checkpoint, load_checkpoint, save_model_pair,
                         save_train_state, load_train_state)
from .loop import Trainer
from .logging import RunLogger, run_dir_name
from .fit import fit

__all__ = [
    "ReduceLROnPlateau", "EarlyStopping", "TrainState", "create_train_state",
    "make_optimizer", "set_learning_rate", "get_learning_rate",
    "save_checkpoint", "load_checkpoint", "save_model_pair", "Trainer",
    "RunLogger", "run_dir_name", "fit",
]
