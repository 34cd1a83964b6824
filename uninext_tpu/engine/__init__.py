from .train import TrainState, create_train_state, make_train_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
from .events import EventStorage, JSONWriter, TerminalWriter  # noqa: F401
