from . import checkpoint, losses, solver
from .engine import PredictionEngine, TrainState, steplr
from .solver import make_optimizer

__all__ = ["checkpoint", "losses", "solver", "PredictionEngine",
           "TrainState", "steplr", "make_optimizer"]
