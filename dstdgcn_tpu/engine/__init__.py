from . import checkpoint, losses
from .engine import PredictionEngine, TrainState, steplr

__all__ = ["checkpoint", "losses", "PredictionEngine", "TrainState",
           "steplr"]
