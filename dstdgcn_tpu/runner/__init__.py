"""Runner factory, parity with reference ``runner/__init__.py:6-11``."""

from .action_runner import ActionRunner, CMURunner, H36MRunner
from .base import BaseRunner
from .simple_runner import PW3DRunner, SimpleRunner, SyntheticRunner

_RUNNERS = {
    "h36m": H36MRunner,
    "cmu": CMURunner,
    "3dpw": PW3DRunner,
    "synthetic": SyntheticRunner,
}


def get_runner(name: str, config):
    if name not in _RUNNERS:
        raise ValueError(f"unknown runner {name!r}")
    return _RUNNERS[name](config)


__all__ = ["get_runner", "BaseRunner", "ActionRunner", "H36MRunner",
           "CMURunner", "PW3DRunner", "SimpleRunner", "SyntheticRunner"]
