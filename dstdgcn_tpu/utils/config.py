"""YAML experiment configuration.

Schema parity with the reference config system (``utils/misc.py:20-119`` and
the ``configs/dstdgcn/*.yaml`` layout): attribute/key hybrid access,
``!!python``-prefixed expression values, CLI overrides, and resolved-config
dumping.  Expressions are evaluated with a restricted namespace (numpy +
arithmetic) rather than the reference's bare ``eval``.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import numpy as np
import yaml

__all__ = ["EasyDict", "get_config", "save_config", "update_config"]


class EasyDict:
    """Dict with attribute access (reference utils/misc.py:20-55)."""

    def __init__(self, opt: Dict[str, Any]):
        object.__setattr__(self, "opt", opt)

    def __getattr__(self, name):
        opt = object.__getattribute__(self, "opt")
        if name in opt:
            return opt[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        self.opt[name] = value

    def __getitem__(self, name):
        return self.opt[name]

    def __setitem__(self, name, value):
        self.opt[name] = value

    def __contains__(self, item):
        return item in self.opt

    def __repr__(self):
        return repr(self.opt)

    def get(self, name, default=None):
        return self.opt.get(name, default)

    def keys(self):
        return self.opt.keys()

    def values(self):
        return self.opt.values()

    def items(self):
        return self.opt.items()

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self.opt)


_EXPR_GLOBALS = {"__builtins__": {}, "np": np, "list": list, "range": range,
                 "len": len, "min": min, "max": max, "sum": sum,
                 "sorted": sorted, "abs": abs, "int": int, "float": float}


def _resolve(config):
    if isinstance(config, dict):
        return {k: _resolve(v) for k, v in config.items()}
    if isinstance(config, list):
        return [_resolve(v) for v in config]
    if isinstance(config, str) and config.startswith("!!python"):
        return eval(config[len("!!python"):], dict(_EXPR_GLOBALS))
    return config


def get_config(config_file: str, config_names: List[str] | str = ()) \
        -> EasyDict:
    with open(config_file) as f:
        config = _resolve(yaml.safe_load(f))
    if isinstance(config_names, str):
        return EasyDict(config[config_names])
    for name in config_names:
        config = config[name]
    return EasyDict(config)


def update_config(config, args) -> None:
    """Recursively overwrite matching keys (utils/misc.py:90-105)."""
    if args is None:
        return
    if hasattr(args, "__dict__"):
        args = vars(args)
    for arg, val in args.items():
        if arg in config:
            config[arg] = val
    for val in (config.values() if hasattr(config, "values") else ()):
        if isinstance(val, dict):
            update_config(val, args)


def save_config(config, config_file: str, print_opts: bool = True,
                logger=None) -> None:
    opt = config.to_dict() if isinstance(config, EasyDict) else dict(config)
    opt = {k: v for k, v in opt.items() if k != "logger"}
    text = yaml.dump(opt, default_flow_style=False)
    with open(config_file, "w") as f:
        f.write(text)
    if print_opts:
        out = logger.info if logger is not None else print
        out("================= Options =================")
        out(text[:-1])
        out("===========================================")
