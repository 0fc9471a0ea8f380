"""Config system: YAML → attribute-access tree.

Parity: alphapose/utils/config.py:5-8 (YAML → EasyDict) with the same
section names (DATASET.{TRAIN,VAL,EVAL,TEST}, DATA_PRESET, MODEL, LOSS, AE,
AUXNET, RETRAIN, VAL, TRAIN, DETECTOR) so reference configs load unchanged.
easydict is not available in this environment; Cfg is a minimal equivalent
supporting attribute get/set, nesting, and runtime mutation
(ActiveLearning.py:91-94 mutates ANN paths; Optuna writes VAL.UNC_LAMBDA).
"""

from __future__ import annotations

import copy
from typing import Any

import yaml


class Cfg(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, Cfg):
            v = Cfg(v)
        elif isinstance(v, (list, tuple)):
            v = type(v)(Cfg(x) if isinstance(x, dict) and not isinstance(x, Cfg)
                        else x for x in v)
        super().__setitem__(k, v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def setdefault(self, k, default=None):
        if k not in self:
            self[k] = default          # routes through the wrapping setitem
        return self[k]

    def __deepcopy__(self, memo):
        return Cfg({k: copy.deepcopy(v, memo) for k, v in self.items()})


def update_config(config_file: str) -> Cfg:
    """Load a YAML experiment config (parity: config.py:5-8)."""
    with open(config_file) as f:
        return Cfg(yaml.safe_load(f))


def load_config_str(text: str) -> Cfg:
    return Cfg(yaml.safe_load(text))
