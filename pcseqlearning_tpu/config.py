"""Config system: YAML files composed with ``_BASE_CONFIG_`` includes and
dotted-path CLI overrides.

Feature parity with the reference config system
(/root/reference/pcdet/config.py:16-89): ``cfg_from_yaml_file`` /
``cfg_from_list`` / ``merge_new_config`` / ``log_config_to_file`` and a global
``cfg`` namespace. Runs are composed from up to four YAML files (model,
dataset, optimizer, visualizer) exactly like the reference CLI
(/root/reference/tools/train.py:58-63).
"""

from __future__ import annotations

import ast
import os
from pathlib import Path

import yaml

from .utils.edict import EDict


def log_config_to_file(cfg_dict, pre="cfg", logger=None):
    for key, val in cfg_dict.items():
        if isinstance(val, EDict):
            if logger is not None:
                logger.info("----------- %s -----------" % key)
            log_config_to_file(val, pre=pre + "." + key, logger=logger)
            continue
        if logger is not None:
            logger.info("%s.%s: %s" % (pre, key, val))


def cfg_from_list(cfg_list, config):
    """Set config keys via a flat list ``[KEY, VALUE, KEY, VALUE, ...]``.

    Keys are dotted paths (e.g. ``MODEL.PREPROCESSORS.0.LR``); values are
    parsed with ``ast.literal_eval`` and type-checked against the existing
    entry, matching reference behavior (pcdet/config.py:16-50).
    """
    assert len(cfg_list) % 2 == 0, "override list must have even length"
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split(".")
        d = config
        for subkey in key_list[:-1]:
            if isinstance(d, (list, tuple)):
                d = d[int(subkey)]
            else:
                assert subkey in d, "NotFoundKey: %s" % subkey
                d = d[subkey]
        subkey = key_list[-1]
        try:
            value = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            value = v

        if isinstance(d, (list, tuple)):
            d[int(subkey)] = value
            continue

        assert subkey in d, "NotFoundKey: %s" % subkey
        if type(value) != type(d[subkey]) and not isinstance(d[subkey], (EDict, dict, type(None))):
            assert isinstance(value, type(d[subkey])) or isinstance(d[subkey], type(value)) or (
                isinstance(value, (int, float)) and isinstance(d[subkey], (int, float))
            ), "type mismatch for key %s: %r vs %r" % (k, type(value), type(d[subkey]))
        if isinstance(value, str) and "," in value and isinstance(d[subkey], list):
            value = [ast.literal_eval(x) for x in value.split(",")]
        d[subkey] = value


def merge_new_config(config, new_config, base_dir=None):
    """Recursively merge ``new_config`` into ``config``, resolving
    ``_BASE_CONFIG_`` includes first (reference: pcdet/config.py:53-70).

    The include path is tried as-is (CWD-relative, reference behavior),
    then relative to the including file's directory, then relative to the
    repo root — so configs load regardless of the caller's CWD."""
    if "_BASE_CONFIG_" in new_config:
        base = new_config["_BASE_CONFIG_"]
        candidates = [base]
        if base_dir is not None:
            candidates.append(os.path.join(base_dir, base))
        candidates.append(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), base))
        path = next((p for p in candidates if os.path.exists(p)), base)
        with open(path, "r") as f:
            yaml_config = yaml.safe_load(f)
        merge_new_config(config, EDict(yaml_config), base_dir=os.path.dirname(path))

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config:
            config[key] = EDict()
        merge_new_config(config[key], val, base_dir=base_dir)

    return config


def cfg_from_yaml_file(cfg_file, config):
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config=config, new_config=new_config or {},
                     base_dir=os.path.dirname(os.path.abspath(cfg_file)))
    return config


cfg = EDict()
cfg.ROOT_DIR = str(Path(__file__).resolve().parent.parent)
cfg.LOCAL_RANK = 0


def get_cfg():
    return cfg
