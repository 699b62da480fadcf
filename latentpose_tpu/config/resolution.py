"""Five-level argument resolution.

Parity with reference ``utils/utils.py:42-174``.  Resolution order, lowest to
highest priority:

    1. argparse defaults (registered by core CLI + each selected plugin)
    2. args stored inside ``--checkpoint_path`` (checkpoints carry their args)
    3. ``configs/<config_name>.yaml``
    4. ``custom_args`` passed programmatically
    5. the command line

Implemented, like the reference, as a multi-pass parse: first parse learns
``--config_name`` and ``--checkpoint_path``; checkpoint args then YAML then
custom args are folded in via ``parser.set_defaults``; the selected plugin
modules register their own args (two-phase parsing, reference
``utils/utils.py:126-149``); a final parse applies the command line on top.

YAML values support environment-variable interpolation (``${VAR}``), which the
reference gets from the ``yamlenv`` package (``utils/utils.py:167-174``).
"""

from __future__ import annotations

import copy
import logging
import os
from pathlib import Path

import yaml

from latentpose_tpu import registry

logger = logging.getLogger("latentpose_tpu.config")

MODULE_KINDS = ("embedders", "generators", "discriminators", "criterions",
                "metrics", "dataloaders", "runners")
# CLI flag name for each kind (singular in the reference: --generator etc.)
KIND_TO_FLAG = {
    "embedders": "embedder",
    "generators": "generator",
    "discriminators": "discriminator",
    "criterions": "criterions",
    "metrics": "metrics",
    "dataloaders": "dataloader",
    "runners": "runner",
}


def _expand_env(value):
    if isinstance(value, str):
        return os.path.expandvars(value)
    if isinstance(value, dict):
        return {k: _expand_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_expand_env(v) for v in value]
    return value


def load_yaml_config(config_name: str, configs_dir="configs"):
    path = Path(configs_dir) / f"{config_name}.yaml"
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    return _expand_env(cfg)


def peek_checkpoint_args(checkpoint_path: str):
    """Read only the saved args dict out of a checkpoint (cheap)."""
    from latentpose_tpu import checkpoint as ckpt_lib
    return ckpt_lib.peek_args(checkpoint_path)


def get_args_and_modules(parser, use_checkpoint_args=True, custom_args=None,
                         configs_dir="configs", argv=None):
    """Multi-pass parse implementing the 5-level resolution order.

    Returns ``(args, default_args, modules, checkpoint_args)`` where
    ``modules`` maps kind -> plugin module (or list of modules for
    criterions/metrics) and ``default_args`` is the parse with an empty
    command line (used for experiment auto-naming, reference
    ``tensorboard_logging.py:47-54``).
    """
    custom_args = dict(custom_args or {})

    # The passes mirror the reference's exact sequence
    # (utils/utils.py:82-122): custom args are defaults from the very
    # start, the YAML is discovered from CLI+custom, and the checkpoint
    # path may come from the CLI, the custom args, OR the YAML.
    if custom_args:
        parser.set_defaults(**custom_args)

    # Pass 1: learn config_name.
    args, _ = parser.parse_known_args(argv)

    # Level 3: YAML config becomes parser defaults (reference loads the
    # YAML before the checkpoint; a checkpoint-carried config_name does
    # not re-trigger YAML loading there, so neither does it here).
    yaml_cfg = {}
    if getattr(args, "config_name", ""):
        try:
            yaml_cfg = load_yaml_config(args.config_name, configs_dir)
        except FileNotFoundError:
            logger.warning("Could not load config %s", args.config_name)
    parser.set_defaults(**yaml_cfg)
    if custom_args:
        parser.set_defaults(**custom_args)

    # Pass 2: learn checkpoint_path (now resolvable from YAML/custom too).
    args, _ = parser.parse_known_args(argv)

    # Level 2: checkpoint args become parser defaults, below YAML/custom.
    checkpoint_args = None
    if use_checkpoint_args and getattr(args, "checkpoint_path", ""):
        try:
            checkpoint_args = peek_checkpoint_args(args.checkpoint_path)
        except FileNotFoundError:
            logger.warning("Checkpoint %s not found; ignoring its args",
                           args.checkpoint_path)
    if checkpoint_args:
        parser.set_defaults(**checkpoint_args)
    parser.set_defaults(**yaml_cfg)
    if custom_args:
        parser.set_defaults(**custom_args)

    # Pass 3: learn the selected module names (a checkpoint may carry
    # them — the resume path).
    args, _ = parser.parse_known_args(argv)

    # Two-phase parsing: let every selected plugin register its own args.
    modules = {}
    for kind in MODULE_KINDS:
        flag = KIND_TO_FLAG[kind]
        name = getattr(args, flag, "") or ""
        if not name:
            modules[kind] = [] if kind in ("criterions", "metrics") else None
            continue
        if kind in ("criterions", "metrics"):
            mods = [registry.load_module(kind, n.strip())
                    for n in name.split(",") if n.strip()]
            for m in mods:
                m.Wrapper.get_args(parser)
            modules[kind] = mods
        else:
            m = registry.load_module(kind, name)
            m.Wrapper.get_args(parser)
            modules[kind] = m

    # Re-apply levels 2-4 so that plugin-registered args also honor them
    # (all checkpoint args are injected, known or not — reference
    # utils.py:154-157 semantics: args travel inside the checkpoint).
    if checkpoint_args:
        parser.set_defaults(**checkpoint_args)
    parser.set_defaults(**yaml_cfg)
    if custom_args:
        parser.set_defaults(**custom_args)

    # Final parses: level 5 (CLI) on top; and the all-defaults namespace.
    default_args = copy.deepcopy(parser.parse_args([]))
    args = parser.parse_args(argv)

    # Dynamic default (reference utils.py:160-163): an experiment inherits
    # the config's name unless explicitly named.  The auto-postfix namer
    # (utils/logging_writer.get_experiment_name) only fires when BOTH are
    # empty, matching the reference's setup_logging.
    if not getattr(args, "experiment_name", ""):
        args.experiment_name = args.config_name
    return args, default_args, modules, checkpoint_args
