"""Argument-parser plumbing.

Behavioral parity with the reference's ``utils/argparse_utils.py:4-46``:
- ``MyArgumentParser`` exposes ``.add`` as an alias of ``add_argument`` and
  understands the ``action='store_bool'`` pseudo-action, which registers a
  ``--flag`` / ``--no-flag`` pair writing True/False into the same dest.
"""

from __future__ import annotations

import argparse


class _StoreBoolTrue(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, True)


class _StoreBoolFalse(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, False)


class MyArgumentParser(argparse.ArgumentParser):
    """argparse.ArgumentParser + ``.add`` alias + ``store_bool`` action.

    ``parser.add('--x', action='store_bool', default=True)`` registers both
    ``--x`` (sets True) and ``--no-x`` (sets False); the recorded default is
    whatever ``default=`` said.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.add = self.add_argument

    def add_argument(self, *args, **kwargs):  # noqa: D401
        if kwargs.get("action") == "store_bool":
            kwargs.pop("action")
            default = kwargs.pop("default", None)
            required = kwargs.pop("required", False)
            help_msg = kwargs.pop("help", None)

            flags = [a for a in args if a.startswith("--")]
            if not flags:
                raise ValueError("store_bool needs a --flag style option")
            neg_flags = ["--no-" + f[2:] for f in flags] + [
                "--no_" + f[2:] for f in flags if "-" not in f[2:]
            ]
            # Deduplicate while preserving order.
            neg_flags = list(dict.fromkeys(neg_flags))

            dest = kwargs.pop("dest", None) or flags[0][2:].replace("-", "_")
            group = super().add_mutually_exclusive_group(required=required)
            group.add_argument(
                *flags, dest=dest, nargs=0, action=_StoreBoolTrue,
                help=help_msg, **kwargs)
            group.add_argument(
                *neg_flags, dest=dest, nargs=0, action=_StoreBoolFalse,
                help=argparse.SUPPRESS, **kwargs)
            self.set_defaults(**{dest: default})
            return group
        return super().add_argument(*args, **kwargs)


def flag_given(argv, flag):
    """True when ``flag`` appears in ``argv`` either as a bare option or in
    ``--flag=value`` form.  Exact-string membership misses the equals form,
    silently overriding an explicitly pinned value (ADVICE r4)."""
    return any(a == flag or a.startswith(flag + "=") for a in argv)
