"""Dataloader factory (reference ``dataloaders/dataloader.py:13-15``):
name -> dataset plugin resolution through the registry."""

from __future__ import annotations

from latentpose_tpu import registry


class Dataloader:
    def __init__(self, name: str):
        self.module = registry.load_module("dataloaders", name)

    def get_args(self, parser):
        return self.module.Wrapper.get_args(parser)

    def get_dataloader(self, args, part: str, phase: str = "train"):
        return self.module.Wrapper.get_dataloader(args, part, phase)
