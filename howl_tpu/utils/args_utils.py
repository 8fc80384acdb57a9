"""Thin argparse builder (capability parity: howl/utils/args_utils.py:34)."""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


@dataclass
class ArgOption:
    """One argparse option: positional names + keyword config."""

    names: Tuple[str, ...]
    kwargs: Dict[str, Any] = field(default_factory=dict)


def opt(*names, **kwargs) -> ArgOption:
    return ArgOption(names, kwargs)


class ArgumentParserBuilder:
    """Accumulates options, builds a parser; mirrors reference ergonomics."""

    def __init__(self, **parser_kwargs):
        self.parser = argparse.ArgumentParser(**parser_kwargs)

    def add_options(self, *options: ArgOption) -> "ArgumentParserBuilder":
        for option in options:
            self.parser.add_argument(*option.names, **option.kwargs)
        return self

    def build(self) -> argparse.ArgumentParser:
        return self.parser
