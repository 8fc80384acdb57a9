"""Config-driven training CLI (ref: training/run/refactored_train.py —
a stub there; functional here via the Trainer).

Usage:
    python -m howl_tpu.training.run.refactored_train --training_config config.json
"""

from __future__ import annotations

import sys

from howl_tpu.config import TrainingConfig
from howl_tpu.trainer import Trainer
from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt


def run(args=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--training_config", "--config", type=str, required=True, help="path to TrainingConfig json"),
        opt("--eval", action="store_true"),
    )
    args, extra = apb.parser.parse_known_args(args)
    cfg = TrainingConfig.parse_file(args.training_config)
    trainer = Trainer(cfg)
    return trainer.evaluate(extra) if args.eval else trainer.train(extra)


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
