"""Import a trained reference (castorini/howl) torch workspace for TPU serving.

Converts ``model{-best}.pt.bin`` + ``zmuv.pt.bin`` + ``settings.json`` (the
reference's workspace layout, ref howl/workspace.py:56-81) into a howl_tpu
workspace that ``hub.load_workspace_engine`` / demo / eval load natively —
migration without retraining for the published res8 family (see
howl_tpu/compat.py for the weight mapping and supported families).

Usage:
    python -m howl_tpu.training.run.import_workspace \
        -i /path/to/howl-models/howl/hey-fire-fox -o workspaces/hey-ff-tpu
"""

from __future__ import annotations

import sys

from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt
from howl_tpu.utils.logger import Logger


def run(args=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()  # honor JAX_PLATFORMS=cpu: this is a pure format conversion

    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--input-workspace", "-i", type=str, required=True,
            help="reference workspace dir (model-best.pt.bin, zmuv.pt.bin, settings.json)"),
        opt("--output-workspace", "-o", type=str, required=True),
        opt("--model", type=str, default=None,
            help="architecture name; defaults to the source cmd-args.json 'model' entry"),
    )
    args = apb.parser.parse_args(args)

    from howl_tpu.compat import import_reference_workspace

    workspace = import_reference_workspace(args.input_workspace, args.output_workspace, args.model)
    Logger.info(f"imported reference workspace into {workspace.path}")
    Logger.info("load it with howl_tpu.hub.load_workspace_engine or training.run.demo")


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
