"""Live demo: workspace model + microphone (or WAV replay) client
(ref: training/run/demo.py:16-58)."""

from __future__ import annotations

import sys
from pathlib import Path

from howl_tpu.client.howl_client import FileAudioSource, HowlClient
from howl_tpu.models import MODEL_REGISTRY
from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt


def run(args=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--model", type=str, choices=sorted(MODEL_REGISTRY), default=None),
        opt("--workspace", type=str, default=str(Path("workspaces") / "default")),
        opt("--wav", type=str, nargs="+", default=None, help="replay WAV files instead of the microphone"),
        opt("--incremental", action="store_true",
            help="serve with the incremental engine (featurize only each hop's new audio)"),
        opt("--streaming-trunk", action="store_true",
            help="serve with the streaming-trunk engine (res8: per-layer conv caches, "
                 "cheapest per-step path, +250 ms decision lag)"),
    )
    args = apb.parser.parse_args(args)
    if args.incremental and args.streaming_trunk:
        apb.parser.error("--incremental and --streaming-trunk are mutually exclusive")

    source = FileAudioSource(args.wav) if args.wav else None
    client = HowlClient.from_workspace(
        args.workspace, args.model, source=source,
        incremental=args.incremental, streaming_trunk=args.streaming_trunk,
    )
    client.add_listener(lambda words: print(f"wakeword detected: {words}"))
    client.start().join()
    return client


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
