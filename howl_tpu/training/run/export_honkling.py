"""Export a trained model's weights as honkling (browser JS) JSON
(ref: training/run/export_honkling.py:9-36).

The reference dumps a torch state_dict; honkling expects torch tensor layouts,
so flax parameters are converted: Conv kernels (H, W, I, O) -> (O, I, H, W),
Dense kernels (in, out) -> (out, in), BatchNorm batch_stats -> running_mean /
running_var, plus the synthetic scale entries honkling's RES8 loader expects.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from howl_tpu.utils.args_utils import ArgumentParserBuilder, opt
from howl_tpu.utils.logger import Logger


def res8_variables_to_torch_dict(variables: dict) -> dict:
    """Map our res8 flax variables onto the reference res8 state_dict names
    (ref howl/model/cnn.py:113-125: conv0..conv6, bn1..bn6, output)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = {}
    for i in range(7):
        kernel = np.asarray(params[f"conv{i}"]["kernel"])  # (H, W, I, O)
        out[f"conv{i}.weight"] = kernel.transpose(3, 2, 0, 1).tolist()
    for i in range(1, 7):
        bn = stats.get(f"bn{i}", {})
        out[f"bn{i}.running_mean"] = np.asarray(bn["mean"]).tolist()
        out[f"bn{i}.running_var"] = np.asarray(bn["var"]).tolist()
        out[f"bn{i}.num_batches_tracked"] = 0
    out["output.weight"] = np.asarray(params["output"]["kernel"]).T.tolist()
    out["output.bias"] = np.asarray(params["output"]["bias"]).tolist()
    return out


def generic_variables_to_dict(variables: dict) -> dict:
    """Fallback: flatten any variables pytree to dotted names, torch layouts."""
    import jax

    out = {}
    for collection, tree in variables.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            name = ".".join(str(getattr(k, "key", k)) for k in path)
            arr = np.asarray(leaf)
            if name.endswith("kernel") and arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif name.endswith("kernel") and arr.ndim == 2:
                arr = arr.T
            prefix = "" if collection == "params" else f"{collection}."
            out[prefix + name] = arr.tolist()
    return out


def run(args=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()  # honor JAX_PLATFORMS=cpu for a pure format conversion

    apb = ArgumentParserBuilder()
    apb.add_options(
        opt("--input-file", "-i", type=str, required=True, help="model .flax checkpoint"),
        opt("--output-file", "-o", type=str, required=True),
        opt("--name", type=str, required=True, help="honkling model name (e.g. RES8)"),
        opt("--model", type=str, default="res8"),
        opt("--num-labels", type=int, default=4),
    )
    args = apb.parser.parse_args(args)

    import flax
    import jax

    from howl_tpu.models import create_model
    from howl_tpu.training.step import StepConfig, featurize
    from howl_tpu.ops.frontend import FrontendConfig

    model = create_model(args.model, num_labels=args.num_labels)
    cfg = StepConfig(frontend=FrontendConfig.from_settings(), zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False)
    feats0 = featurize(np.zeros((1, 8000), np.float32), cfg)
    template = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    variables = flax.serialization.from_bytes(template, Path(args.input_file).read_bytes())

    if args.model == "res8":
        json_dict = res8_variables_to_torch_dict(variables)
        if args.name == "RES8":
            # honkling's RES8 loader expects these scale entries (ref :24-27)
            for key in ("scale1.scale", "scale3.scale", "scale5.scale"):
                json_dict[key] = np.ones(45).tolist()
    else:
        json_dict = generic_variables_to_dict(variables)

    with Path(args.output_file).open("w") as f:
        f.write(f"weights['{args.name}'] = ")
        json.dump(json_dict, f)
    Logger.info(f"wrote {len(json_dict)} tensors to {args.output_file}")


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
