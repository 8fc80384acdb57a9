"""Import trained reference (castorini/howl) torch workspaces.

The reference persists torch state_dicts (``model.pt.bin`` /
``model-best.pt.bin``, ref howl/workspace.py:56-67), scalar ZMUV buffers
(``zmuv.pt.bin``, ref howl/data/transform/operator.py:119-125) and a settings
snapshot (``settings.json``, ref workspace.py:69-81). This module converts
such a workspace into a howl_tpu one, so models trained with the reference —
including the published ``hey_fire_fox`` res8 — serve on TPU without
retraining: ``hub.load_workspace_engine`` (and every serving engine behind
it) loads the imported workspace like a native one.

Weight layout is the exact inverse of export_honkling's flax->torch mapping:
torch OIHW conv kernels -> flax HWIO, torch (out, in) linear kernels ->
flax (in, out), BatchNorm running_mean/running_var -> batch_stats mean/var
(the reference res8's BatchNorm is affine-less, ref howl/model/cnn.py:123,
so running stats are the only BN state). Logit parity against the actual
reference Res8 is asserted in tests/test_torch_import.py.

torch is imported lazily: the converter is the only part of the serving
stack that needs it, and only at migration time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

# model families with a torch->flax weight mapping; extend as mappings are
# validated (each needs a differential logit-parity test vs the reference)
SUPPORTED_IMPORT_FAMILIES = ("res8",)


def reference_settings_to_dict(ref_data: dict) -> dict:
    """Reference settings.json (keys ``_audio``, ``_training``, ... — ref
    workspace.py:69-73 gather_dict over the SETTINGS sections) -> the key
    layout ``HowlSettings.load_dict`` consumes. Field names are shared (both
    sides preserve the reference's env-var names); unknown reference-only
    fields (e.g. ``device``) are dropped by load_dict's known-field filter."""
    return {key.lstrip("_"): value for key, value in ref_data.items() if isinstance(value, dict)}


def res8_torch_state_to_variables(state_dict: dict) -> dict:
    """Reference res8 state_dict (conv0..conv6 / bn1..bn6 / output, ref
    howl/model/cnn.py:113-145) -> flax variables for howl_tpu's Res8 (same
    parameter names, models/cnn.py). Inverse of
    export_honkling.res8_variables_to_torch_dict."""

    def arr(name):
        try:
            t = state_dict[name]
        except KeyError as e:
            raise ValueError(
                f"state_dict is missing {name!r} — not a reference res8 checkpoint? "
                f"(keys: {sorted(state_dict)[:8]}...)"
            ) from e
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)

    params = {}
    stats = {}
    for i in range(7):
        # torch Conv2d (O, I, kh, kw) with input permuted to (B, 1, time,
        # freq) (ref cnn.py:129) -> flax HWIO with H=time, W=freq
        params[f"conv{i}"] = {"kernel": arr(f"conv{i}.weight").transpose(2, 3, 1, 0)}
    for i in range(1, 7):
        stats[f"bn{i}"] = {
            "mean": arr(f"bn{i}.running_mean"),
            "var": arr(f"bn{i}.running_var"),
        }
    params["output"] = {
        "kernel": arr("output.weight").T,  # (L, maps) -> (maps, L)
        "bias": arr("output.bias"),
    }
    return {"params": params, "batch_stats": stats}


def torch_state_to_variables(model_name: str, state_dict: dict) -> dict:
    if model_name == "res8":
        return res8_torch_state_to_variables(state_dict)
    raise NotImplementedError(
        f"torch checkpoint import is implemented for {SUPPORTED_IMPORT_FAMILIES} "
        f"(the reference's published-model family); got {model_name!r}. Other "
        "families can be retrained with howl_tpu.training.run.train on the same "
        "datasets/recipes."
    )


def _torch_load(path: Path):
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=True)


def import_reference_workspace(
    src_path, dst_path, model_name: Optional[str] = None
) -> "Workspace":  # noqa: F821 - forward ref, imported below
    """Convert a reference workspace directory into a howl_tpu workspace.

    Reads ``settings.json`` + ``zmuv.pt.bin`` + ``model{-best}.pt.bin`` from
    ``src_path`` and writes the howl_tpu equivalents (settings snapshot,
    zmuv.json, model{-best}.flax, cmd-args.json) into ``dst_path``. Returns
    the destination Workspace; load it with
    ``hub.load_workspace_engine(dst_path)``.
    """
    from howl_tpu.ops.zmuv import ZmuvTransform
    from howl_tpu.settings import HowlSettings
    from howl_tpu.workspace import Workspace

    src = Path(src_path)
    if not (src / "settings.json").exists():
        raise FileNotFoundError(f"{src} has no settings.json — not a reference workspace")

    if model_name is None:
        args_path = src / "cmd-args.json"
        if args_path.exists():
            model_name = json.loads(args_path.read_text()).get("model")
        if model_name is None:
            raise ValueError(
                "model_name not given and the source cmd-args.json is missing/has no "
                "'model' entry — pass the architecture explicitly (e.g. 'res8')"
            )

    # settings snapshot: reference section keys carry a leading underscore
    settings = HowlSettings()
    settings.load_dict(reference_settings_to_dict(json.loads((src / "settings.json").read_text())))

    workspace = Workspace(Path(dst_path), delete_existing=False)
    workspace.save_settings(settings)
    (workspace.path / "cmd-args.json").write_text(json.dumps({"model": model_name}))

    # zmuv: scalar (1,)-shaped buffers total/mean/mean2 (ref operator.py:119-125);
    # std is derived identically on both sides (sqrt(mean2 - mean^2))
    zmuv_path = src / "zmuv.pt.bin"
    if zmuv_path.exists():
        z = {k: float(np.asarray(v.detach().cpu() if hasattr(v, "detach") else v).reshape(-1)[0])
             for k, v in _torch_load(zmuv_path).items()}
        workspace.save_zmuv(ZmuvTransform(z.get("mean", 0.0), z.get("mean2", 0.0), z.get("total", 0.0)))

    converted = 0
    for fname, best in (("model-best.pt.bin", True), ("model.pt.bin", False)):
        path = src / fname
        if not path.exists():
            continue
        variables = torch_state_to_variables(model_name, _torch_load(path))
        workspace.save_model(variables, best=best)
        converted += 1
    if not converted:
        raise FileNotFoundError(f"{src} has neither model-best.pt.bin nor model.pt.bin")
    # hub.load_workspace_engine defaults to best=True; a source with only the
    # non-best checkpoint still must serve
    if not workspace.model_path(best=True).exists():
        workspace.save_model(
            torch_state_to_variables(model_name, _torch_load(src / "model.pt.bin")), best=True
        )
    return workspace
