"""Import trained reference (castorini/howl) torch workspaces.

The reference persists torch state_dicts (``model.pt.bin`` /
``model-best.pt.bin``, ref howl/workspace.py:56-67), scalar ZMUV buffers
(``zmuv.pt.bin``, ref howl/data/transform/operator.py:119-125) and a settings
snapshot (``settings.json``, ref workspace.py:69-81). This module converts
such a workspace into a howl_tpu one, so models trained with the reference —
including the published ``hey_fire_fox`` res8 — serve on TPU without
retraining: ``hub.load_workspace_engine`` (and every serving engine behind
it) loads the imported workspace like a native one. Supported families:
res8, lstm, seq-lstm, gru, las (every architecture the reference trains;
mobilenet is excluded — its torchvision backbone has no flax counterpart
here, see PARITY.md).

Weight layout is the exact inverse of export_honkling's flax->torch mapping:
torch OIHW conv kernels -> flax HWIO, torch (out, in) linear kernels ->
flax (in, out), BatchNorm affine + running stats -> scale/bias +
batch_stats mean/var, torch LSTM/GRU gate stacks -> flax per-gate Dense
layers (see the per-family helpers). Logit parity against the actual
reference models is asserted per family in tests/test_torch_import.py.

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
SUPPORTED_IMPORT_FAMILIES = ("res8", "lstm", "seq-lstm", "gru", "las")


def reference_settings_to_dict(ref_data: dict) -> dict:
    """Reference settings.json (keys ``_audio``, ``_training``, ... — ref
    workspace.py:69-73 gather_dict over the SETTINGS sections) -> the key
    layout ``HowlSettings.load_dict`` consumes. Field names are shared (both
    sides preserve the reference's env-var names); reference-only fields are
    dropped by load_dict's known-field filter, and ``device`` is dropped here
    explicitly — it IS a howl_tpu field (a jax platform preference) but the
    reference's value is a torch device string like 'cuda:0'."""
    out = {}
    for key, value in ref_data.items():
        if isinstance(value, dict):
            out[key.lstrip("_")] = {k: v for k, v in value.items() if k != "device"}
    return out


def res8_torch_state_to_variables(state_dict: dict) -> dict:
    """Reference res8 state_dict (conv0..conv6 / bn1..bn6 / output, ref
    howl/model/cnn.py:113-145) -> flax variables for howl_tpu's Res8 (same
    parameter names, models/cnn.py). Inverse of
    export_honkling.res8_variables_to_torch_dict."""
    arr = _arr_fn(state_dict)
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


def _arr_fn(state_dict: dict):
    def arr(name):
        try:
            t = state_dict[name]
        except KeyError as e:
            raise ValueError(
                f"state_dict is missing {name!r} — unexpected reference checkpoint "
                f"layout (keys: {sorted(state_dict)[:8]}...)"
            ) from e
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)

    return arr


def _lstm_cell_params(arr, torch_prefix: str, suffix: str = "", input_perm=None) -> dict:
    """torch nn.LSTM layer-0 tensors -> flax OptimizedLSTMCell params.

    torch stacks gates [i, f, g, o] along dim 0 (4H, ...) with separate
    b_ih/b_hh; flax keeps per-gate Dense layers — i-side without bias, h-side
    carrying the (summed) bias. The gate equations are term-for-term equal.
    ``input_perm`` reorders the i-side input axis (flax index -> torch
    index) when the two sides flatten per-frame features differently."""
    w_ih = arr(f"{torch_prefix}.weight_ih_l0{suffix}")
    w_hh = arr(f"{torch_prefix}.weight_hh_l0{suffix}")
    b_ih = arr(f"{torch_prefix}.bias_ih_l0{suffix}")
    b_hh = arr(f"{torch_prefix}.bias_hh_l0{suffix}")
    gates = "ifgo"
    wi = dict(zip(gates, np.split(w_ih, 4, axis=0)))
    wh = dict(zip(gates, np.split(w_hh, 4, axis=0)))
    bi = dict(zip(gates, np.split(b_ih, 4, axis=0)))
    bh = dict(zip(gates, np.split(b_hh, 4, axis=0)))
    cell = {}
    for g in gates:
        wg = wi[g] if input_perm is None else wi[g][:, input_perm]
        cell[f"i{g}"] = {"kernel": wg.T}
        cell[f"h{g}"] = {"kernel": wh[g].T, "bias": bi[g] + bh[g]}
    return cell


def _gru_cell_params(arr, torch_prefix: str) -> dict:
    """torch nn.GRU layer-0 tensors -> flax GRUCell params. torch gate order
    is [r, z, n]. r/z sigmoids sum all four linear terms, so both torch
    biases fold into flax's i-side bias; the n gate keeps them split (torch
    computes tanh(W_in x + b_in + r*(W_hn h + b_hn)), exactly flax's form)."""
    w_ih = arr(f"{torch_prefix}.weight_ih_l0")
    w_hh = arr(f"{torch_prefix}.weight_hh_l0")
    b_ih = arr(f"{torch_prefix}.bias_ih_l0")
    b_hh = arr(f"{torch_prefix}.bias_hh_l0")
    gates = "rzn"
    wi = dict(zip(gates, np.split(w_ih, 3, axis=0)))
    wh = dict(zip(gates, np.split(w_hh, 3, axis=0)))
    bi = dict(zip(gates, np.split(b_ih, 3, axis=0)))
    bh = dict(zip(gates, np.split(b_hh, 3, axis=0)))
    return {
        "ir": {"kernel": wi["r"].T, "bias": bi["r"] + bh["r"]},
        "iz": {"kernel": wi["z"].T, "bias": bi["z"] + bh["z"]},
        "in": {"kernel": wi["n"].T, "bias": bi["n"]},
        "hr": {"kernel": wh["r"].T},
        "hz": {"kernel": wh["z"].T},
        "hn": {"kernel": wh["n"].T, "bias": bh["n"]},
    }


def _conv_ft(arr, name: str) -> np.ndarray:
    """torch Conv2d kernel over an UNPERMUTED (B, C, F, T) input -> flax HWIO
    with H=time: (O, I, kF, kT) -> (kT, kF, I, O). (res8 permutes to (time,
    freq) first, hence its different (2, 3, 1, 0) transpose.)"""
    return arr(name).transpose(3, 2, 1, 0)


def _linear(arr, name: str) -> dict:
    return {"kernel": arr(f"{name}.weight").T, "bias": arr(f"{name}.bias")}


def _bn(arr, name: str):
    """torch affine BatchNorm2d -> (flax params, flax batch_stats)."""
    params = {"scale": arr(f"{name}.weight"), "bias": arr(f"{name}.bias")}
    stats = {"mean": arr(f"{name}.running_mean"), "var": arr(f"{name}.running_var")}
    return params, stats


def lstm_torch_state_to_variables(state_dict: dict) -> dict:
    """Reference SimpleLstm / SequentialLstm (ref rnn.py:41-92): one nn.LSTM
    + Sequential(Linear, ReLU, Linear) head — identical layouts."""
    arr = _arr_fn(state_dict)
    return {
        "params": {
            "OptimizedLSTMCell_0": _lstm_cell_params(arr, "lstm"),
            "fc1": _linear(arr, "dnn.0"),
            "fc2": _linear(arr, "dnn.2"),
        }
    }


def gru_torch_state_to_variables(state_dict: dict) -> dict:
    """Reference SimpleGru (ref rnn.py:94-129): conv encoder Sequential
    [conv1, bn1, relu, maxpool, conv2, relu, bn2] + GRU + MLP head."""
    arr = _arr_fn(state_dict)
    bn1_p, bn1_s = _bn(arr, "conv_encoder.1")
    bn2_p, bn2_s = _bn(arr, "conv_encoder.6")
    params = {
        "conv1": {"kernel": _conv_ft(arr, "conv_encoder.0.weight"), "bias": arr("conv_encoder.0.bias")},
        "bn1": bn1_p,
        "conv2": {"kernel": _conv_ft(arr, "conv_encoder.4.weight"), "bias": arr("conv_encoder.4.bias")},
        "bn2": bn2_p,
        "GRUCell_0": _gru_cell_params(arr, "lstm_encoder"),
        "fc1": _linear(arr, "dnn.0"),
        "fc2": _linear(arr, "dnn.3"),
    }
    return {"params": params, "batch_stats": {"bn1": bn1_s, "bn2": bn2_s}}


def las_torch_state_to_variables(state_dict: dict) -> dict:
    """Reference LASClassifier (ref rnn.py:194-222): conv encoder Sequential
    [conv1, bn1, relu, maxpool, conv2, bn2, relu, maxpool] + 1-layer biLSTM
    + fixed-context attention + MLP head. Cell 0 is the forward direction,
    cell 1 the reverse (torch's ``_reverse`` tensors)."""
    arr = _arr_fn(state_dict)
    if "encoder.lstm_encoder.weight_ih_l1" in state_dict:
        raise NotImplementedError(
            "multi-layer LAS biLSTM checkpoints are not supported (the reference "
            "default is num_layers=1)"
        )
    bn1_p, bn1_s = _bn(arr, "encoder.conv_encoder.1")
    bn2_p, bn2_s = _bn(arr, "encoder.conv_encoder.5")
    # per-frame biLSTM inputs: torch flattens the conv output channel-major
    # (view of (T, B, C, F'): index c*F' + f, ref rnn.py:156-158), flax
    # freq-major ((B, T', F', C).reshape: f*C + c) — permute the ih columns
    n_ch = arr("encoder.conv2.weight").shape[0]
    i_total = arr("encoder.lstm_encoder.weight_ih_l0").shape[1]
    perm = np.arange(i_total).reshape(n_ch, i_total // n_ch).T.reshape(-1)
    params = {
        "encoder": {
            "conv1": {"kernel": _conv_ft(arr, "encoder.conv1.weight"), "bias": arr("encoder.conv1.bias")},
            "bn1": bn1_p,
            "conv2": {"kernel": _conv_ft(arr, "encoder.conv2.weight"), "bias": arr("encoder.conv2.bias")},
            "bn2": bn2_p,
            "OptimizedLSTMCell_0": _lstm_cell_params(arr, "encoder.lstm_encoder", input_perm=perm),
            "OptimizedLSTMCell_1": _lstm_cell_params(arr, "encoder.lstm_encoder", "_reverse", input_perm=perm),
        },
        "attn": {
            "context_vec": arr("attn.context_vec"),
            "v_proj": _linear(arr, "attn.v_proj"),
            "k_proj": _linear(arr, "attn.k_proj"),
        },
        "fc1": _linear(arr, "fc.0"),
        "fc2": _linear(arr, "fc.3"),
    }
    return {"params": params, "batch_stats": {"encoder": {"bn1": bn1_s, "bn2": bn2_s}}}


_FAMILY_CONVERTERS = {
    "res8": res8_torch_state_to_variables,
    "lstm": lstm_torch_state_to_variables,
    "seq-lstm": lstm_torch_state_to_variables,
    "gru": gru_torch_state_to_variables,
    "las": las_torch_state_to_variables,
}


def torch_state_to_variables(model_name: str, state_dict: dict) -> dict:
    converter = _FAMILY_CONVERTERS.get(model_name)
    if converter is None:
        raise NotImplementedError(
            f"torch checkpoint import is implemented for {SUPPORTED_IMPORT_FAMILIES}; "
            f"got {model_name!r}. Other families can be retrained with "
            "howl_tpu.training.run.train on the same datasets/recipes."
        )
    return converter(state_dict)


def _torch_load(path: Path):
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=True)


def is_reference_workspace(path) -> bool:
    """True when ``path`` holds a REFERENCE (torch) workspace: torch
    checkpoints present, or an underscore-keyed settings.json (the reference
    gather_dict layout, ref workspace.py:69-73)."""
    p = Path(path)
    if (p / "model-best.pt.bin").exists() or (p / "model.pt.bin").exists():
        return True
    settings = p / "settings.json"
    if settings.exists():
        try:
            data = json.loads(settings.read_text())
        except ValueError:
            return False
        return isinstance(data, dict) and bool(data) and all(k.startswith("_") for k in data)
    return False


def load_reference_workspace(src_path, model_name: Optional[str] = None, settings=None):
    """Read a reference workspace WITHOUT writing anything: returns
    (model_name, settings: HowlSettings, variables_by_best: {True/False: flax
    variables}, zmuv: ZmuvTransform | None). The in-memory half of
    ``import_reference_workspace`` — the hub uses it to serve reference
    checkouts (e.g. a real howl-models clone) directly. ``settings`` loads
    the snapshot into an existing HowlSettings (e.g. the global SETTINGS the
    frontend/engine configs read) instead of a fresh one."""
    from howl_tpu.ops.zmuv import ZmuvTransform
    from howl_tpu.settings import HowlSettings

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
    if model_name not in _FAMILY_CONVERTERS:
        raise NotImplementedError(
            f"torch checkpoint import is implemented for {SUPPORTED_IMPORT_FAMILIES}; "
            f"got {model_name!r}. Other families can be retrained with "
            "howl_tpu.training.run.train on the same datasets/recipes."
        )

    # settings snapshot: reference section keys carry a leading underscore
    if settings is None:
        settings = HowlSettings()
    settings.load_dict(reference_settings_to_dict(json.loads((src / "settings.json").read_text())))

    zmuv = None
    zmuv_path = src / "zmuv.pt.bin"
    if zmuv_path.exists():
        z = {k: float(np.asarray(v.detach().cpu() if hasattr(v, "detach") else v).reshape(-1)[0])
             for k, v in _torch_load(zmuv_path).items()}
        try:
            # strict: a zmuv file missing its stats must fail HERE, not serve
            # garbage-normalized features later (mean2=0 would give std~1e-6)
            zmuv = ZmuvTransform(z["mean"], z["mean2"], z["total"])
        except KeyError as e:
            raise ValueError(
                f"{zmuv_path} lacks the reference ZmuvTransform buffers "
                f"(total/mean/mean2, ref operator.py:119-125); found {sorted(z)}"
            ) from e

    variables_by_best = {}
    for fname, best in (("model-best.pt.bin", True), ("model.pt.bin", False)):
        path = src / fname
        if path.exists():
            variables_by_best[best] = torch_state_to_variables(model_name, _torch_load(path))
    if not variables_by_best:
        raise FileNotFoundError(f"{src} has neither model-best.pt.bin nor model.pt.bin")
    if True not in variables_by_best:
        # consumers default to best=True; a source with only the non-best
        # checkpoint still must serve
        variables_by_best[True] = variables_by_best[False]
    return model_name, settings, variables_by_best, zmuv


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
    from howl_tpu.workspace import Workspace

    model_name, settings, variables_by_best, zmuv = load_reference_workspace(src_path, model_name)

    workspace = Workspace(Path(dst_path), delete_existing=False)
    workspace.save_settings(settings)
    (workspace.path / "cmd-args.json").write_text(json.dumps({"model": model_name}))

    if zmuv is not None:
        workspace.save_zmuv(zmuv)
    for best, variables in variables_by_best.items():
        workspace.save_model(variables, best=best)
    return workspace
