"""Every config/settings field must have a real consumer (VERDICT r3 #7).

Round 2 found a decorative ``use_meyda_spectrogram`` flag; round 3 found a
decorative ``per_frame`` flag (deleted — the reference never read it either,
ref howl/config.py:36). This tripwire makes the defect class structural:

  * fields of every dataclass in ``howl_tpu/config.py`` must be READ
    (ast.Load attribute access or a ``getattr`` literal) somewhere in the
    non-test package — the bridge reads in ``apply_to_settings`` count,
    because the settings check below keeps the chain honest;
  * fields of every dataclass in ``howl_tpu/settings.py`` must be READ
    somewhere OUTSIDE ``config.py``/``settings.py`` — a field that is only
    assigned by the config bridge but never read back is still decorative.

Matching is by attribute NAME, not by object, so a same-named attribute on
another class can mask a dead field (e.g. ``num_labels`` exists on several
types). That keeps the test dependency-free and zero-false-positive; it still
catches the per_frame class exactly (unique name, zero readers anywhere).
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "howl_tpu"

# Decorative in the REFERENCE itself; kept for env-var / settings-snapshot
# compatibility (``EVAL_WINDOW_SIZE_SECONDS`` appears in envs/*.env recipes):
#   eval_window_size_seconds: defined at ref howl/settings.py:62, never read
#   by any reference module either (grep: settings.py is its only occurrence).
ALLOWED_UNREAD_SETTINGS = {"eval_window_size_seconds"}
ALLOWED_UNREAD_CONFIG: set = set()


def _dataclass_fields(path: Path) -> set:
    fields = set()
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            is_dataclass = any(
                (isinstance(d, ast.Name) and d.id == "dataclass")
                or (isinstance(d, ast.Call) and isinstance(d.func, ast.Name) and d.func.id == "dataclass")
                for d in node.decorator_list
            )
            if not is_dataclass:
                continue
            for stmt in node.body:
                if isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
                    fields.add(stmt.target.id)
    return fields


def _attribute_reads(paths) -> set:
    reads = set()
    for path in paths:
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and isinstance(node.ctx, ast.Load):
                reads.add(node.attr)
            elif (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id in ("getattr", "hasattr")
                and len(node.args) >= 2
                and isinstance(node.args[1], ast.Constant)
                and isinstance(node.args[1].value, str)
            ):
                reads.add(node.args[1].value)
    return reads


def _package_sources():
    return sorted(p for p in PKG.rglob("*.py"))


def test_config_fields_all_consumed():
    fields = _dataclass_fields(PKG / "config.py")
    assert fields, "config.py parse produced no fields"
    reads = _attribute_reads(_package_sources())
    unread = fields - reads - ALLOWED_UNREAD_CONFIG
    assert not unread, f"decorative config.py fields (no Load-context reader in howl_tpu/): {sorted(unread)}"


def test_settings_fields_all_consumed():
    fields = _dataclass_fields(PKG / "settings.py")
    assert fields, "settings.py parse produced no fields"
    excluded = {PKG / "settings.py", PKG / "config.py"}
    sources = [p for p in _package_sources() if p not in excluded]
    reads = _attribute_reads(sources)
    unread = fields - reads - ALLOWED_UNREAD_SETTINGS
    assert not unread, (
        f"decorative settings fields (assigned maybe, never read outside "
        f"config/settings): {sorted(unread)}"
    )
