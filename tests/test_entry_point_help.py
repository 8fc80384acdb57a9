"""Every CLI entry point imports cleanly and parses ``--help``.

The reference's 19-script surface (SURVEY.md §2.8) is reproduced under
``howl_tpu/training/run``; most have dedicated behavioral tests, but a few
(ETL CLIs, report generators) are exercised only through their ``run()``
internals. This sweep catches import-time breakage and argparse wiring rot in
ALL of them: each module must import, expose ``run``/``main``, and exit 0 from
``--help`` without touching any device or dataset.
"""

from __future__ import annotations

import importlib
import pkgutil

import pytest

import howl_tpu.training.run as run_pkg

SCRIPTS = sorted(
    m.name for m in pkgutil.iter_modules(run_pkg.__path__) if not m.name.startswith("_")
)


def test_all_reference_scripts_present():
    # the 15 live reference scripts (deprecated/create_raw_dataset dropped,
    # PARITY.md) plus the howl_tpu-only import_workspace
    expected = {
        "attach_alignment", "demo", "eval_commands_recognition",
        "eval_wake_word_detection", "export_honkling", "generate_precise_dataset",
        "generate_precise_roc", "generate_raw_audio_dataset", "generate_roc",
        "import_workspace", "pretrain", "pretrain_gsc", "refactored_train",
        "run_exp", "stitch_vocab_samples", "train",
    }
    assert expected.issubset(set(SCRIPTS)), sorted(expected - set(SCRIPTS))


@pytest.mark.parametrize("name", SCRIPTS)
def test_script_imports_and_help(name, capsys):
    mod = importlib.import_module(f"howl_tpu.training.run.{name}")
    assert hasattr(mod, "run") or hasattr(mod, "main"), f"{name} has no run()/main()"
    entry = mod.run if hasattr(mod, "run") else mod.main
    assert callable(entry), f"{name}.{'run' if hasattr(mod, 'run') else 'main'} is not callable"
    with pytest.raises(SystemExit) as exc:
        entry(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()
