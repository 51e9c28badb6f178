"""CLI serve subcommand — the paged-KV engine from the command line
(tiny LM, CPU; tp path over the virtual mesh)."""

import numpy as np

from resnet_accel_tpu.cli import main


def _run(capsys, *extra):
    argv = ["serve", "--backend", "cpu", "--n-new", "4",
            "--layers", "1", "--d-model", "64", "--heads", "2",
            "--max-len", "32", "--prompts", "1,2,3;4,5",
            "--pool-pages", "16"] + list(extra)
    assert main(argv) == 0
    return capsys.readouterr().out


def test_serve_streams_match_generate(capsys):
    out = _run(capsys)
    lines = [ln for ln in out.splitlines() if ln.startswith("req ")]
    assert len(lines) == 2
    streams = [eval(ln.split("->", 1)[1]) for ln in lines]  # noqa: S307
    assert all(len(s) == 4 for s in streams)
    # deterministic and engine-independent: same command again
    again = [eval(ln.split("->", 1)[1])  # noqa: S307
             for ln in _run(capsys).splitlines() if ln.startswith("req ")]
    assert streams == again


def test_serve_feature_composition_tp(capsys, cpu_devices):
    if len(cpu_devices) < 2:
        import pytest
        pytest.skip("needs 2 virtual devices")
    base = _run(capsys)
    tp = _run(capsys, "--tp", "2", "--kv-dtype", "int8",
              "--spec-draft", "2", "--prefix-cache")
    get = lambda s: [eval(ln.split("->", 1)[1])  # noqa: E731,S307
                     for ln in s.splitlines() if ln.startswith("req ")]
    # int8 KV is the lossy knob; on this tiny LM the streams still
    # agree (asserted so a regression that breaks the composition
    # entirely cannot hide behind "lossy")
    assert get(tp) == get(base)
    assert "tp=2" in tp and "int8" in tp
