"""CLI generate subcommand (tiny LM, CPU)."""

import sys

import numpy as np


class TestCLIGenerate:
    def test_generate_runs_and_is_deterministic(self, capsys):
        from resnet_accel_tpu.cli import main

        argv = ["prog", "generate", "--n-new", "3", "--layers", "1",
                "--d-model", "64", "--heads", "2", "--max-len", "16",
                "--prompt", "1,2"]
        old = sys.argv
        try:
            sys.argv = argv
            assert main() == 0
            first = capsys.readouterr().out
            sys.argv = argv
            assert main() == 0
            second = capsys.readouterr().out
        finally:
            sys.argv = old
        gen = [ln for ln in first.splitlines()
               if ln.startswith("generated:")]
        assert len(gen) == 1
        toks = eval(gen[0].split(":", 1)[1])  # noqa: S307 - test only
        assert len(toks) == 3 and all(0 <= t < 64 for t in toks)
        # deterministic across runs
        assert gen == [ln for ln in second.splitlines()
                       if ln.startswith("generated:")]

    def test_prompt_too_long_exits(self):
        import pytest

        from resnet_accel_tpu.cli import main
        old = sys.argv
        try:
            sys.argv = ["prog", "generate", "--n-new", "20",
                        "--max-len", "8", "--prompt",
                        ",".join("1" * 5)]
            with pytest.raises(SystemExit):
                main()
        finally:
            sys.argv = old

    def test_speculative_matches_greedy(self, capsys):
        from resnet_accel_tpu.cli import main

        base = ["prog", "generate", "--n-new", "6", "--layers", "1",
                "--d-model", "64", "--heads", "2", "--max-len", "32",
                "--prompt", "3,4,5,3,4,5"]
        old = sys.argv
        try:
            sys.argv = base
            assert main() == 0
            greedy = capsys.readouterr().out
            sys.argv = base + ["--speculative"]
            assert main() == 0
            spec = capsys.readouterr().out
        finally:
            sys.argv = old
        g = [ln for ln in greedy.splitlines()
             if ln.startswith("generated:")]
        s = [ln for ln in spec.splitlines()
             if ln.startswith("generated:")]
        assert g == s                       # bit-identical via CLI too
        assert any("verify passes" in ln for ln in spec.splitlines())

    def test_speculative_sampled_deterministic_per_seed(self, capsys):
        from resnet_accel_tpu.cli import main

        base = ["prog", "generate", "--n-new", "6", "--layers", "1",
                "--d-model", "64", "--heads", "2", "--max-len", "32",
                "--prompt", "3,4,5,3,4,5", "--speculative",
                "--temperature", "1.0", "--sample-seed", "7"]
        old = sys.argv
        try:
            sys.argv = list(base)
            assert main() == 0
            a = capsys.readouterr().out
            sys.argv = list(base)
            assert main() == 0
            b = capsys.readouterr().out
        finally:
            sys.argv = old

        def gen(out):
            return [ln for ln in out.splitlines()
                    if ln.startswith("generated:")]

        assert gen(a) == gen(b)             # same seed, same tokens
        assert any("distribution-exact" in ln for ln in a.splitlines())


class TestBenchArtifact:
    def test_bench_artifact_synthetic(self, tmp_path, capsys):
        import json as _json

        import numpy as np

        from resnet_accel_tpu.cli import main
        from resnet_accel_tpu.sparse import build_bsr_int8_direct
        from resnet_accel_tpu.sparse.io import save_layer_dir

        rng = np.random.default_rng(0)
        W = rng.integers(-128, 128, (128, 256)).astype(np.int8)
        W[:, 128:] = 0  # one zero 128-block column
        bsr = build_bsr_int8_direct(W, 128)
        d = tmp_path / "layer"
        save_layer_dir(bsr, str(d), "test_fc")
        rc = main(["bench", "--artifact", str(d), "--chain", "32",
                   "--iters", "3", "--backend", "cpu",
                   "--output", str(tmp_path / "out.json")])
        assert rc == 0
        row = _json.load(open(tmp_path / "out.json"))
        assert row["bit_exact"] is True
        assert row["nnz_blocks"] == 1
        assert row["latency_us"] > 0
