"""bench.py CLI contract: the int8 serving mode is the default for the
generation configs (sd15/sd3) and opt-out-able; train/annotate never
quantize (training has no int8 path; canny has no matmuls to quantize)."""

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_module", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_int8_default_per_config(monkeypatch):
    bench = _load_bench()
    seen = {}

    def probe(args):
        seen["cfg"] = (args.config, args.int8)

    for name in ("bench_sd15", "bench_sd3", "bench_annotate", "bench_train"):
        monkeypatch.setattr(bench, name, probe)

    cases = [
        ([], ("sd15", True)),
        (["--no-int8"], ("sd15", False)),
        (["--config", "sd3"], ("sd3", True)),
        (["--config", "sd3", "--no-int8"], ("sd3", False)),
        (["--config", "train"], ("train", False)),
        (["--config", "annotate"], ("annotate", False)),
        (["--int8"], ("sd15", True)),
    ]
    for argv, expect in cases:
        monkeypatch.setattr(sys, "argv", ["bench.py"] + argv)
        bench.main()
        assert seen["cfg"] == expect, (argv, seen["cfg"], expect)


def test_sampler_flag(monkeypatch):
    """--sampler reaches the sd15 bench (BASELINE config 2 samples with
    UniPC, train_promptdiffusion_sd15.py:90-103) and rejects unknowns."""
    import pytest

    bench = _load_bench()
    seen = {}
    monkeypatch.setattr(bench, "bench_sd15", lambda a: seen.update(s=a.sampler))

    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    assert seen["s"] == "ddim"
    monkeypatch.setattr(sys, "argv", ["bench.py", "--sampler", "unipc"])
    bench.main()
    assert seen["s"] == "unipc"
    monkeypatch.setattr(sys, "argv", ["bench.py", "--sampler", "euler"])
    with pytest.raises(SystemExit):
        bench.main()
