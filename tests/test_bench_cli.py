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
