"""Tests for L0 utils: config system, logging, timer.

Modeled on the reference's util tests (ref: src/util/test-config-parse-options.cc,
src/util/log-message-test.cc)."""

from dataclasses import dataclass

import pytest

from asr_decoder_tpu.utils.config import ConfigOptions, flag


@dataclass
class _DemoConf:
    beam: float = flag(16.0, "decoding beam")
    max_active: int = flag(7000, "max active tokens")
    use_vad: bool = flag(False, "enable vad")
    graph: str = flag("hclg", "graph type")


def test_register_and_parse():
    opts = ConfigOptions("demo")
    conf = _DemoConf()
    opts.register_dataclass(conf)
    pos = opts.parse(["--beam=10.5", "--max-active=200", "--use-vad=true",
                      "--graph=clg", "words.txt", "graph.fst"])
    assert conf.beam == 10.5
    assert conf.max_active == 200
    assert conf.use_vad is True
    assert conf.graph == "clg"
    assert pos == ["words.txt", "graph.fst"]


def test_bool_flag_without_value():
    opts = ConfigOptions()
    conf = _DemoConf()
    opts.register_dataclass(conf)
    opts.parse(["--use-vad"])
    assert conf.use_vad is True


def test_unknown_option_raises():
    opts = ConfigOptions()
    with pytest.raises(KeyError):
        opts.parse(["--no-such-flag=1"])


def test_prefix_scoping():
    """Mirrors the reference's prefixed sub-configs
    (ref: src/online-vad/online-vad.h:103)."""
    opts = ConfigOptions()
    vad = _DemoConf()
    opts.register_dataclass(vad, prefix="nnet-vad-judge")
    opts.parse(["--nnet-vad-judge.beam=3"])
    assert vad.beam == 3.0


def test_config_file(tmp_path):
    cfgfile = tmp_path / "conf.txt"
    cfgfile.write_text("--beam=8  # comment\n\n--max-active=123\n")
    opts = ConfigOptions()
    conf = _DemoConf()
    opts.register_dataclass(conf)
    opts.parse([f"--config={cfgfile}"])
    assert conf.beam == 8.0
    assert conf.max_active == 123


def test_disable_option():
    opts = ConfigOptions()
    conf = _DemoConf()
    opts.register_dataclass(conf)
    opts.disable("beam")
    with pytest.raises(KeyError):
        opts.parse(["--beam=1"])


def test_verbose_standard_flag():
    opts = ConfigOptions()
    opts.parse(["--verbose=2"])
    assert opts.verbose == 2


def test_usage_text():
    opts = ConfigOptions("usage line")
    conf = _DemoConf()
    opts.register_dataclass(conf)
    u = opts.usage()
    assert "--beam" in u and "usage line" in u


def test_timer_and_rtf():
    from asr_decoder_tpu.utils.timer import RtfStats, Timer

    t = Timer()
    assert t.elapsed() >= 0.0
    stats = RtfStats()
    stats.add(wav_time=10.0, run_time=1.0, nosil_time=5.0)
    assert stats.rtf == pytest.approx(0.1)
    assert stats.nosil_rtf == pytest.approx(0.2)
    assert stats.speedup == pytest.approx(10.0)


def test_profiling_scopes_and_trace(tmp_path):
    """Named scopes compile inside jit; trace() writes a capture dir
    (SURVEY §5: xprof-visible scopes)."""
    import jax
    import jax.numpy as jnp
    from asr_decoder_tpu.utils.profiling import annotate, scope, trace

    @jax.jit
    def f(x):
        with scope("test/double"):
            return x * 2

    with annotate("host-span"):
        out = f(jnp.ones((4,)))
    assert float(out.sum()) == 8.0
    d = str(tmp_path / "xprof")
    try:
        with trace(d):
            f(jnp.ones((4,))).block_until_ready()
    except Exception:
        return  # profiler unavailable on this backend — scope API covered
    import os
    assert os.path.isdir(d)
    with trace(None):
        pass
