"""CLI parsing tests (no model load)."""

import pytest

from qwen3_asr_tpu.cli import build_parser


def test_basic_args():
    args = build_parser().parse_args(["a.wav", "--model", "/m"])
    assert args.audio == ["a.wav"]
    assert args.model == "/m"
    assert args.temperature == 0.0
    assert args.repetition_penalty == 1.2


def test_multiple_files_and_options():
    args = build_parser().parse_args(
        ["a.wav", "b.wav", "--model", "/m", "--language", "de",
         "--temperature", "0.7", "--top-k", "40", "--json", "--batch"]
    )
    assert len(args.audio) == 2
    assert args.language == "de"
    assert args.top_k == 40
    assert args.json and args.batch


def test_model_required():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["a.wav"])


def test_runtime_flags():
    args = build_parser().parse_args(
        ["a.wav", "--model", "/m", "--no-spec", "--int8-weights",
         "--int8-kv", "--compile-cache", "/tmp/xc"]
    )
    assert args.no_spec and args.int8_weights and args.int8_kv
    assert args.compile_cache == "/tmp/xc"


def test_runtime_flags_reach_from_pretrained(monkeypatch):
    """--no-spec / --int8-* / --compile-cache build the RuntimeConfig
    passed to from_pretrained (and no runtime kwarg without them)."""
    from qwen3_asr_tpu import cli
    from qwen3_asr_tpu.api import Qwen3ASR

    seen = {}

    class Boom(Exception):
        pass

    def fake(cls, path, runtime=None, **kw):
        seen["runtime"] = runtime
        raise Boom  # stop before any model work

    monkeypatch.setattr(Qwen3ASR, "from_pretrained", classmethod(fake))
    with pytest.raises(Boom):
        cli.main(
            ["a.wav", "--model", "/m", "--no-spec", "--int8-kv",
             "--compile-cache", "/tmp/xc"]
        )
    rt = seen["runtime"]
    assert rt.speculative == "off" and rt.spec_engine == "off"
    assert rt.kv_cache_dtype == "int8"
    assert rt.compile_cache_dir == "/tmp/xc"

    with pytest.raises(Boom):
        cli.main(["a.wav", "--model", "/m"])
    assert seen["runtime"] is None


def test_stream_flag():
    args = build_parser().parse_args(
        ["a.wav", "--model", "/m", "--stream", "30"]
    )
    assert args.stream == 30.0
    assert build_parser().parse_args(["a.wav", "--model", "/m"]).stream is None


def test_live_flag():
    args = build_parser().parse_args(
        ["a.wav", "--model", "/m", "--live", "1.0"]
    )
    assert args.live == 1.0
    assert build_parser().parse_args(["a.wav", "--model", "/m"]).live is None


def test_live_mode_end_to_end(tmp_path, monkeypatch, capsys):
    """--live drives IncrementalSession through the CLI on a tiny model."""
    import numpy as np

    import jax.numpy as jnp

    from qwen3_asr_tpu import cli
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from tests.test_api import TINY_CFG, StubTokenizer
    from tests.test_native_audio import _write_wav

    model = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(frame_buckets=(800, 1600, 3200), token_buckets=(32,)),
        dtype=jnp.float32,
    )
    monkeypatch.setattr(
        Qwen3ASR, "from_pretrained", classmethod(lambda cls, *a, **k: model)
    )
    wav = tmp_path / "clip.wav"
    t = np.arange(int(2.5 * 16000)) / 16000
    _write_wav(wav, (0.1 * np.sin(2 * np.pi * 330 * t)).astype(np.float32))
    rc = cli.main([str(wav), "--model", "/ignored", "--live", "1.0",
                   "--max-tokens", "4"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3                       # one refresh per fed second
    assert all("clip.wav" in line for line in out)


def test_live_mode_long_audio_falls_back_to_streaming(
    tmp_path, monkeypatch, capsys
):
    """--live with audio longer than the largest frame bucket must not
    crash: it falls back to segmented streaming previews."""
    import numpy as np

    import jax.numpy as jnp

    from qwen3_asr_tpu import cli
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from tests.test_api import TINY_CFG, StubTokenizer
    from tests.test_native_audio import _write_wav

    model = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(
            frame_buckets=(800, 1600, 3200), token_buckets=(32,)
        ),
        dtype=jnp.float32,
    )
    monkeypatch.setattr(
        Qwen3ASR, "from_pretrained", classmethod(lambda cls, *a, **k: model)
    )
    wav = tmp_path / "long.wav"
    t = np.arange(int(40.0 * 16000)) / 16000       # > 32 s largest bucket
    _write_wav(wav, (0.1 * np.sin(2 * np.pi * 330 * t)).astype(np.float32))
    rc = cli.main([str(wav), "--model", "/ignored", "--live", "10.0",
                   "--max-tokens", "4"])
    assert rc == 0
    err = capsys.readouterr()
    assert "falling back to segmented streaming" in err.err
    # Finalized segments were printed for the whole clip.
    lines = [ln for ln in err.out.strip().splitlines() if "long.wav" in ln]
    assert lines


def test_w8a8_and_spec_sampling_flags(monkeypatch):
    from qwen3_asr_tpu import cli
    from qwen3_asr_tpu.api import Qwen3ASR

    seen = {}

    class Boom(Exception):
        pass

    def fake(cls, path, runtime=None, **kw):
        seen["runtime"] = runtime
        raise Boom

    monkeypatch.setattr(Qwen3ASR, "from_pretrained", classmethod(fake))
    with pytest.raises(Boom):
        cli.main(
            ["a.wav", "--model", "/m", "--int8-weights", "--int8-act",
             "--spec-sampling"]
        )
    rt = seen["runtime"]
    assert rt.quantization == "int8"
    assert rt.act_quant == "int8"
    assert rt.spec_sampling is True


def test_int8_act_requires_int8_weights(capsys):
    from qwen3_asr_tpu import cli

    rc = cli.main(["a.wav", "--model", "/m", "--int8-act"])
    assert rc == 2
    assert "--int8-weights" in capsys.readouterr().err
