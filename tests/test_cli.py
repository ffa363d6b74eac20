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


def test_stream_flag():
    args = build_parser().parse_args(
        ["a.wav", "--model", "/m", "--stream", "30"]
    )
    assert args.stream == 30.0
    assert build_parser().parse_args(["a.wav", "--model", "/m"]).stream is None
