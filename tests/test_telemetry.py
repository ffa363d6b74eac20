"""Telemetry unit tests."""

import time

from qwen3_asr_tpu.utils.telemetry import RequestStats, stage_timer


def test_request_stats_math():
    st = RequestStats(audio_seconds=30.0, n_prompt_tokens=400, n_generated_tokens=90)
    st.stages = {"prefill": 0.1, "decode": 0.9}
    assert st.total_seconds == 1.0
    assert st.rtfx == 30.0
    assert st.decode_tokens_per_second == 100.0
    d = st.as_dict()
    assert d["rtfx"] == 30.0 and d["stage_decode_seconds"] == 0.9


def test_stage_timer_accumulates():
    st = RequestStats()
    with stage_timer(st, "x"):
        time.sleep(0.01)
    with stage_timer(st, "x"):
        time.sleep(0.01)
    assert st.stages["x"] >= 0.02


def test_stage_timer_none_stats_is_noop():
    with stage_timer(None, "y"):
        pass


def test_empty_stats_safe():
    st = RequestStats()
    assert st.rtfx == 0.0
    assert st.decode_tokens_per_second == 0.0
