"""Prompt-protocol tests: exact token ids (reference test_tokenizer.py)."""

from qwen3_asr_tpu.tokenizer import (
    ASR_TEXT_TOKEN_ID,
    AUDIO_END_TOKEN_ID,
    AUDIO_PAD_TOKEN_ID,
    AUDIO_START_TOKEN_ID,
    ENDOFTEXT_TOKEN_ID,
    EOS_TOKEN_IDS,
    IM_END_TOKEN_ID,
    IM_START_TOKEN_ID,
    build_prompt,
    parse_output,
)


def test_special_token_ids():
    assert ENDOFTEXT_TOKEN_ID == 151643
    assert IM_START_TOKEN_ID == 151644
    assert IM_END_TOKEN_ID == 151645
    assert AUDIO_START_TOKEN_ID == 151669
    assert AUDIO_END_TOKEN_ID == 151670
    assert AUDIO_PAD_TOKEN_ID == 151676
    assert ASR_TEXT_TOKEN_ID == 151704
    assert EOS_TOKEN_IDS == frozenset({151643, 151645})


def test_build_prompt_exact_ids():
    ids = build_prompt(3, language_name_tokens=[6364])  # " English" as 1 token
    expected = (
        [151644, 8948, 198, 151645, 198, 151644, 872, 198, 151669]
        + [151676, 151676, 151676]
        + [151670, 151645, 198, 151644, 77091, 198]
        + [11528, 6364, 151704]
    )
    assert ids == expected


def test_build_prompt_no_language_tokens():
    ids = build_prompt(1)
    assert ids.count(AUDIO_PAD_TOKEN_ID) == 1
    assert ids[-1] == ASR_TEXT_TOKEN_ID
    assert ids[-2] == 11528  # "language"


def test_audio_pad_positions_are_contiguous_after_prefix():
    # The runtime injects encoder features with a slice update at offset 9;
    # this pins that structural invariant.
    ids = build_prompt(5)
    pads = [i for i, t in enumerate(ids) if t == AUDIO_PAD_TOKEN_ID]
    assert pads == list(range(9, 14))


def test_parse_output_with_tag():
    assert parse_output("language English<asr_text> hello world.<|im_end|>") == "hello world."


def test_parse_output_fallback_language_preamble():
    assert parse_output("language French bonjour") == "bonjour"


def test_parse_output_plain():
    assert parse_output("  just text <|endoftext|>") == "just text"


def test_detect_prompt_has_no_priming_tail():
    from qwen3_asr_tpu.tokenizer import build_detect_prompt

    ids = build_detect_prompt(2)
    primed = build_prompt(2, language_name_tokens=[6364])
    assert ids == primed[: len(ids)]
    assert ids[-1] == 198  # ends right after "assistant\n"
    assert 11528 not in ids and ASR_TEXT_TOKEN_ID not in ids


def test_parse_language():
    from qwen3_asr_tpu.tokenizer import parse_language

    assert parse_language("language English<asr_text> hi") == "English"
    assert parse_language("  language French<asr_text>bonjour") == "French"
    assert parse_language("no preamble here") is None
