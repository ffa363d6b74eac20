"""Tokenizer + Qwen3-ASR chat-prompt protocol.

The prompt wire format is fixed by the Qwen3-ASR checkpoint (special token
ids, chat template) and must be byte-identical to produce token-identical
transcripts.  Protocol parity with the reference:
/root/reference/src/qwen3_asr_mlx/tokenizer.py:16-108.

The heavy lifting (byte-level BPE) is delegated to the HuggingFace
``tokenizers`` Rust wheel, the same backend the reference uses.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Sequence

# -- Special token ids (Qwen3-ASR vocabulary) -------------------------------

ENDOFTEXT_TOKEN_ID = 151643
IM_START_TOKEN_ID = 151644
IM_END_TOKEN_ID = 151645
AUDIO_START_TOKEN_ID = 151669
AUDIO_END_TOKEN_ID = 151670
AUDIO_PAD_TOKEN_ID = 151676
ASR_TEXT_TOKEN_ID = 151704

#: Generation stops when either of these is produced.
EOS_TOKEN_IDS: frozenset[int] = frozenset({ENDOFTEXT_TOKEN_ID, IM_END_TOKEN_ID})

# Word-piece ids baked into the chat template ("system", "\n", "user",
# "assistant", "language").
_SYSTEM_ID = 8948
_NEWLINE_ID = 198
_USER_ID = 872
_ASSISTANT_ID = 77091
_LANGUAGE_WORD_ID = 11528

#: ``<|im_start|>system\n<|im_end|>\n<|im_start|>user\n<|audio_start|>``
PROMPT_PREFIX: tuple[int, ...] = (
    IM_START_TOKEN_ID, _SYSTEM_ID, _NEWLINE_ID,
    IM_END_TOKEN_ID, _NEWLINE_ID,
    IM_START_TOKEN_ID, _USER_ID, _NEWLINE_ID,
    AUDIO_START_TOKEN_ID,
)

#: ``<|audio_end|><|im_end|>\n<|im_start|>assistant\n``
PROMPT_SUFFIX: tuple[int, ...] = (
    AUDIO_END_TOKEN_ID, IM_END_TOKEN_ID, _NEWLINE_ID,
    IM_START_TOKEN_ID, _ASSISTANT_ID, _NEWLINE_ID,
)


def build_prompt(
    n_audio_tokens: int,
    language_name_tokens: Sequence[int] | None = None,
) -> list[int]:
    """Assemble the full Qwen3-ASR inference prompt as token ids.

    Layout (each line one chat-template segment)::

        <|im_start|>system\\n<|im_end|>\\n
        <|im_start|>user\\n<|audio_start|>  <|audio_pad|> * N  <|audio_end|><|im_end|>\\n
        <|im_start|>assistant\\n
        language {Name}<asr_text>

    The assistant turn is primed with ``language {Name}<asr_text>`` so the
    model generates only transcription text.
    """
    lang = list(language_name_tokens) if language_name_tokens else []
    return (
        list(PROMPT_PREFIX)
        + [AUDIO_PAD_TOKEN_ID] * n_audio_tokens
        + list(PROMPT_SUFFIX)
        + [_LANGUAGE_WORD_ID]
        + lang
        + [ASR_TEXT_TOKEN_ID]
    )


def build_detect_prompt(n_audio_tokens: int) -> list[int]:
    """Prompt WITHOUT the language priming tail — true language detection.

    The assistant turn is left open after ``<|im_start|>assistant\\n`` so
    the model generates ``language {Name}<asr_text>{transcript}`` itself
    (the reference's README claims auto-detection but its implementation
    bakes the hint into the prompt and echoes it back — model.py:328,357;
    its ``parse_output`` machinery for the detect format exists at
    tokenizer.py:89-108 and is used here for real).
    """
    return list(PROMPT_PREFIX) + [AUDIO_PAD_TOKEN_ID] * n_audio_tokens + list(
        PROMPT_SUFFIX
    )


_LANG_PREAMBLE_RE = re.compile(r"^language\s+\S+\s*", re.IGNORECASE)
_LANG_CAPTURE_RE = re.compile(r"^\s*language\s+([^\s<]+)", re.IGNORECASE)


def parse_language(text: str) -> str | None:
    """Extract the detected language name from a raw model output."""
    m = _LANG_CAPTURE_RE.match(text)
    return m.group(1) if m else None


def parse_output(text: str) -> str:
    """Extract transcription text from a raw decoded model output.

    Handles both the primed-prompt format (text only) and the full
    ``language X<asr_text>transcript`` format for robustness.
    """
    for eos in ("<|im_end|>", "<|endoftext|>"):
        text = text.replace(eos, "")
    tag = "<asr_text>"
    pos = text.find(tag)
    if pos >= 0:
        return text[pos + len(tag):].strip()
    return _LANG_PREAMBLE_RE.sub("", text).strip()


class Tokenizer:
    """Byte-level BPE tokenizer for Qwen3-ASR.

    Loads ``tokenizer.json`` when present, otherwise reconstructs the BPE
    model from ``vocab.json`` + ``merges.txt``.
    """

    def __init__(self, model_path: str | Path) -> None:
        from tokenizers import Tokenizer as HFTokenizer

        root = Path(model_path)
        tok_json = root / "tokenizer.json"
        if tok_json.is_file():
            self._tok = HFTokenizer.from_file(str(tok_json))
        elif (root / "vocab.json").is_file() and (root / "merges.txt").is_file():
            self._tok = self._from_vocab_merges(root)
        else:
            raise FileNotFoundError(
                f"no tokenizer.json or vocab.json+merges.txt under {root}"
            )

    @staticmethod
    def _from_vocab_merges(root: Path):
        from tokenizers import Tokenizer as HFTokenizer
        from tokenizers.decoders import ByteLevel as ByteLevelDecoder
        from tokenizers.models import BPE
        from tokenizers.pre_tokenizers import ByteLevel

        vocab = json.loads((root / "vocab.json").read_text(encoding="utf-8"))
        lines = (root / "merges.txt").read_text(encoding="utf-8").splitlines()
        if lines and lines[0].startswith("#"):
            lines = lines[1:]
        merges = [tuple(ln.split()) for ln in lines if ln.strip()]
        tok = HFTokenizer(BPE(vocab=vocab, merges=merges))
        tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
        tok.decoder = ByteLevelDecoder()
        return tok

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text).ids

    def decode(self, token_ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(token_ids), skip_special_tokens=skip_special_tokens)

    def build_prompt(
        self, n_audio_tokens: int, language: str | None = "English"
    ) -> list[int]:
        """Full prompt ids; ``language=None`` leaves the assistant turn
        open for true language detection (see ``build_detect_prompt``)."""
        if language is None:
            return build_detect_prompt(n_audio_tokens)
        return build_prompt(n_audio_tokens, self.encode(f" {language}"))

    def parse_output(self, text: str) -> str:
        return parse_output(text)
