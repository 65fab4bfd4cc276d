"""Whisper model-family configuration.

Replaces the reference's dependency on openai-whisper's bundled model zoo
(reference: app/services/audio_processor.py:863 loads "medium" with a
"small" fallback at :1060).  Dimensions follow the published Whisper
architecture table so converted checkpoints drop straight in.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class WhisperConfig:
    name: str = "tiny"
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    # cross-attention heads that track the audio timeline, as (layer, head)
    # pairs — openai-whisper ships a per-checkpoint mask for its
    # word_timestamps=True alignment (the reference inherits it via
    # whisper.load_model, app/services/audio_processor.py:863).  None ->
    # align.py falls back to the layer-mean of the last half of the
    # decoder.  Set from a checkpoint sidecar (convert.load_params) or
    # measured with align.calibrate_alignment_heads.
    alignment_heads: tuple[tuple[int, int], ...] | None = None

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        """Delegates to the ONE derivation (decode.SpecialTokens): the
        naive n_vocab arithmetic returned nonsense negatives for toy and
        custom vocabs, and callers picking it up over
        special.num_languages would mis-validate every language."""
        from .decode import SpecialTokens

        return SpecialTokens.for_config(self).num_languages


_PRESETS = {
    # name: (n_mels, state, heads, enc_layers, dec_layers, vocab)
    "tiny.en": (80, 384, 6, 4, 4, 51864),
    "tiny": (80, 384, 6, 4, 4, 51865),
    "base.en": (80, 512, 8, 6, 6, 51864),
    "base": (80, 512, 8, 6, 6, 51865),
    "small.en": (80, 768, 12, 12, 12, 51864),
    "small": (80, 768, 12, 12, 12, 51865),
    "medium.en": (80, 1024, 16, 24, 24, 51864),
    "medium": (80, 1024, 16, 24, 24, 51865),
    "large-v1": (80, 1280, 20, 32, 32, 51865),
    "large-v2": (80, 1280, 20, 32, 32, 51865),
    "large-v3": (128, 1280, 20, 32, 32, 51866),
    "large-v3-turbo": (128, 1280, 20, 32, 4, 51866),
    # tiny configs for tests/benches without checkpoints
    "test": (80, 64, 2, 2, 2, 1024),
}


def get_config(name: str) -> WhisperConfig:
    if name not in _PRESETS:
        raise KeyError(f"unknown Whisper preset {name!r}; options: {sorted(_PRESETS)}")
    n_mels, state, heads, enc_l, dec_l, vocab = _PRESETS[name]
    return WhisperConfig(
        name=name,
        n_mels=n_mels,
        n_audio_state=state,
        n_audio_head=heads,
        n_audio_layer=enc_l,
        n_text_state=state,
        n_text_head=heads,
        n_text_layer=dec_l,
        n_vocab=vocab,
    )
