"""Model-family base interfaces.

API-parity analogue of roar/collections/tts/models/base.py:18-350
(SpectrogramGenerator, Vocoder, TextToWaveform, MelToSpec abstract bases):
these define the user-facing synthesis contract each task wrapper fulfills.
"""

from __future__ import annotations

import abc
from typing import Any, Tuple

import numpy as np


class SpectrogramGenerator(abc.ABC):
    """Text -> mel (models/base.py:18)."""

    @abc.abstractmethod
    def parse(self, text: str) -> np.ndarray:
        """Text -> token ids [1, T_text]."""

    @abc.abstractmethod
    def generate_spectrogram(self, params, tokens, **kwargs) -> Tuple[Any, Any]:
        """Tokens -> (mel [B, T, n_mel], lens [B])."""


class Vocoder(abc.ABC):
    """Mel -> audio (models/base.py:70)."""

    @abc.abstractmethod
    def convert_spectrogram_to_audio(self, params, spec) -> Any:
        """mel [B, T, n_mel] -> audio [B, S]."""


class MelToSpec(abc.ABC):
    """Mel -> linear spectrogram (models/base.py:224)."""

    @abc.abstractmethod
    def convert_mel_to_spec(self, params, mel) -> Any:
        ...


class TextToWaveform(abc.ABC):
    """Text -> audio end to end (models/base.py:258)."""

    @abc.abstractmethod
    def parse(self, text: str) -> np.ndarray:
        ...

    @abc.abstractmethod
    def convert_text_to_waveform(self, params, tokens, **kwargs) -> Tuple[Any, Any]:
        """Tokens -> (audio [B, S], num_frames [B])."""


def register_bases() -> None:
    """Register the concrete task wrappers as virtual subclasses."""
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.models.jets_model import JETSModel

    SpectrogramGenerator.register(FastPitchModel)
    Vocoder.register(HifiGanModel)
    TextToWaveform.register(JETSModel)


register_bases()
