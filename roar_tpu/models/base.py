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


class GlowVocoder(Vocoder):
    """Base for reversible/flow vocoders (models/base.py:105-223): adds the
    bias-spectrogram denoise pass.  Subclasses set `stft_config` to a
    MelConfig-like object (n_fft/hop_length/win_length/window/n_mels) and
    implement convert_spectrogram_to_audio.
    """

    stft_config: Any = None
    bias_spect: Any = None

    def update_bias_spect(self, params) -> None:
        """Synthesize from a zero mel and remember its magnitude spectrum
        (models/base.py:196-204): the generator's output for silence is the
        additive bias to subtract."""
        import jax.numpy as jnp

        cfg = self.stft_config
        zero_mel = np.zeros((1, 88, cfg.n_mels), np.float32)
        bias_audio = self.convert_spectrogram_to_audio(params, zero_mel)
        re, im = _stft_complex(
            jnp.asarray(bias_audio), cfg.n_fft, cfg.hop_length, cfg.win_length
        )
        mag = jnp.sqrt(re * re + im * im)
        self.bias_spect = mag[..., 0][..., None]

    def denoise(self, params, audio, strength: float = 0.01):
        """Subtract `strength` x bias magnitude in the STFT domain and
        resynthesize with the original phase (models/base.py:210-223)."""
        import jax.numpy as jnp

        from roar_tpu.ops.griffin_lim import istft

        cfg = self.stft_config
        if self.bias_spect is None:
            self.update_bias_spect(params)
        audio = jnp.asarray(audio)
        re, im = _stft_complex(audio, cfg.n_fft, cfg.hop_length, cfg.win_length)
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        mag = jnp.clip(mag - self.bias_spect * strength, 0.0, None)
        return istft(
            mag * jnp.cos(phase), mag * jnp.sin(phase),
            cfg.n_fft, cfg.hop_length, cfg.win_length,
            length=audio.shape[-1],
        )


def _stft_complex(audio, n_fft: int, hop_length: int, win_length: int):
    """Center-padded complex STFT as (re, im), each [B, F, T]."""
    import jax.numpy as jnp

    from roar_tpu.ops.spectrogram import (
        _reflect_pad_1d,
        _windowed_dft_matrix,
        frame_signal,
    )

    basis = jnp.asarray(_windowed_dft_matrix(n_fft, win_length, "hann"))
    n_freqs = 1 + n_fft // 2
    xp = _reflect_pad_1d(audio, n_fft // 2)
    frames = frame_signal(xp, n_fft, hop_length)
    proj = jnp.einsum("btn,nf->btf", frames, basis)
    re = jnp.swapaxes(proj[..., :n_freqs], 1, 2)
    im = jnp.swapaxes(proj[..., n_freqs:], 1, 2)
    return re, im


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


class G2PModel(abc.ABC):
    """Grapheme -> phoneme conversion (models/base.py:296)."""

    @abc.abstractmethod
    def convert_graphemes_to_phonemes(
        self,
        manifest_filepath: str,
        output_manifest_filepath: str,
        grapheme_field: str = "text_graphemes",
        batch_size: int = 32,
        num_workers: int = 0,
        pred_field: str = "pred_text",
    ) -> str:
        """Writes predictions into `pred_field` of a copied manifest and
        returns the output manifest path."""


def register_bases() -> None:
    """Register the concrete task wrappers as virtual subclasses."""
    from roar_tpu.models.fastpitch_model import FastPitchModel
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.models.jets_model import JETSModel

    SpectrogramGenerator.register(FastPitchModel)
    Vocoder.register(HifiGanModel)
    TextToWaveform.register(JETSModel)


register_bases()
