"""Rich artifact logging: spectrogram/alignment/pitch plots + audio previews.

Re-design of the reference's artifact generators
(roar/collections/tts/parts/utils/callbacks.py:68-665
VocoderArtifactGenerator / FastPitchArtifactGenerator and the plot helpers in
parts/utils/helpers.py:428-560): matplotlib figures written under the
experiment dir (and TensorBoard when active), Griffin-Lim / vocoder audio
previews written as WAVs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def plot_spectrogram_to_file(spec: np.ndarray, path: str, title: str = "") -> Optional[str]:
    """spec: [n_mel, T].  Returns path or None if matplotlib is missing."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(10, 3))
    im = ax.imshow(spec, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_alignment_to_file(attn: np.ndarray, path: str, title: str = "alignment") -> Optional[str]:
    """attn: [T_mel, T_text]."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.imshow(attn.T, aspect="auto", origin="lower", interpolation="none")
    ax.set_title(title)
    ax.set_xlabel("mel frames")
    ax.set_ylabel("text tokens")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_pitch_to_file(pitch: np.ndarray, path: str, title: str = "pitch") -> Optional[str]:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(10, 2.5))
    ax.plot(pitch)
    ax.set_title(title)
    ax.set_xlabel("frames")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


class FastPitchArtifactGenerator:
    """Writes predicted/target spectrogram images, alignment maps, and
    optional Griffin-Lim audio previews every `log_every_epochs`."""

    def __init__(
        self,
        out_dir: str,
        log_every_epochs: int = 5,
        audio_preview: bool = True,
        mel_cfg=None,
    ):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.log_every_epochs = log_every_epochs
        self.audio_preview = audio_preview
        self.mel_cfg = mel_cfg

    def __call__(self, epoch: int, outputs: Dict[str, Any], batch: Dict[str, Any]):
        if epoch % self.log_every_epochs != 0:
            return []
        written = []
        spect = np.asarray(outputs["spect"])  # [B, T, n_mel]
        p = self.out_dir / f"epoch{epoch:05d}_spec_pred.png"
        if plot_spectrogram_to_file(spect[0].T, str(p), "predicted mel"):
            written.append(str(p))
        if outputs.get("attn_soft") is not None:
            attn = np.asarray(outputs["attn_soft"])[0, 0]
            p = self.out_dir / f"epoch{epoch:05d}_alignment.png"
            if plot_alignment_to_file(attn, str(p)):
                written.append(str(p))
        if outputs.get("pitch_predicted") is not None:
            p = self.out_dir / f"epoch{epoch:05d}_pitch.png"
            if plot_pitch_to_file(np.asarray(outputs["pitch_predicted"])[0], str(p)):
                written.append(str(p))
        if self.audio_preview and self.mel_cfg is not None:
            try:
                import jax.numpy as jnp

                from roar_tpu.data.audio import write_wav
                from roar_tpu.ops.griffin_lim import mel_to_audio_griffin_lim

                audio = np.asarray(
                    mel_to_audio_griffin_lim(
                        jnp.asarray(spect[:1].swapaxes(1, 2)),
                        sample_rate=self.mel_cfg.sample_rate,
                        n_fft=self.mel_cfg.fft_length,
                        hop_length=self.mel_cfg.hop_length,
                        win_length=self.mel_cfg.win_length,
                        n_mels=self.mel_cfg.nfilt,
                        fmin=self.mel_cfg.lowfreq,
                        fmax=self.mel_cfg.highfreq,
                        n_iters=30,
                    )
                )[0]
                p = self.out_dir / f"epoch{epoch:05d}_preview.wav"
                write_wav(str(p), audio, self.mel_cfg.sample_rate)
                written.append(str(p))
            except Exception:
                pass
        return written


class VocoderArtifactGenerator:
    """Writes ground-truth vs generated audio pairs
    (callbacks.py:296 VocoderArtifactGenerator analogue)."""

    def __init__(self, out_dir: str, sample_rate: int, log_every_epochs: int = 5):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.sample_rate = sample_rate
        self.log_every_epochs = log_every_epochs

    def __call__(self, epoch: int, audio_real: np.ndarray, audio_gen: np.ndarray):
        if epoch % self.log_every_epochs != 0:
            return []
        from roar_tpu.data.audio import write_wav

        written = []
        for name, wav in (("real", audio_real), ("gen", audio_gen)):
            p = self.out_dir / f"epoch{epoch:05d}_{name}.wav"
            write_wav(str(p), np.asarray(wav)[0], self.sample_rate)
            written.append(str(p))
        return written


def plot_multipitch_to_file(
    pitch_gt: np.ndarray, pitch_pred: np.ndarray, path: str,
    title: str = "pitch (gt vs pred)", ylim_range=None,
) -> Optional[str]:
    """Overlay ground-truth and predicted pitch contours
    (ref helpers.py:479-495 plot_multipitch_to_numpy); returns the path, or
    None when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(12, 3))
    ax.plot(np.asarray(pitch_gt), label="gt", alpha=0.8)
    ax.plot(np.asarray(pitch_pred), label="pred", alpha=0.8)
    if ylim_range is not None:
        ax.set_ylim(ylim_range)
    ax.set_xlabel("frames")
    ax.set_ylabel("pitch")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
