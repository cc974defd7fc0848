"""Speech enhancement: encoder -> mask estimator -> decoder.

Re-design of roar/collections/asr/models/enhancement_models.py:26-480
(`EncMaskDecAudioToAudioModel`): STFT encoder, a neural mask estimator over
the magnitude spectrum, multiplicative masking of the complex spectrum, and
ISTFT decoding — trained with (SI-)SDR (losses/audio_losses.py).
The reference's RNN mask estimators become a conv + transformer stack
(TPU-friendly, no recurrence).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.losses.audio_losses import sdr_loss
from roar_tpu.models.transformer import TransformerLayer
from roar_tpu.ops.griffin_lim import istft
from roar_tpu.ops.lengths import mask_from_lens
from roar_tpu.ops.spectrogram import _reflect_pad_1d, _windowed_dft_matrix, frame_signal


class MaskEstimator(nn.Module):
    """log-magnitude [B, T, F] -> sigmoid mask [B, T, F]."""

    n_freqs: int
    d_model: int = 256
    n_layers: int = 3
    n_head: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = nn.Dense(self.d_model)(x)
        for i in range(self.n_layers):
            x = TransformerLayer(
                self.n_head,
                self.d_model,
                self.d_model // self.n_head,
                2 * self.d_model,
                kernel_size=3,
                dropout=self.dropout,
                dropatt=self.dropout,
                name=f"layers_{i}",
            )(x, mask, deterministic=deterministic)
        return nn.sigmoid(nn.Dense(self.n_freqs)(x))


class EncMaskDecEnhancementModel:
    """Audio-to-audio enhancement task."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        self.sample_rate = cfg.get("sample_rate", 16000)
        self.n_fft = cfg.get("n_fft", 512)
        self.hop_length = cfg.get("hop_length", 128)
        self.win_length = cfg.get("win_length", self.n_fft)
        self.window = cfg.get("window", "hann")
        self.n_freqs = 1 + self.n_fft // 2
        self.loss_type = cfg.get("loss", "si_sdr")
        self.mask_estimator = MaskEstimator(
            n_freqs=self.n_freqs,
            d_model=cfg.get("d_model", 256),
            n_layers=cfg.get("n_layers", 3),
            n_head=cfg.get("n_head", 4),
            dropout=cfg.get("dropout", 0.1),
        )

    # -- encoder / decoder -------------------------------------------------
    def encode(self, audio: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audio [B, S] -> (re, im) [B, F, T]."""
        basis = jnp.asarray(
            _windowed_dft_matrix(self.n_fft, self.win_length, self.window)
        )
        xp = _reflect_pad_1d(audio, self.n_fft // 2)
        frames = frame_signal(xp, self.n_fft, self.hop_length)
        proj = jnp.einsum("btn,nf->btf", frames, basis)
        re = jnp.swapaxes(proj[..., : self.n_freqs], 1, 2)
        im = jnp.swapaxes(proj[..., self.n_freqs :], 1, 2)
        return re, im

    def decode(self, re, im, length: int) -> jnp.ndarray:
        return istft(
            re, im, self.n_fft, self.hop_length, self.win_length, self.window,
            length=length,
        )

    # -- forward -------------------------------------------------------------
    def forward(self, params, audio, audio_len, deterministic=True, rngs=None):
        re, im = self.encode(audio)
        logmag = jnp.log1p(jnp.sqrt(re * re + im * im))  # [B, F, T]
        feats = jnp.swapaxes(logmag, 1, 2)  # [B, T, F]
        t = feats.shape[1]
        frame_lens = audio_len // self.hop_length + 1
        fmask = mask_from_lens(frame_lens, t)[..., None].astype(feats.dtype)
        mask = self.mask_estimator.apply(
            params, feats, fmask, deterministic=deterministic, rngs=rngs
        )  # [B, T, F]
        mask = jnp.swapaxes(mask, 1, 2)  # [B, F, T]
        out = self.decode(re * mask, im * mask, audio.shape[-1])
        return out

    def init_params(self, rng, batch):
        audio = jnp.asarray(batch["input_signal"])

        @jax.jit  # one program; eager init is pathological over remote dispatch
        def _init(rng, audio):
            re, im = self.encode(audio)
            feats = jnp.swapaxes(jnp.log1p(jnp.sqrt(re * re + im * im)), 1, 2)
            fmask = jnp.ones(feats.shape[:2] + (1,), feats.dtype)
            return self.mask_estimator.init(rng, feats, fmask)

        return _init(rng, audio)

    def loss_fn(self, params, batch, rng=None, epoch: int = 0, deterministic: bool = False):
        est = self.forward(
            params, batch["input_signal"], batch["input_length"],
            deterministic=deterministic,
            rngs={"dropout": rng} if rng is not None else None,
        )
        loss = sdr_loss(
            est, batch["target_signal"], batch["input_length"],
            scale_invariant=(self.loss_type == "si_sdr"),
        )
        return loss, {"loss": loss}


# ---------------------------------------------------------------------------
# Multi-channel: mask-based MVDR beamforming
# ---------------------------------------------------------------------------
#
# The reference's beamforming recipe (examples/audio_tasks/conf/
# beamforming.yaml:63) targets `...audio_modules.MaskBasedBeamformer`, a class
# absent from the reference's own tree — the config cannot run upstream.
# This is the working TPU implementation: per-channel DFT-matmul STFT, a
# shared mask estimator, masked spatial covariance matrices, and an MVDR
# solution in the Souden formulation, all batched over frequency so the
# C-by-C solves vectorize ([B, F, C, C] einsums + one small linalg.solve —
# C is 2-8, F carries the parallelism the hardware wants).


def estimate_scms(re, im, mask):
    """Masked spatial covariance matrices.

    re/im: [B, C, F, T] per-channel spectra; mask: [B, F, T] in [0, 1].
    Returns a complex64 [B, F, C, C] SCM: sum_t m(f,t) x xH / sum_t m.
    """
    x = jax.lax.complex(re, im)  # [B, C, F, T]
    w = mask.astype(re.dtype)
    num = jnp.einsum("bft,bcft,bdft->bfcd", jax.lax.complex(w, jnp.zeros_like(w)),
                     x, jnp.conj(x))
    den = jnp.sum(w, axis=-1)[..., None, None] + 1e-8  # [B, F, 1, 1]
    return num / den.astype(num.dtype)


def mvdr_souden_weights(phi_s, phi_n, ref_channel: int = 0,
                        diag_loading: float = 1e-6):
    """MVDR beamforming weights, Souden et al. 2010 formulation:

        w(f) = (Phi_n^-1 Phi_s / trace(Phi_n^-1 Phi_s)) u_ref

    No steering-vector estimation needed — the masked SCMs carry the
    spatial information.  phi_s/phi_n: [B, F, C, C] complex; returns
    w [B, F, C] complex.  Diagonal loading regularizes Phi_n.
    """
    c = phi_n.shape[-1]
    eye = jnp.eye(c, dtype=phi_n.dtype)
    trace_n = jnp.trace(phi_n, axis1=-2, axis2=-1)[..., None, None]
    phi_n = phi_n + (diag_loading * trace_n + 1e-10) * eye
    num = jnp.linalg.solve(phi_n, phi_s)  # Phi_n^-1 Phi_s  [B, F, C, C]
    denom = jnp.trace(num, axis1=-2, axis2=-1)[..., None, None]
    w_mat = num / (denom + 1e-10)
    return w_mat[..., ref_channel]  # [B, F, C]


class MaskBasedBeamformer:
    """Mask-based MVDR processor: (multi-channel spectra, speech/noise
    masks) -> single-channel beamformed spectrum.

    The functional core of the reference's missing MaskBasedBeamformer
    (beamforming.yaml mask_processor).  `ref_channel` selects the output
    reference as in the reference config.
    """

    def __init__(self, ref_channel: int = 0, diag_loading: float = 1e-6):
        self.ref_channel = ref_channel
        self.diag_loading = diag_loading

    def __call__(self, re, im, speech_mask, noise_mask=None):
        """re/im: [B, C, F, T]; speech_mask: [B, F, T] -> (re, im) [B, F, T]."""
        if noise_mask is None:
            noise_mask = 1.0 - speech_mask
        phi_s = estimate_scms(re, im, speech_mask)
        phi_n = estimate_scms(re, im, noise_mask)
        w = mvdr_souden_weights(
            phi_s, phi_n, self.ref_channel, self.diag_loading
        )  # [B, F, C]
        x = jax.lax.complex(re, im)  # [B, C, F, T]
        y = jnp.einsum("bfc,bcft->bft", jnp.conj(w), x)
        return jnp.real(y), jnp.imag(y)


class MaskBasedBeamformerModel(EncMaskDecEnhancementModel):
    """Multi-channel enhancement task: per-channel STFT -> shared mask
    estimator on the reference channel -> MVDR beamformer -> ISTFT,
    trained with (SI-)SDR against the single-channel target — the runnable
    version of the reference's beamforming.yaml model section.

    Batches carry `input_signal` [B, C, S] (C mics), `target_signal`
    [B, S], `input_length` [B].
    """

    def __init__(self, cfg: Dict[str, Any]):
        super().__init__(cfg)
        self.beamformer = MaskBasedBeamformer(
            ref_channel=cfg.get("ref_channel", 0),
            diag_loading=cfg.get("diag_loading", 1e-6),
        )

    def _encode_channels(self, audio):
        """[B, C, S] -> re/im [B, C, F, T] via the shared DFT-matmul STFT."""
        b, c, s = audio.shape
        re, im = self.encode(audio.reshape(b * c, s))
        f, t = re.shape[-2:]
        return re.reshape(b, c, f, t), im.reshape(b, c, f, t)

    def forward(self, params, audio, audio_len, deterministic=True, rngs=None):
        re, im = self._encode_channels(jnp.asarray(audio))
        ref = self.beamformer.ref_channel
        logmag = jnp.log1p(
            jnp.sqrt(re[:, ref] ** 2 + im[:, ref] ** 2)
        )  # [B, F, T]
        feats = jnp.swapaxes(logmag, 1, 2)  # [B, T, F]
        t = feats.shape[1]
        frame_lens = audio_len // self.hop_length + 1
        fmask = mask_from_lens(frame_lens, t)[..., None].astype(feats.dtype)
        mask = self.mask_estimator.apply(
            params, feats, fmask, deterministic=deterministic, rngs=rngs
        )  # [B, T, F] speech mask
        mask = jnp.swapaxes(mask, 1, 2)  # [B, F, T]
        # zero padded frames out of the SCM sums on both masks
        valid = jnp.swapaxes(fmask, 1, 2)  # [B, 1, T] -> broadcast [B, F, T]
        out_re, out_im = self.beamformer(
            re, im, mask * valid, (1.0 - mask) * valid
        )
        return self.decode(out_re, out_im, audio.shape[-1])

    def init_params(self, rng, batch):
        audio = jnp.asarray(batch["input_signal"])

        @jax.jit
        def _init(rng, audio):
            re, im = self._encode_channels(audio)
            ref = self.beamformer.ref_channel
            feats = jnp.swapaxes(
                jnp.log1p(jnp.sqrt(re[:, ref] ** 2 + im[:, ref] ** 2)), 1, 2
            )
            fmask = jnp.ones(feats.shape[:2] + (1,), feats.dtype)
            return self.mask_estimator.init(rng, feats, fmask)

        return _init(rng, audio)
