"""FastPitch (flax.linen): parallel text->mel with learned alignment.

Re-design of roar/collections/tts/modules/fastpitch.py:93-480
(TemporalPredictor, FastPitchModule): encoder FFT -> duration/pitch/energy
predictors -> aligner + on-device MAS -> pitch/energy embedding convs ->
length regulation -> decoder FFT -> mel projection.

Static-shape discipline for jit: the decoder length is the (bucketed) mel
frame count `max_mel_len` — during training it is spec.shape[1], during
inference a caller-chosen bucket — and `regulate_len` masks beyond the true
data-dependent decoded length.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.models.aligner import AlignmentEncoder
from roar_tpu.models.submodules import ConditionalInput, ConditionalLayerNorm
from roar_tpu.models.transformer import FFTransformerDecoder, FFTransformerEncoder
from roar_tpu.ops.lengths import average_features, log_to_duration, regulate_len
from roar_tpu.ops.mas import binarize_attention


class ConvReLUNorm(nn.Module):
    """Conv1d -> ReLU -> ConditionalLayerNorm -> Dropout
    (modules/fastpitch.py:60-91), [B, T, C] layout."""

    out_channels: int
    kernel_size: int = 1
    dropout: float = 0.0
    condition_dim: int = 384
    condition_types: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, conditioning=None, deterministic=True):
        x = nn.relu(nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME")(x))
        x = ConditionalLayerNorm(
            self.out_channels, self.condition_dim, self.condition_types, name="norm"
        )(x, conditioning)
        return nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)


class TemporalPredictor(nn.Module):
    """Predicts one float per time step (modules/fastpitch.py:93-150)."""

    input_size: int
    filter_size: int
    kernel_size: int
    dropout: float
    n_layers: int = 2
    condition_types: Sequence[str] = ()

    @nn.compact
    def __call__(self, enc, enc_mask, conditioning=None, deterministic=True):
        # enc: [B, T, C]; enc_mask: [B, T, 1]
        x = ConditionalInput(
            self.input_size, self.input_size, self.condition_types, name="cond_input"
        )(enc, conditioning)
        x = x * enc_mask
        for i in range(self.n_layers):
            x = ConvReLUNorm(
                self.filter_size,
                self.kernel_size,
                self.dropout,
                condition_dim=self.input_size,
                condition_types=self.condition_types,
                name=f"layers_{i}",
            )(x, conditioning, deterministic=deterministic)
        x = nn.Dense(1, name="fc")(x) * enc_mask
        return x[..., 0]


@dataclasses.dataclass(frozen=True)
class FFTConfig:
    """One FFT stack's hyperparameters (fastpitch_22050_align.yaml:155-181)."""

    n_layer: int = 6
    n_head: int = 1
    d_model: int = 384
    d_head: int = 64
    d_inner: int = 1536
    kernel_size: int = 3
    dropout: float = 0.1
    dropatt: float = 0.1
    dropemb: float = 0.0
    pre_lnorm: bool = False
    condition_types: Sequence[str] = ()
    use_rope: bool = False
    use_flash: bool = False
    encoder_type: str = "transformer"  # or "conformer"
    adapter_dim: int = 0  # >0 inserts bottleneck adapters per layer
    remat: bool = False  # recompute layer activations in backward (saves HBM traffic)


@dataclasses.dataclass(frozen=True)
class PredictorConfig:
    input_size: int = 384
    kernel_size: int = 3
    filter_size: int = 256
    dropout: float = 0.1
    n_layers: int = 2
    condition_types: Sequence[str] = ()


@dataclasses.dataclass(frozen=True)
class AlignerConfig:
    n_text_channels: int = 384
    n_att_channels: int = 80
    temperature: float = 0.0005
    condition_types: Sequence[str] = ()
    dist_type: str = "l2"


def make_encoder(cfg: FFTConfig, n_embed: int, d_embed: int, padding_idx: int):
    """Encoder factory: FFT transformer or Conformer per cfg.encoder_type."""
    common = dict(
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        d_model=cfg.d_model,
        d_head=cfg.d_head,
        d_inner=cfg.d_inner,
        kernel_size=cfg.kernel_size,
        dropout=cfg.dropout,
        dropatt=cfg.dropatt,
        n_embed=n_embed,
        d_embed=d_embed,
        padding_idx=padding_idx,
        dropemb=cfg.dropemb,
        condition_types=cfg.condition_types,
        use_rope=cfg.use_rope,
        use_flash=cfg.use_flash,
    )
    if cfg.encoder_type == "conformer":
        from roar_tpu.models.conformer import FFConformerEncoder

        return FFConformerEncoder(**common)
    return FFTransformerEncoder(
        pre_lnorm=cfg.pre_lnorm, adapter_dim=cfg.adapter_dim, remat=cfg.remat,
        **common
    )


def make_decoder(cfg: FFTConfig):
    common = dict(
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        d_model=cfg.d_model,
        d_head=cfg.d_head,
        d_inner=cfg.d_inner,
        kernel_size=cfg.kernel_size,
        dropout=cfg.dropout,
        dropatt=cfg.dropatt,
        dropemb=cfg.dropemb,
        condition_types=cfg.condition_types,
        use_rope=cfg.use_rope,
        use_flash=cfg.use_flash,
    )
    if cfg.encoder_type == "conformer":
        from roar_tpu.models.conformer import FFConformerDecoder

        return FFConformerDecoder(**common)
    return FFTransformerDecoder(
        pre_lnorm=cfg.pre_lnorm, adapter_dim=cfg.adapter_dim, remat=cfg.remat,
        **common
    )


class FastPitchModule(nn.Module):
    """The full FastPitch graph."""

    n_symbols: int
    padding_idx: int = 0
    encoder: FFTConfig = FFTConfig()
    decoder: FFTConfig = FFTConfig()
    duration_predictor: PredictorConfig = PredictorConfig()
    pitch_predictor: PredictorConfig = PredictorConfig()
    energy_predictor: Optional[PredictorConfig] = None
    aligner: Optional[AlignerConfig] = AlignerConfig()
    n_speakers: int = 1
    symbols_embedding_dim: int = 384
    pitch_embedding_kernel_size: int = 3
    energy_embedding_kernel_size: int = 3
    n_mel_channels: int = 80
    min_token_duration: int = 0
    max_token_duration: int = 75
    use_log_energy: bool = True

    # speaker conditioning routing (models/fastpitch.py:145-159)
    speaker_emb_condition_prosody: bool = False
    speaker_emb_condition_decoder: bool = False
    speaker_emb_condition_aligner: bool = False
    # reference-audio style conditioning (GST, submodules.py:620-829)
    use_gst: bool = False
    gst_size: int = 0  # 0 -> symbols_embedding_dim

    @property
    def learn_alignment(self) -> bool:
        return self.aligner is not None

    def setup(self):
        enc = self.encoder
        self.encoder_module = make_encoder(
            enc,
            n_embed=self.n_symbols,
            d_embed=self.symbols_embedding_dim,
            padding_idx=self.padding_idx,
        )
        dec = self.decoder
        self.decoder_module = make_decoder(dec)
        dp = self.duration_predictor
        self.duration_predictor_module = TemporalPredictor(
            dp.input_size, dp.filter_size, dp.kernel_size, dp.dropout, dp.n_layers, dp.condition_types
        )
        pp = self.pitch_predictor
        self.pitch_predictor_module = TemporalPredictor(
            pp.input_size, pp.filter_size, pp.kernel_size, pp.dropout, pp.n_layers, pp.condition_types
        )
        if self.energy_predictor is not None:
            ep = self.energy_predictor
            self.energy_predictor_module = TemporalPredictor(
                ep.input_size, ep.filter_size, ep.kernel_size, ep.dropout, ep.n_layers, ep.condition_types
            )
        if self.aligner is not None:
            al = self.aligner
            self.aligner_module = AlignmentEncoder(
                n_mel_channels=self.n_mel_channels,
                n_text_channels=al.n_text_channels,
                n_att_channels=al.n_att_channels,
                temperature=al.temperature,
                condition_types=al.condition_types,
                dist_type=al.dist_type,
            )
        if self.n_speakers > 1:
            self.speaker_table = nn.Embed(self.n_speakers, self.symbols_embedding_dim)
        if self.use_gst:
            from roar_tpu.models.submodules import GlobalStyleToken

            self.gst_module = GlobalStyleToken(
                gst_size=self.gst_size or self.symbols_embedding_dim
            )
        self.pitch_emb = nn.Conv(
            self.symbols_embedding_dim,
            (self.pitch_embedding_kernel_size,),
            padding="SAME",
        )
        if self.energy_predictor is not None:
            self.energy_emb = nn.Conv(
                self.symbols_embedding_dim,
                (self.energy_embedding_kernel_size,),
                padding="SAME",
            )
        self.proj = nn.Dense(self.n_mel_channels)

    def get_speaker_embedding(self, speaker, reference_spec=None, reference_spec_lens=None):
        """Combine lookup and/or GST reference-audio embeddings
        (models/fastpitch.py:262-277 get_speaker_embedding)."""
        emb = None
        if self.n_speakers > 1 and speaker is not None:
            emb = self.speaker_table(speaker)[:, None, :]  # [B, 1, D]
        if self.use_gst and reference_spec is not None:
            gst = self.gst_module(reference_spec, reference_spec_lens)[:, None, :]
            emb = gst if emb is None else emb + gst
        return emb

    def __call__(
        self,
        text: jnp.ndarray,
        durs: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,
        energy: Optional[jnp.ndarray] = None,
        speaker: Optional[jnp.ndarray] = None,
        pace: float = 1.0,
        spec: Optional[jnp.ndarray] = None,
        attn_prior: Optional[jnp.ndarray] = None,
        mel_lens: Optional[jnp.ndarray] = None,
        input_lens: Optional[jnp.ndarray] = None,
        max_mel_len: Optional[int] = None,
        reference_spec: Optional[jnp.ndarray] = None,
        reference_spec_lens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Training/teacher-forced forward (modules/fastpitch.py:280-405).

        spec: [B, T_mel, n_mel] ground-truth mel (channels-last) when
        learning alignment.  Returns a dict of outputs.
        """
        spk_emb = self.get_speaker_embedding(speaker, reference_spec, reference_spec_lens)
        prosody_cond = spk_emb if self.speaker_emb_condition_prosody else None
        decoder_cond = spk_emb if self.speaker_emb_condition_decoder else None
        aligner_cond = spk_emb if self.speaker_emb_condition_aligner else None

        enc_out, enc_mask = self.encoder_module(
            text, conditioning=spk_emb, deterministic=deterministic
        )

        log_durs_predicted = self.duration_predictor_module(
            enc_out, enc_mask, prosody_cond, deterministic=deterministic
        )
        durs_predicted = log_to_duration(
            log_durs_predicted,
            self.min_token_duration,
            self.max_token_duration,
            enc_mask[..., 0],
        )

        attn_soft = attn_hard = attn_hard_dur = attn_logprob = None
        if self.learn_alignment and spec is not None:
            text_emb, _ = self.encoder_module.embed(text)
            attn_soft, attn_logprob = self.aligner_module(
                spec,
                text_emb,
                key_mask=enc_mask[..., 0] > 0,
                attn_prior=attn_prior,
                conditioning=aligner_cond,
            )
            attn_hard = binarize_attention(attn_soft, input_lens, mel_lens)
            attn_hard_dur = jnp.sum(attn_hard[:, 0], axis=1)  # [B, T_text]

        pitch_predicted = self.pitch_predictor_module(
            enc_out, enc_mask, prosody_cond, deterministic=deterministic
        )
        if pitch is not None:
            if self.learn_alignment and pitch.shape[-1] != pitch_predicted.shape[-1]:
                pitch_tok = average_features(pitch[:, None, :], attn_hard_dur)[:, 0]
            elif not self.learn_alignment:
                pitch_tok = average_features(pitch[:, None, :], durs_predicted)[:, 0]
            else:
                pitch_tok = pitch
            # embed in the activation dtype: pitch_tok stays fp32 (loss
            # target), but an fp32 conv input here would promote enc_out —
            # and everything downstream — out of bf16
            pitch_emb = self.pitch_emb(pitch_tok[..., None].astype(enc_out.dtype))
        else:
            pitch_tok = None
            pitch_emb = self.pitch_emb(pitch_predicted[..., None])
        enc_out = enc_out + pitch_emb

        energy_pred = energy_tgt = None
        if self.energy_predictor is not None:
            energy_pred = self.energy_predictor_module(
                enc_out, enc_mask, prosody_cond, deterministic=deterministic
            )
            if energy is not None:
                durs_for_energy = (
                    attn_hard_dur if self.learn_alignment else durs_predicted
                )
                energy_tgt = average_features(energy[:, None, :], durs_for_energy)
                if self.use_log_energy:
                    energy_tgt = jnp.log(1.0 + energy_tgt)
                energy_emb = self.energy_emb(
                    energy_tgt[:, 0, :, None].astype(enc_out.dtype)
                )
                energy_tgt = energy_tgt[:, 0]
            else:
                energy_emb = self.energy_emb(energy_pred[..., None])
            enc_out = enc_out + energy_emb

        if max_mel_len is None:
            max_mel_len = spec.shape[1] if spec is not None else None
        if self.learn_alignment and spec is not None:
            len_regulated, dec_lens = regulate_len(
                attn_hard_dur, enc_out, pace, max_len=max_mel_len
            )
        elif spec is None and durs is not None:
            len_regulated, dec_lens = regulate_len(durs, enc_out, pace, max_len=max_mel_len)
        elif spec is None:
            len_regulated, dec_lens = regulate_len(
                durs_predicted, enc_out, pace, max_len=max_mel_len
            )
        else:
            raise ValueError("spec provided but alignment is not learned")

        from roar_tpu.ops.lengths import mask_from_lens

        dec_mask = mask_from_lens(dec_lens, len_regulated.shape[1])[..., None].astype(
            len_regulated.dtype
        )
        dec_out, _ = self.decoder_module(
            len_regulated, dec_mask, decoder_cond, deterministic=deterministic
        )
        spect = self.proj(dec_out)  # [B, T_mel, n_mel]

        return {
            "spect": spect,
            "num_frames": dec_lens,
            "durs_predicted": durs_predicted,
            "log_durs_predicted": log_durs_predicted,
            "pitch_predicted": pitch_predicted,
            "attn_soft": attn_soft,
            "attn_logprob": attn_logprob,
            "attn_hard": attn_hard,
            "attn_hard_dur": attn_hard_dur,
            "pitch": pitch_tok,
            "energy_pred": energy_pred,
            "energy_tgt": energy_tgt,
        }

    def infer(
        self,
        text: jnp.ndarray,
        pitch: Optional[jnp.ndarray] = None,
        speaker: Optional[jnp.ndarray] = None,
        energy: Optional[jnp.ndarray] = None,
        pace: float = 1.0,
        max_mel_len: int = 2048,
        reference_spec: Optional[jnp.ndarray] = None,
        reference_spec_lens: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Inference path (modules/fastpitch.py:407-480); static max_mel_len
        chooses the decoder bucket."""
        spk_emb = self.get_speaker_embedding(speaker, reference_spec, reference_spec_lens)
        prosody_cond = spk_emb if self.speaker_emb_condition_prosody else None
        decoder_cond = spk_emb if self.speaker_emb_condition_decoder else None

        enc_out, enc_mask = self.encoder_module(text, conditioning=spk_emb)
        log_durs_predicted = self.duration_predictor_module(enc_out, enc_mask, prosody_cond)
        durs_predicted = log_to_duration(
            log_durs_predicted,
            self.min_token_duration,
            self.max_token_duration,
            enc_mask[..., 0],
        )
        pitch_predicted = self.pitch_predictor_module(enc_out, enc_mask, prosody_cond)
        if pitch is not None:
            pitch_predicted = pitch_predicted + pitch
        enc_out = enc_out + self.pitch_emb(pitch_predicted[..., None])

        if self.energy_predictor is not None:
            if energy is not None:
                enc_out = enc_out + self.energy_emb(energy[..., None])
            else:
                energy_pred = self.energy_predictor_module(enc_out, enc_mask, prosody_cond)
                enc_out = enc_out + self.energy_emb(energy_pred[..., None])

        len_regulated, dec_lens = regulate_len(
            durs_predicted, enc_out, pace, max_len=max_mel_len
        )
        from roar_tpu.ops.lengths import mask_from_lens

        dec_mask = mask_from_lens(dec_lens, max_mel_len)[..., None].astype(
            len_regulated.dtype
        )
        dec_out, _ = self.decoder_module(len_regulated, dec_mask, decoder_cond)
        spect = self.proj(dec_out)
        return {
            "spect": spect,
            "num_frames": dec_lens,
            "durs_predicted": durs_predicted,
            "log_durs_predicted": log_durs_predicted,
            "pitch_predicted": pitch_predicted,
        }
