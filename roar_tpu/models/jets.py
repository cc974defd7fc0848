"""JETS: joint end-to-end text->wav (FastPitch graph + HiFi-GAN generator).

Re-design of roar/collections/tts/modules/jets.py:182-560 `JETSModule`:
identical variance-adaptor pipeline to FastPitch except (a) the aligner keys
are the encoder output rather than raw token embeddings (jets.py:357-365),
(b) there is no mel projection — the decoder output is randomly sliced into
`segment_size`-frame segments (static size -> static shapes under jit) and
vocoded by a HiFi-GAN Generator (jets.py:425-433).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.models.aligner import AlignmentEncoder
from roar_tpu.models.fastpitch import AlignerConfig, FFTConfig, PredictorConfig, TemporalPredictor
from roar_tpu.models.hifigan import Generator
from roar_tpu.ops.lengths import (
    average_features,
    log_to_duration,
    mask_from_lens,
    rand_slice_segments,
    regulate_len,
)
from roar_tpu.ops.mas import binarize_attention


class JETSModule(nn.Module):
    n_symbols: int
    padding_idx: int = 0
    encoder: FFTConfig = FFTConfig()
    decoder: FFTConfig = FFTConfig()
    duration_predictor: PredictorConfig = PredictorConfig()
    pitch_predictor: PredictorConfig = PredictorConfig()
    energy_predictor: Optional[PredictorConfig] = None
    aligner: Optional[AlignerConfig] = AlignerConfig()
    generator: Generator = None  # type: ignore[assignment]
    n_speakers: int = 1
    symbols_embedding_dim: int = 384
    pitch_embedding_kernel_size: int = 3
    energy_embedding_kernel_size: int = 3
    segment_size: int = 64
    n_mel_channels: int = 80
    min_token_duration: int = 0
    max_token_duration: int = 75
    use_log_energy: bool = True
    speaker_emb_condition_prosody: bool = False
    speaker_emb_condition_decoder: bool = False
    speaker_emb_condition_aligner: bool = False

    @property
    def learn_alignment(self) -> bool:
        return self.aligner is not None

    def setup(self):
        from roar_tpu.models.fastpitch import make_decoder, make_encoder

        self.encoder_module = make_encoder(
            self.encoder,
            n_embed=self.n_symbols,
            d_embed=self.symbols_embedding_dim,
            padding_idx=self.padding_idx,
        )
        self.decoder_module = make_decoder(self.decoder)
        dp, pp = self.duration_predictor, self.pitch_predictor
        self.duration_predictor_module = TemporalPredictor(
            dp.input_size, dp.filter_size, dp.kernel_size, dp.dropout, dp.n_layers, dp.condition_types
        )
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
        self.pitch_emb = nn.Conv(
            self.symbols_embedding_dim, (self.pitch_embedding_kernel_size,), padding="SAME"
        )
        if self.energy_predictor is not None:
            self.energy_emb = nn.Conv(
                self.symbols_embedding_dim, (self.energy_embedding_kernel_size,), padding="SAME"
            )
        self.waveform_generator = self.generator

    def get_speaker_embedding(self, speaker):
        if self.n_speakers <= 1 or speaker is None:
            return None
        return self.speaker_table(speaker)[:, None, :]

    def _variance_adaptor(
        self, text, pitch, energy, speaker, spec, attn_prior, mel_lens, input_lens,
        deterministic,
    ):
        spk_emb = self.get_speaker_embedding(speaker)
        prosody_cond = spk_emb if self.speaker_emb_condition_prosody else None
        aligner_cond = spk_emb if self.speaker_emb_condition_aligner else None

        enc_out, enc_mask = self.encoder_module(
            text, conditioning=spk_emb, deterministic=deterministic
        )
        log_durs_predicted = self.duration_predictor_module(
            enc_out, enc_mask, prosody_cond, deterministic=deterministic
        )
        durs_predicted = log_to_duration(
            log_durs_predicted, self.min_token_duration, self.max_token_duration,
            enc_mask[..., 0],
        )

        attn_soft = attn_hard = attn_hard_dur = attn_logprob = None
        if self.learn_alignment and spec is not None:
            # JETS aligner keys are the ENCODER OUTPUT (jets.py:357-365)
            attn_soft, attn_logprob = self.aligner_module(
                spec, enc_out, key_mask=enc_mask[..., 0] > 0,
                attn_prior=attn_prior, conditioning=aligner_cond,
            )
            attn_hard = binarize_attention(attn_soft, input_lens, mel_lens)
            attn_hard_dur = jnp.sum(attn_hard[:, 0], axis=1)

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
                durs_for_energy = attn_hard_dur if self.learn_alignment else durs_predicted
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

        return {
            "enc_out": enc_out,
            "spk_emb": spk_emb,
            "durs_predicted": durs_predicted,
            "log_durs_predicted": log_durs_predicted,
            "pitch_predicted": pitch_predicted,
            "pitch": pitch_tok,
            "energy_pred": energy_pred,
            "energy_tgt": energy_tgt,
            "attn_soft": attn_soft,
            "attn_logprob": attn_logprob,
            "attn_hard": attn_hard,
            "attn_hard_dur": attn_hard_dur,
        }

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
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        va = self._variance_adaptor(
            text, pitch, energy, speaker, spec, attn_prior, mel_lens, input_lens,
            deterministic,
        )
        decoder_cond = va["spk_emb"] if self.speaker_emb_condition_decoder else None

        if max_mel_len is None:
            max_mel_len = spec.shape[1] if spec is not None else None
        if self.learn_alignment and spec is not None:
            len_regulated, dec_lens = regulate_len(
                va["attn_hard_dur"], va["enc_out"], pace, max_len=max_mel_len
            )
        elif spec is None and durs is not None:
            len_regulated, dec_lens = regulate_len(durs, va["enc_out"], pace, max_len=max_mel_len)
        elif spec is None:
            len_regulated, dec_lens = regulate_len(
                va["durs_predicted"], va["enc_out"], pace, max_len=max_mel_len
            )
        else:
            raise ValueError("spec provided but alignment is not learned")

        dec_mask = mask_from_lens(dec_lens, len_regulated.shape[1])[..., None].astype(
            len_regulated.dtype
        )
        dec_out, _ = self.decoder_module(
            len_regulated, dec_mask, decoder_cond, deterministic=deterministic
        )

        seg_rng = self.make_rng("segments")
        segments, z_start_idxs = rand_slice_segments(
            seg_rng, jnp.swapaxes(dec_out, 1, 2), mel_lens, self.segment_size
        )
        wav = self.waveform_generator(jnp.swapaxes(segments, 1, 2))

        out = dict(va)
        out.pop("enc_out")
        out.pop("spk_emb")
        out.update({"wav": wav, "num_frames": dec_lens, "z_start_idxs": z_start_idxs})
        return out

    def infer(
        self,
        text: jnp.ndarray,
        pitch: Optional[jnp.ndarray] = None,
        speaker: Optional[jnp.ndarray] = None,
        energy: Optional[jnp.ndarray] = None,
        pace: float = 1.0,
        max_mel_len: int = 2048,
    ) -> Dict[str, Any]:
        """Full-utterance synthesis (jets.py:448-560)."""
        spk_emb = self.get_speaker_embedding(speaker)
        prosody_cond = spk_emb if self.speaker_emb_condition_prosody else None
        decoder_cond = spk_emb if self.speaker_emb_condition_decoder else None

        enc_out, enc_mask = self.encoder_module(text, conditioning=spk_emb)
        log_durs_predicted = self.duration_predictor_module(enc_out, enc_mask, prosody_cond)
        durs_predicted = log_to_duration(
            log_durs_predicted, self.min_token_duration, self.max_token_duration,
            enc_mask[..., 0],
        )
        if pitch is not None:
            pitch_emb = self.pitch_emb(pitch[..., None])
        else:
            pitch_pred = self.pitch_predictor_module(enc_out, enc_mask, prosody_cond)
            pitch_emb = self.pitch_emb(pitch_pred[..., None])
        enc_out = enc_out + pitch_emb

        if self.energy_predictor is not None:
            if energy is not None:
                enc_out = enc_out + self.energy_emb(energy[..., None])
            else:
                energy_pred = self.energy_predictor_module(enc_out, enc_mask, prosody_cond)
                enc_out = enc_out + self.energy_emb(energy_pred[..., None])

        len_regulated, dec_lens = regulate_len(
            durs_predicted, enc_out, pace, max_len=max_mel_len
        )
        dec_mask = mask_from_lens(dec_lens, max_mel_len)[..., None].astype(
            len_regulated.dtype
        )
        dec_out, _ = self.decoder_module(len_regulated, dec_mask, decoder_cond)
        wav = self.waveform_generator(dec_out)
        return {
            "wav": wav,
            "num_frames": dec_lens,
            "durs_predicted": durs_predicted,
            "log_durs_predicted": log_durs_predicted,
        }
