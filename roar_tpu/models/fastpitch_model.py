"""FastPitchModel: config-driven task wrapper (the L4 "model" layer).

Re-design of roar/collections/tts/models/fastpitch.py:74-955 — the
LightningModule becomes a pure-functional task object: it builds the
tokenizer + FastPitchModule + mel front-end from a reference-style YAML
config dict, and exposes `loss_fn` / `train_step` / `validation` as jittable
functions over an explicit TrainState.  The mel preprocessor runs inside the
jitted step on device (the reference computes mels in
training_step via FilterbankFeatures on GPU, models/fastpitch.py:404-416).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from roar_tpu.config import instantiate
from roar_tpu.losses.fastpitch_losses import (
    duration_loss,
    energy_loss,
    mel_loss,
    pitch_loss,
)
from roar_tpu.models.fastpitch import (
    AlignerConfig,
    FastPitchModule,
    FFTConfig,
    PredictorConfig,
)
from roar_tpu.ops.forward_sum import bin_loss, forward_sum_loss
from roar_tpu.ops.spectrogram import MelConfig, log_mel_spectrogram


_CONDITIONED_BLOCKS = (
    "input_fft", "output_fft", "duration_predictor", "pitch_predictor",
    "energy_predictor", "alignment_module",
)


def strip_inert_conditioning(cfg: Dict[str, Any], n_speakers: int, use_gst: bool) -> Dict[str, Any]:
    """With no conditioning source (single speaker, no GST) the speaker
    embedding is always None, and ConditionalInput/ConditionalLayerNorm
    would raise at trace time (reference submodules.py:594-604 does the
    same).  The shipped recipes are multispeaker-conditioned, so make the
    single-speaker case work by dropping condition_types with a warning."""
    if n_speakers > 1 or use_gst:
        return cfg
    if not any((cfg.get(k) or {}).get("condition_types") for k in _CONDITIONED_BLOCKS):
        return cfg
    import warnings

    warnings.warn(
        "n_speakers<=1 with no GST: speaker conditioning has no source; "
        "dropping condition_types from all sub-modules"
    )
    cfg = dict(cfg)
    for k in _CONDITIONED_BLOCKS:
        if cfg.get(k) and cfg[k].get("condition_types"):
            cfg[k] = {**cfg[k], "condition_types": []}
    return cfg


def _fft_config(cfg: Dict[str, Any]) -> FFTConfig:
    target = cfg.get("_target_", "")
    enc_type = cfg.get(
        "encoder_type", "conformer" if "Conformer" in target else "transformer"
    )
    return FFTConfig(
        n_layer=cfg.get("n_layer", 6),
        n_head=cfg.get("n_head", 1),
        d_model=cfg.get("d_model", 384),
        d_head=cfg.get("d_head", 64),
        d_inner=cfg.get("d_inner", 1536),
        kernel_size=cfg.get("kernel_size", 3),
        dropout=cfg.get("dropout", 0.1),
        dropatt=cfg.get("dropatt", 0.1),
        dropemb=cfg.get("dropemb", 0.0),
        pre_lnorm=cfg.get("pre_lnorm", False),
        condition_types=tuple(cfg.get("condition_types", ())),
        use_rope=cfg.get("use_rope", False),
        use_flash=cfg.get("use_flash", cfg.get("use_flash_attention", False)),
        encoder_type=enc_type,
        adapter_dim=cfg.get("adapter_dim", 0),
        remat=cfg.get("remat", False),
    )


def _predictor_config(cfg: Dict[str, Any]) -> PredictorConfig:
    return PredictorConfig(
        input_size=cfg.get("input_size", 384),
        kernel_size=cfg.get("kernel_size", 3),
        filter_size=cfg.get("filter_size", 256),
        dropout=cfg.get("dropout", 0.1),
        n_layers=cfg.get("n_layers", 2),
        condition_types=tuple(cfg.get("condition_types", ())),
    )


def preprocessor_config(cfg: Dict[str, Any]) -> MelConfig:
    """Translate the reference AudioToMelSpectrogramPreprocessor YAML block
    (fastpitch_22050_align.yaml:132-153) into a MelConfig."""
    lzgv = cfg.get("log_zero_guard_value", 2 ** -24)
    if isinstance(lzgv, str) and lzgv not in ("tiny", "eps"):
        lzgv = float(lzgv)
    return MelConfig(
        sample_rate=cfg.get("sample_rate", 16000),
        n_window_size=cfg.get("n_window_size", 320),
        n_window_stride=cfg.get("n_window_stride", 160),
        window=cfg.get("window", "hann"),
        normalize=cfg.get("normalize"),
        n_fft=cfg.get("n_fft"),
        preemph=cfg.get("preemph", 0.97),
        nfilt=cfg.get("features", cfg.get("nfilt", 64)),
        lowfreq=cfg.get("lowfreq", 0),
        highfreq=cfg.get("highfreq"),
        log=cfg.get("log", True),
        log_zero_guard_type=cfg.get("log_zero_guard_type", "add"),
        log_zero_guard_value=lzgv,
        dither=cfg.get("dither", 1e-5),
        pad_to=cfg.get("pad_to", 16),
        exact_pad=cfg.get("exact_pad", False),
        pad_value=cfg.get("pad_value", 0),
        mag_power=cfg.get("mag_power", 2.0),
        mel_norm=cfg.get("mel_norm", "slaney"),
    )


class FastPitchModel:
    """Task wrapper: config -> module + losses + steps."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        tok_cfg = cfg.get("text_tokenizer")
        self.tokenizer = instantiate(tok_cfg) if tok_cfg else None
        self._setup_normalizer(cfg)
        n_symbols = cfg.get("n_symbols") or len(self.tokenizer.tokens)
        padding_idx = (
            self.tokenizer.pad if self.tokenizer is not None else cfg.get("padding_idx", 0)
        )

        self.mel_cfg = preprocessor_config(cfg.get("preprocessor", {}))
        n_speakers = cfg.get("n_speakers", 1)
        spk_cfg = cfg.get("speaker_encoder") or {}
        lookup = (spk_cfg.get("lookup_module") or {}) if spk_cfg else {}
        if lookup.get("n_speakers"):
            n_speakers = lookup["n_speakers"]

        cfg = strip_inert_conditioning(cfg, n_speakers, bool(cfg.get("use_gst")))
        energy_cfg = cfg.get("energy_predictor")
        aligner_cfg = cfg.get("alignment_module")
        self.learn_alignment = cfg.get("learn_alignment", aligner_cfg is not None)

        cond_on = lambda key: bool(cfg.get(key, False)) or n_speakers > 1

        self.module = FastPitchModule(
            n_symbols=n_symbols,
            padding_idx=padding_idx,
            encoder=_fft_config(cfg.get("input_fft", {})),
            decoder=_fft_config(cfg.get("output_fft", {})),
            duration_predictor=_predictor_config(cfg.get("duration_predictor", {})),
            pitch_predictor=_predictor_config(cfg.get("pitch_predictor", {})),
            energy_predictor=_predictor_config(energy_cfg) if energy_cfg else None,
            aligner=AlignerConfig(
                n_text_channels=(aligner_cfg or {}).get(
                    "n_text_channels", cfg.get("symbols_embedding_dim", 384)
                ),
                n_att_channels=(aligner_cfg or {}).get("n_att_channels", 80),
                temperature=(aligner_cfg or {}).get("temperature", 0.0005),
                condition_types=tuple((aligner_cfg or {}).get("condition_types", ())),
                dist_type=(aligner_cfg or {}).get("dist_type", "l2"),
            )
            if self.learn_alignment
            else None,
            n_speakers=n_speakers,
            symbols_embedding_dim=cfg.get("symbols_embedding_dim", 384),
            pitch_embedding_kernel_size=cfg.get("pitch_embedding_kernel_size", 3),
            energy_embedding_kernel_size=cfg.get("energy_embedding_kernel_size", 3),
            n_mel_channels=cfg.get("n_mel_channels", 80),
            min_token_duration=cfg.get("min_token_duration", 0),
            max_token_duration=cfg.get("max_token_duration", 75),
            speaker_emb_condition_prosody=cfg.get("speaker_emb_condition_prosody", False),
            speaker_emb_condition_decoder=cfg.get("speaker_emb_condition_decoder", False),
            speaker_emb_condition_aligner=cfg.get("speaker_emb_condition_aligner", False),
        )

        self.bin_loss_warmup_epochs = cfg.get("bin_loss_warmup_epochs", 100)
        self.aligner_loss_scale = cfg.get("aligner_loss_scale", 1.0)
        # reference default (models/fastpitch.py:117-120): prosody losses
        # are scaled 0.1 when alignment is learned, 1.0 in the
        # given-durations regime
        default_prosody_scale = 0.1 if self.learn_alignment else 1.0
        self.dur_loss_scale = cfg.get("dur_loss_scale", default_prosody_scale)
        self.pitch_loss_scale = cfg.get("pitch_loss_scale", default_prosody_scale)
        self.energy_loss_scale = cfg.get("energy_loss_scale", default_prosody_scale)

    # ------------------------------------------------------------------
    def _spec_from_batch(self, audio, audio_len, batch):
        """Compute [B, T_mel, n_mel] log-mel on device and align its time
        axis to the batch's mel bucket (the audio is padded to an audio
        bucket, so the raw frame count can exceed the collated mel bucket)."""
        mel, mel_lens = log_mel_spectrogram(audio, audio_len, self.mel_cfg)
        spec = jnp.swapaxes(mel, 1, 2)
        t_mel = None
        for key in ("align_prior_matrix", "pitch", "energy"):
            if key in batch and batch[key] is not None:
                t_mel = batch[key].shape[1]
                break
        if t_mel is not None:
            if spec.shape[1] > t_mel:
                spec = spec[:, :t_mel]
            elif spec.shape[1] < t_mel:
                spec = jnp.pad(spec, ((0, 0), (0, t_mel - spec.shape[1]), (0, 0)))
            mel_lens = jnp.minimum(mel_lens, t_mel)
        return spec, mel_lens

    def init_params(self, rng: jax.Array, batch: Dict[str, np.ndarray]):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        # one jitted program (eager init dispatches every tiny op separately,
        # pathological on remote-dispatch backends)
        @jax.jit
        def _init(rng, batch):
            spec, mel_lens = self._spec_from_batch(
                batch["audio"], batch["audio_len"], batch
            )
            return self.module.init(
                {"params": rng},
                batch["text"],
                pitch=batch.get("pitch"),
                energy=batch.get("energy"),
                speaker=batch.get("speaker_id"),
                spec=spec,
                attn_prior=batch.get("align_prior_matrix"),
                mel_lens=mel_lens,
                input_lens=batch["text_len"],
            )

        return _init(rng, batch)

    def loss_fn(
        self,
        params,
        batch: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
        epoch: int = 0,
        deterministic: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training loss (models/fastpitch.py:395-537 semantics)."""
        spec, mel_lens = self._spec_from_batch(
            batch["audio"], batch["audio_len"], batch
        )  # [B, T_mel_bucket, n_mel]
        text_lens = batch["text_len"]

        out = self.module.apply(
            params,
            batch["text"],
            durs=batch.get("durations"),
            pitch=batch.get("pitch"),
            energy=batch.get("energy"),
            speaker=batch.get("speaker_id"),
            spec=spec if self.learn_alignment else None,
            attn_prior=batch.get("align_prior_matrix"),
            mel_lens=mel_lens,
            input_lens=text_lens,
            deterministic=deterministic,
            rngs={"dropout": dropout_rng} if dropout_rng is not None else None,
        )

        l_mel = mel_loss(out["spect"], spec)
        durs_tgt = (
            out["attn_hard_dur"] if self.learn_alignment else batch.get("durations")
        )
        l_dur = duration_loss(
            out["log_durs_predicted"], durs_tgt, text_lens,
            loss_scale=self.dur_loss_scale,
        )
        loss = l_mel + l_dur
        metrics = {"mel_loss": l_mel, "dur_loss": l_dur}

        if out["pitch"] is not None:
            l_pitch = pitch_loss(
                out["pitch_predicted"], out["pitch"], text_lens,
                loss_scale=self.pitch_loss_scale,
            )
            loss = loss + l_pitch
            metrics["pitch_loss"] = l_pitch
        if out["energy_pred"] is not None and out["energy_tgt"] is not None:
            l_energy = energy_loss(
                out["energy_pred"], out["energy_tgt"], text_lens,
                loss_scale=self.energy_loss_scale,
            )
            loss = loss + l_energy
            metrics["energy_loss"] = l_energy

        if self.learn_alignment:
            ctc = forward_sum_loss(
                out["attn_logprob"], text_lens, mel_lens, loss_scale=self.aligner_loss_scale
            )
            # reference warmup (models/fastpitch.py:473-475):
            # min(current_epoch / warmup, 1.0) — zero at epoch 0
            bin_w = jnp.minimum(
                epoch / max(self.bin_loss_warmup_epochs, 1), 1.0
            )
            l_bin = bin_loss(out["attn_hard"], out["attn_soft"]) * bin_w * self.aligner_loss_scale
            loss = loss + ctc + l_bin
            metrics["ctc_loss"] = ctc
            metrics["bin_loss"] = l_bin

        metrics["loss"] = loss
        return loss, metrics

    # ------------------------------------------------------------------
    def generate_spectrogram(
        self, params, tokens: jnp.ndarray, speaker=None, pace: float = 1.0,
        max_mel_len: int = 2048,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inference: tokens [B, T_text] -> (mel [B, T, n_mel], lens [B])
        (models/fastpitch.py:370-393)."""
        out = self.module.apply(
            params,
            tokens,
            speaker=speaker,
            pace=pace,
            max_mel_len=max_mel_len,
            method=self.module.infer,
        )
        return out["spect"], out["num_frames"]

    def interpolate_speaker(
        self,
        params,
        original_speaker_1: int,
        original_speaker_2: int,
        weight_speaker_1: float,
        weight_speaker_2: float,
        new_speaker_id: int,
    ):
        """Blend two trained speaker embeddings into a third embedding slot
        (ref models/fastpitch.py:904-955 interpolate_speaker).  Functional:
        returns a NEW params pytree with row ``new_speaker_id`` of the
        speaker table replaced by ``w1*emb[s1] + w2*emb[s2]``; the input
        params are untouched (the reference mutates the torch module
        in place)."""
        col = params.get("params", params)
        table = col.get("speaker_table")
        if table is None:
            raise ValueError(
                "Speaker interpolation needs a multi-speaker FastPitch "
                "(n_speakers > 1); this model has no speaker table."
            )
        emb = table["embedding"]
        n_speakers = emb.shape[0]
        for sid in (original_speaker_1, original_speaker_2, new_speaker_id):
            if not (0 <= sid < n_speakers):
                raise ValueError(
                    f"speaker id {sid} out of range for n_speakers={n_speakers}"
                )
        new_emb = (
            weight_speaker_1 * emb[original_speaker_1]
            + weight_speaker_2 * emb[original_speaker_2]
        )
        emb = jnp.asarray(emb).at[new_speaker_id].set(new_emb)
        new_col = dict(col)
        new_col["speaker_table"] = {**dict(table), "embedding": emb}
        if "params" in params:
            out = dict(params)
            out["params"] = new_col
            return out
        return new_col

    def _setup_normalizer(self, cfg: Dict[str, Any]) -> None:
        """Optional text normalizer applied in parse() before tokenization
        (ref models/fastpitch.py:82-111 _setup_normalizer).  Accepts a
        callable directly, or a `_target_` config (e.g. the reference's
        nemo_text_processing Normalizer — degrades to a warning when the
        target package is absent in this image)."""
        self.normalizer_call = None
        self.text_normalizer_call_kwargs = dict(
            cfg.get("text_normalizer_call_kwargs") or {}
        )
        norm_cfg = cfg.get("text_normalizer")
        if norm_cfg is None:
            return
        if callable(norm_cfg):
            self.normalizer_call = norm_cfg
            return
        try:
            normalizer = instantiate(norm_cfg)
        except Exception as e:
            import warnings

            warnings.warn(
                f"text_normalizer could not be instantiated ({e}); "
                "parse() will skip normalization"
            )
            return
        # the reference calls .normalize on Normalizer instances, else the
        # object itself (models/fastpitch.py:100-104)
        self.normalizer_call = getattr(normalizer, "normalize", normalizer)

    def parse(self, text: str) -> np.ndarray:
        """Text -> token ids (models/fastpitch.py:277-309): optional
        normalizer, then the tokenizer when alignment is learned, otherwise
        an ENCharParser over the tokenizer's charset (the reference's
        `self.parser` path)."""
        if self.tokenizer is None:
            raise ValueError("No tokenizer configured")
        if self.normalizer_call is not None:
            text = self.normalizer_call(text, **self.text_normalizer_call_kwargs)
        if self.learn_alignment:
            return np.asarray(self.tokenizer(text), np.int32)[None]
        from roar_tpu.data.parsers import make_parser

        if not hasattr(self, "_parser"):
            vocab = getattr(self.tokenizer, "tokens", None)
            self._parser = make_parser(labels=vocab, name="en")
        return np.asarray(self._parser(text), np.int32)[None]
