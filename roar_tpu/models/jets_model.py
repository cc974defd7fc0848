"""JETSModel: end-to-end text->wav GAN task.

Re-design of roar/collections/tts/models/jets.py:89-1196: the manual
adversarial optimization becomes the jitted alternating GAN step
(training/gan.py).  Per step (models/jets.py:560-694):

- forward the JETSModule -> predicted audio segments + alignment outputs
- slice ground-truth audio at z_start_idxs * hop (static segment size)
- D step: MPD + MSD LSGAN losses on (gt segment, pred segment)
- G step: mel L1 (x45 via grad-enabled mel front-end on segments) +
  variance losses (dur/pitch/energy) + forward-sum/bin alignment losses +
  feature-matching (x2 scale) + adversarial losses
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from roar_tpu.config import instantiate
from roar_tpu.losses.fastpitch_losses import duration_loss, energy_loss, pitch_loss
from roar_tpu.losses.hifigan_losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_loss,
    l1_mel_loss,
)
from roar_tpu.models.fastpitch import AlignerConfig
from roar_tpu.models.fastpitch_model import (
    _fft_config,
    _predictor_config,
    preprocessor_config,
    strip_inert_conditioning,
)
from roar_tpu.models.hifigan import MultiPeriodDiscriminator, MultiScaleDiscriminator
from roar_tpu.models.hifigan_model import generator_from_config
from roar_tpu.models.jets import JETSModule
from roar_tpu.ops.forward_sum import bin_loss, forward_sum_loss
from roar_tpu.ops.lengths import slice_segments
from roar_tpu.ops.spectrogram import log_mel_spectrogram
from roar_tpu.training.gan import (
    GANTrainState,
    create_gan_state,
    make_gan_train_step,
    make_shared_forward_gan_step,
    maybe_remat_disc,
)


class JETSModel:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        tok_cfg = cfg.get("text_tokenizer")
        self.tokenizer = instantiate(tok_cfg) if tok_cfg else None
        n_symbols = cfg.get("n_symbols") or len(self.tokenizer.tokens)
        padding_idx = (
            self.tokenizer.pad if self.tokenizer is not None else cfg.get("padding_idx", 0)
        )

        # JETS builds its ONE preprocessor with highfreq=None (-> Nyquist)
        # regardless of the config's fmax cap (models/jets.py:175-177): both
        # the aligner's input mel and the segment L1 mel loss are full-band.
        self.mel_cfg = dataclasses.replace(
            preprocessor_config(cfg.get("preprocessor", {})),
            use_grads=True, highfreq=None,
        )
        self.segment_size = cfg.get("segment_size", 64)
        self.hop_length = self.mel_cfg.hop_length

        d = cfg.get("symbols_embedding_dim", 384)
        energy_cfg = cfg.get("energy_predictor")
        aligner_cfg = cfg.get("alignment_module")
        self.learn_alignment = cfg.get("learn_alignment", aligner_cfg is not None)
        gen_cfg = dict(cfg.get("waveform_generator", cfg.get("generator", {})))
        gen_cfg.setdefault("initial_input_size", d)
        generator = generator_from_config(gen_cfg, d)
        assert generator.upsample_factor == self.hop_length, (
            f"generator upsample {generator.upsample_factor} != hop {self.hop_length}"
        )

        spk_cfg = cfg.get("speaker_encoder") or {}
        lookup = (spk_cfg.get("lookup_module") or {}) if spk_cfg else {}
        n_speakers = lookup.get("n_speakers") or cfg.get("n_speakers", 1)

        cfg = strip_inert_conditioning(cfg, n_speakers, False)
        aligner_cfg = cfg.get("alignment_module")
        energy_cfg = cfg.get("energy_predictor")

        self.module = JETSModule(
            n_symbols=n_symbols,
            padding_idx=padding_idx,
            encoder=_fft_config(cfg.get("input_fft", {})),
            decoder=_fft_config(cfg.get("output_fft", {})),
            duration_predictor=_predictor_config(cfg.get("duration_predictor", {})),
            pitch_predictor=_predictor_config(cfg.get("pitch_predictor", {})),
            energy_predictor=_predictor_config(energy_cfg) if energy_cfg else None,
            aligner=AlignerConfig(
                n_text_channels=(aligner_cfg or {}).get("n_text_channels", d),
                n_att_channels=(aligner_cfg or {}).get("n_att_channels", 80),
                temperature=(aligner_cfg or {}).get("temperature", 0.0005),
                condition_types=tuple((aligner_cfg or {}).get("condition_types", ())),
                dist_type=(aligner_cfg or {}).get("dist_type", "l2"),
            )
            if self.learn_alignment
            else None,
            generator=generator,
            n_speakers=n_speakers,
            symbols_embedding_dim=d,
            segment_size=self.segment_size,
            n_mel_channels=self.mel_cfg.nfilt,
            max_token_duration=cfg.get("max_token_duration", 75),
            speaker_emb_condition_prosody=cfg.get("speaker_emb_condition_prosody", False),
            speaker_emb_condition_decoder=cfg.get("speaker_emb_condition_decoder", False),
            speaker_emb_condition_aligner=cfg.get("speaker_emb_condition_aligner", False),
        )
        debug = cfg.get("debug", False)
        self.mpd = MultiPeriodDiscriminator(debug=debug)
        self.msd = MultiScaleDiscriminator(
            debug=debug, variant=cfg.get("msd_variant", "grouped"))

        self.mel_loss_scale = cfg.get("mel_loss_scale", 45.0)
        self.feature_loss_scale = cfg.get("feature_loss_scale", 2.0)
        self.adversarial_loss_scale = cfg.get("adv_loss_scale", 1.0)
        self.aligner_loss_scale = cfg.get("aligner_loss_scale", 2.0)
        self.bin_loss_warmup_epochs = cfg.get("bin_loss_warmup_epochs", 100)

    # ------------------------------------------------------------------
    def _spec_from_batch(self, batch):
        mel, mel_lens = log_mel_spectrogram(
            batch["audio"], batch["audio_len"], self.mel_cfg
        )
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

    def _forward(self, g_params, batch, rng, deterministic=False):
        spec, mel_lens = self._spec_from_batch(batch)
        rngs = {"segments": rng}
        if not deterministic:
            rng_seg, rng_drop = jax.random.split(rng)
            rngs = {"segments": rng_seg, "dropout": rng_drop}
        out = self.module.apply(
            g_params,
            batch["text"],
            pitch=batch.get("pitch"),
            energy=batch.get("energy"),
            speaker=batch.get("speaker_id"),
            spec=spec if self.learn_alignment else None,
            attn_prior=batch.get("align_prior_matrix"),
            mel_lens=mel_lens,
            input_lens=batch["text_len"],
            deterministic=deterministic,
            rngs=rngs,
        )
        out["mel_lens"] = mel_lens
        return out

    def _gt_segments(self, batch, z_start_idxs):
        seg = self.segment_size * self.hop_length
        # clamp so segments stay inside the padded audio buffer
        max_start = batch["audio"].shape[-1] - seg
        starts = jnp.minimum(z_start_idxs * self.hop_length, max_start)
        return slice_segments(batch["audio"][:, None, :], starts, seg)[:, 0]

    def _disc_all(self, d_params, d_stats, y, y_hat, update_stats):
        @maybe_remat_disc
        def run(d_params, d_stats, y, y_hat):
            mpd_out = self.mpd.apply({"params": d_params["params"]["mpd"]}, y, y_hat)
            msd_vars = {
                "params": d_params["params"]["msd"],
                "batch_stats": d_stats["msd"],
            }
            if update_stats:
                msd_out, new_msd = self.msd.apply(
                    msd_vars, y, y_hat, update_stats=True, mutable=["batch_stats"]
                )
                new_stats = {"msd": new_msd["batch_stats"]}
            else:
                msd_out = self.msd.apply(msd_vars, y, y_hat, update_stats=False)
                new_stats = d_stats
            return mpd_out, msd_out, new_stats

        return run(d_params, d_stats, y, y_hat)

    # ------------------------------------------------------------------
    @staticmethod
    def _split_out(out):
        """Partition forward outputs into (differentiable floats, aux) for
        the shared-forward GAN step (training/gan.py)."""
        diff, aux = {}, {}
        for k, v in out.items():
            if v is not None and jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
                diff[k] = v
            else:
                aux[k] = v
        return diff, aux

    def forward_split(self, g_params, batch, rng, epoch):
        return self._split_out(self._forward(g_params, batch, rng))

    def d_loss_from_out(self, d_params, d_stats, diff_out, aux, batch):
        out = {**diff_out, **aux}
        wav_pred = out["wav"]
        audio_seg = self._gt_segments(batch, out["z_start_idxs"])
        mpd_out, msd_out, new_stats = self._disc_all(
            d_params, d_stats, audio_seg, wav_pred, update_stats=True
        )
        loss_mpd, _, _ = discriminator_loss(mpd_out[0], mpd_out[1])
        loss_msd, _, _ = discriminator_loss(msd_out[0], msd_out[1])
        loss = loss_mpd + loss_msd
        return loss, ({"d_loss_mpd": loss_mpd, "d_loss_msd": loss_msd}, new_stats)

    def d_loss_fn(self, d_params, d_stats, g_params, batch, rng, epoch):
        out = jax.lax.stop_gradient(self._forward(g_params, batch, rng))
        diff, aux = self._split_out(out)
        return self.d_loss_from_out(d_params, d_stats, diff, aux, batch)

    def g_loss_fn(self, g_params, d_params, d_stats, batch, rng, epoch):
        diff, aux = self._split_out(self._forward(g_params, batch, rng))
        return self.g_loss_from_out(diff, aux, d_params, d_stats, batch, epoch)

    def g_loss_from_out(self, diff_out, aux, d_params, d_stats, batch, epoch):
        out = {**diff_out, **aux}
        wav_pred = out["wav"]
        audio_seg = self._gt_segments(batch, out["z_start_idxs"])
        seg_len = jnp.full(
            (wav_pred.shape[0],), wav_pred.shape[-1], jnp.int32
        )
        mel_gt, _ = log_mel_spectrogram(audio_seg, seg_len, self.mel_cfg)
        mel_pred, _ = log_mel_spectrogram(wav_pred, seg_len, self.mel_cfg)
        l_mel = l1_mel_loss(mel_pred, mel_gt) * self.mel_loss_scale

        text_lens = batch["text_len"]
        durs_tgt = out["attn_hard_dur"]
        l_dur = duration_loss(out["log_durs_predicted"], durs_tgt, text_lens)
        loss = l_mel + l_dur
        metrics = {"g_mel_loss": l_mel, "dur_loss": l_dur}

        if out["pitch"] is not None:
            l_pitch = pitch_loss(out["pitch_predicted"], out["pitch"], text_lens)
            loss = loss + l_pitch
            metrics["pitch_loss"] = l_pitch
        if out["energy_pred"] is not None and out["energy_tgt"] is not None:
            l_energy = energy_loss(out["energy_pred"], out["energy_tgt"], text_lens)
            loss = loss + l_energy
            metrics["energy_loss"] = l_energy

        if self.learn_alignment:
            ctc = forward_sum_loss(
                out["attn_logprob"], text_lens, out["mel_lens"],
                loss_scale=self.aligner_loss_scale,
            )
            bin_w = jnp.minimum((epoch + 0.0) / max(self.bin_loss_warmup_epochs, 1), 1.0)
            l_bin = (
                bin_loss(out["attn_hard"], out["attn_soft"]) * bin_w * self.aligner_loss_scale
            )
            loss = loss + ctc + l_bin
            metrics["ctc_loss"] = ctc
            metrics["bin_loss"] = l_bin

        mpd_out, msd_out, _ = self._disc_all(
            d_params, d_stats, audio_seg, wav_pred, update_stats=False
        )
        _, mpd_fake, mpd_fr, mpd_fg = mpd_out
        _, msd_fake, msd_fr, msd_fg = msd_out
        l_fm = (
            feature_matching_loss(mpd_fr, mpd_fg) + feature_matching_loss(msd_fr, msd_fg)
        ) * self.feature_loss_scale
        l_adv_mpd, _ = generator_loss(mpd_fake)
        l_adv_msd, _ = generator_loss(msd_fake)
        l_adv = (l_adv_mpd + l_adv_msd) * self.adversarial_loss_scale
        loss = loss + l_fm + l_adv
        metrics["g_fm_loss"] = l_fm
        metrics["g_adv_loss"] = l_adv
        return loss, metrics

    # ------------------------------------------------------------------
    def init_params(self, rng, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        @jax.jit  # one program; eager init is pathological over remote dispatch
        def _init(rng, batch):
            r1, r2, r3, r4 = jax.random.split(rng, 4)
            spec, mel_lens = self._spec_from_batch(batch)
            g_params = self.module.init(
                {"params": r1, "segments": r4},
                batch["text"],
                pitch=batch.get("pitch"),
                energy=batch.get("energy"),
                speaker=batch.get("speaker_id"),
                spec=spec if self.learn_alignment else None,
                attn_prior=batch.get("align_prior_matrix"),
                mel_lens=mel_lens,
                input_lens=batch["text_len"],
            )
            seg = self.segment_size * self.hop_length
            fake = jnp.zeros((batch["audio"].shape[0], seg), jnp.float32)
            mpd_params = self.mpd.init(r2, fake, fake)
            msd_vars = self.msd.init(r3, fake, fake)
            return g_params, mpd_params, msd_vars

        g_params, mpd_params, msd_vars = _init(rng, batch)
        d_params = {"params": {"mpd": mpd_params["params"], "msd": msd_vars["params"]}}
        d_stats = {"msd": msd_vars.get("batch_stats", {})}
        return g_params, d_params, d_stats

    def init_state(self, rng, batch, g_opt, d_opt, ema_decay=None) -> GANTrainState:
        g_params, d_params, d_stats = self.init_params(rng, batch)
        return create_gan_state(g_params, d_params, g_opt, d_opt, d_stats, ema_decay)

    def make_train_step(
        self, g_opt, d_opt, ema_decay=None, precision=None, shared_forward=True
    ):
        """shared_forward=True (default) runs the expensive JETS generator
        graph once per step via jax.vjp instead of once per loss; the
        generic two-forward step is kept for equivalence testing."""
        if shared_forward:
            return make_shared_forward_gan_step(
                self.forward_split, self.d_loss_from_out, self.g_loss_from_out,
                g_opt, d_opt, ema_decay, precision=precision,
            )
        return make_gan_train_step(
            self.d_loss_fn, self.g_loss_fn, g_opt, d_opt, ema_decay,
            precision=precision,
        )

    # ------------------------------------------------------------------
    def convert_text_to_waveform(
        self, g_params, tokens, speaker=None, pace=1.0, max_mel_len=2048
    ):
        """(models/jets.py:498) one-shot synthesis; returns (wav, num_frames)."""
        out = self.module.apply(
            g_params,
            tokens,
            speaker=speaker,
            pace=pace,
            max_mel_len=max_mel_len,
            method=self.module.infer,
        )
        return out["wav"], out["num_frames"]

    def parse(self, text: str) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("No tokenizer configured")
        return np.asarray(self.tokenizer(text), np.int32)[None]
