"""VITSModel: end-to-end VAE-flow TTS task with GAN training.

The reference's models/vits.py is broken in-tree (it imports a missing
`vits_losses` module); this provides the working task: linear-spectrogram
posterior, KL prior matching, stochastic duration NLL, and the standard
HiFi-GAN adversarial recipe on decoded latent segments.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from roar_tpu.config import instantiate
from roar_tpu.losses.hifigan_losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_loss,
    l1_mel_loss,
)
from roar_tpu.models.fastpitch_model import preprocessor_config
from roar_tpu.models.hifigan import MultiPeriodDiscriminator, MultiScaleDiscriminator
from roar_tpu.models.hifigan_model import generator_from_config
from roar_tpu.models.vits import SynthesizerTrn
from roar_tpu.ops.lengths import slice_segments
from roar_tpu.ops.spectrogram import log_mel_spectrogram, stft_magnitude
from roar_tpu.training.gan import GANTrainState, create_gan_state, make_gan_train_step


def kl_loss(z_p, logs_q, m_p, logs_p, mask) -> jnp.ndarray:
    """KL(q(z|x) || p(z|text)) under the flow-mapped posterior (the missing
    vits_losses.KlLoss)."""
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * (jnp.exp(2.0 * logs_q) + jnp.square(z_p - m_p)) * jnp.exp(
        -2.0 * logs_p
    )
    return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class VITSModel:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        tok_cfg = cfg.get("text_tokenizer")
        self.tokenizer = instantiate(tok_cfg) if tok_cfg else None
        n_vocab = cfg.get("n_symbols") or len(self.tokenizer.tokens)
        padding_idx = self.tokenizer.pad if self.tokenizer else cfg.get("padding_idx", 0)

        self.mel_cfg = dataclasses.replace(
            preprocessor_config(cfg.get("preprocessor", {})), use_grads=True
        )
        self.hop_length = self.mel_cfg.hop_length
        self.spec_channels = 1 + self.mel_cfg.fft_length // 2
        self.segment_size = cfg.get("segment_size", 32)

        gen_cfg = dict(cfg.get("waveform_generator", cfg.get("generator", {})))
        inter = cfg.get("inter_channels", 192)
        gen_cfg.setdefault("initial_input_size", inter)
        generator = generator_from_config(gen_cfg, inter)
        assert generator.upsample_factor == self.hop_length

        self.module = SynthesizerTrn(
            n_vocab=n_vocab,
            spec_channels=self.spec_channels,
            inter_channels=inter,
            hidden_channels=cfg.get("hidden_channels", 192),
            n_heads=cfg.get("n_heads", 2),
            n_layers=cfg.get("n_layers", 6),
            segment_size=self.segment_size,
            n_speakers=cfg.get("n_speakers", 0),
            use_sdp=cfg.get("use_sdp", True),
            generator=generator,
            padding_idx=padding_idx,
        )
        debug = cfg.get("debug", False)
        self.mpd = MultiPeriodDiscriminator(debug=debug)
        self.msd = MultiScaleDiscriminator(
            debug=debug, variant=cfg.get("msd_variant", "grouped"))
        self.mel_loss_scale = cfg.get("mel_loss_scale", 45.0)
        self.kl_loss_scale = cfg.get("kl_loss_scale", 1.0)
        self.dur_loss_scale = cfg.get("dur_loss_scale", 1.0)

    # ------------------------------------------------------------------
    def _linear_spec(self, batch):
        """Posterior input: magnitude STFT (VITS trains its posterior on the
        linear spectrogram, not the mel)."""
        mag = stft_magnitude(
            batch["audio"],
            n_fft=self.mel_cfg.fft_length,
            hop_length=self.hop_length,
            win_length=self.mel_cfg.win_length,
            window=self.mel_cfg.window,
            center=False,
            exact_pad=True,
        )  # [B, F, T]
        spec = jnp.swapaxes(mag, 1, 2)
        spec_lens = batch["audio_len"] // self.hop_length
        return spec, jnp.minimum(spec_lens, spec.shape[1])

    def _forward(self, g_params, batch, rng, deterministic=False):
        spec, spec_lens = self._linear_spec(batch)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        rngs = {"latents": r1, "segments": r2, "sdp": r3}
        if not deterministic:
            rngs["dropout"] = r4
        out = self.module.apply(
            g_params,
            batch["text"],
            spec,
            spec_lens,
            speaker=batch.get("speaker_id"),
            deterministic=deterministic,
            rngs=rngs,
        )
        out["spec_lens"] = spec_lens
        return out

    def _gt_segments(self, batch, ids_slice):
        seg = self.segment_size * self.hop_length
        max_start = batch["audio"].shape[-1] - seg
        starts = jnp.minimum(ids_slice * self.hop_length, max_start)
        return slice_segments(batch["audio"][:, None, :], starts, seg)[:, 0]

    def _disc_all(self, d_params, d_stats, y, y_hat, update_stats):
        mpd_out = self.mpd.apply({"params": d_params["params"]["mpd"]}, y, y_hat)
        msd_vars = {"params": d_params["params"]["msd"], "batch_stats": d_stats["msd"]}
        if update_stats:
            msd_out, new_msd = self.msd.apply(
                msd_vars, y, y_hat, update_stats=True, mutable=["batch_stats"]
            )
            return mpd_out, msd_out, {"msd": new_msd["batch_stats"]}
        msd_out = self.msd.apply(msd_vars, y, y_hat, update_stats=False)
        return mpd_out, msd_out, d_stats

    # ------------------------------------------------------------------
    def d_loss_fn(self, d_params, d_stats, g_params, batch, rng, epoch):
        out = jax.lax.stop_gradient(self._forward(g_params, batch, rng))
        y = self._gt_segments(batch, out["ids_slice"])
        mpd_out, msd_out, new_stats = self._disc_all(d_params, d_stats, y, out["audio"], True)
        l_mpd, _, _ = discriminator_loss(mpd_out[0], mpd_out[1])
        l_msd, _, _ = discriminator_loss(msd_out[0], msd_out[1])
        loss = l_mpd + l_msd
        return loss, ({"d_loss_mpd": l_mpd, "d_loss_msd": l_msd}, new_stats)

    def g_loss_fn(self, g_params, d_params, d_stats, batch, rng, epoch):
        out = self._forward(g_params, batch, rng)
        y = self._gt_segments(batch, out["ids_slice"])
        y_hat = out["audio"]
        seg_len = jnp.full((y.shape[0],), y.shape[-1], jnp.int32)
        mel_gt, _ = log_mel_spectrogram(y, seg_len, self.mel_cfg)
        mel_hat, _ = log_mel_spectrogram(y_hat, seg_len, self.mel_cfg)
        l_mel = l1_mel_loss(mel_hat, mel_gt) * self.mel_loss_scale
        l_kl = kl_loss(
            out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], out["y_mask"]
        ) * self.kl_loss_scale
        l_dur = jnp.mean(out["l_length"]) * self.dur_loss_scale
        mpd_out, msd_out, _ = self._disc_all(d_params, d_stats, y, y_hat, False)
        _, mpd_fake, mpd_fr, mpd_fg = mpd_out
        _, msd_fake, msd_fr, msd_fg = msd_out
        l_fm = feature_matching_loss(mpd_fr, mpd_fg) + feature_matching_loss(msd_fr, msd_fg)
        l_adv_p, _ = generator_loss(mpd_fake)
        l_adv_s, _ = generator_loss(msd_fake)
        loss = l_mel + l_kl + l_dur + l_fm + l_adv_p + l_adv_s
        return loss, {
            "g_mel_loss": l_mel, "kl_loss": l_kl, "dur_loss": l_dur,
            "g_fm_loss": l_fm, "g_adv_loss": l_adv_p + l_adv_s,
        }

    # ------------------------------------------------------------------
    def init_params(self, rng, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        @jax.jit  # one program; eager init is pathological over remote dispatch
        def _init(rng, batch):
            spec, spec_lens = self._linear_spec(batch)
            r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
            g_params = self.module.init(
                {"params": r1, "latents": r2, "segments": r3, "sdp": r4},
                batch["text"], spec, spec_lens, speaker=batch.get("speaker_id"),
            )
            seg = self.segment_size * self.hop_length
            fake = jnp.zeros((batch["audio"].shape[0], seg), jnp.float32)
            mpd_params = self.mpd.init(r5, fake, fake)
            msd_vars = self.msd.init(r5, fake, fake)
            return g_params, mpd_params, msd_vars

        g_params, mpd_params, msd_vars = _init(rng, batch)
        d_params = {"params": {"mpd": mpd_params["params"], "msd": msd_vars["params"]}}
        d_stats = {"msd": msd_vars.get("batch_stats", {})}
        return g_params, d_params, d_stats

    def init_state(self, rng, batch, g_opt, d_opt) -> GANTrainState:
        g_params, d_params, d_stats = self.init_params(rng, batch)
        return create_gan_state(g_params, d_params, g_opt, d_opt, d_stats)

    def make_train_step(self, g_opt, d_opt, precision=None):
        return make_gan_train_step(
            self.d_loss_fn, self.g_loss_fn, g_opt, d_opt, precision=precision
        )

    # ------------------------------------------------------------------
    def convert_text_to_waveform(self, g_params, tokens, speaker=None,
                                 noise_scale=0.667, length_scale=1.0,
                                 max_len=1024, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        o, y_lens, _ = self.module.apply(
            g_params, tokens, speaker=speaker, noise_scale=noise_scale,
            length_scale=length_scale, max_len=max_len,
            method=self.module.infer, rngs={"latents": r1, "sdp": r2},
        )
        return o, y_lens
