"""HifiGanModel: config-driven GAN vocoder task.

Re-design of roar/collections/tts/models/hifigan.py:41-641: manual
optimization becomes one jitted alternating GAN step (training/gan.py); the
mel front-end (the exact_pad/clamp FilterbankFeatures configuration of
hifigan_22050.yaml:33-53) runs inside the step with gradients flowing
through the predicted-audio branch for the L1 mel loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from roar_tpu.losses.hifigan_losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_loss,
    l1_mel_loss,
)
from roar_tpu.models.fastpitch_model import preprocessor_config
from roar_tpu.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from roar_tpu.ops.spectrogram import log_mel_spectrogram
from roar_tpu.training.gan import (
    GANTrainState,
    create_gan_state,
    make_gan_train_step,
    make_shared_forward_gan_step,
    maybe_remat_disc,
)


def generator_from_config(cfg: Dict[str, Any], initial_input_size: int = 80) -> Generator:
    """Build a Generator from a reference generator YAML block
    (conf/hifigan/model/generator/v1.yaml keys)."""
    return Generator(
        resblock=cfg.get("resblock", 1),
        upsample_rates=tuple(cfg.get("upsample_rates", (8, 8, 2, 2))),
        upsample_kernel_sizes=tuple(cfg.get("upsample_kernel_sizes", (16, 16, 4, 4))),
        upsample_initial_channel=cfg.get("upsample_initial_channel", 512),
        resblock_kernel_sizes=tuple(cfg.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg.get("resblock_dilation_sizes", ((1, 3, 5),) * 3)
        ),
        initial_input_size=cfg.get("initial_input_size", initial_input_size),
    )


class HifiGanModel:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        # HiFi-GAN preprocessor: exact_pad + clamp guard + use_grads for the
        # G-loss branch (hifigan_22050.yaml:33-53)
        pre = dict(cfg.get("preprocessor", {}))
        self.mel_cfg = dataclasses.replace(
            preprocessor_config(pre), use_grads=True
        )
        # The L1 mel loss compares mels computed WITHOUT the config's fmax
        # cap — the reference's trg_melspec_fn is the preprocessor re-built
        # with highfreq=None (-> Nyquist), models/hifigan.py:56-58, so the
        # loss sees the full band even when the generator input is capped.
        self.trg_mel_cfg = dataclasses.replace(self.mel_cfg, highfreq=None)
        n_mel = self.mel_cfg.nfilt
        self.generator = generator_from_config(cfg.get("generator", {}), n_mel)
        debug = cfg.get("debug", False)
        self.mpd = MultiPeriodDiscriminator(debug=debug)
        # msd_variant: "grouped" (reference parity, default) | "dense"
        # (TPU-recommended equal-param g=1 stack, DESIGN.md §7g item c)
        self.msd = MultiScaleDiscriminator(
            debug=debug, variant=cfg.get("msd_variant", "grouped"))
        self.l1_factor = cfg.get("l1_loss_factor", 45)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, batch: Dict[str, np.ndarray]):
        # drop non-numeric collate extras (e.g. audio_filepaths)
        batch = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if not isinstance(v, (str, list, tuple))
        }

        # one jitted program: eager init would dispatch each tiny init op
        # separately, which is pathological on remote-dispatch backends
        @jax.jit
        def _init(rng, batch):
            audio = batch["audio"]
            mel = self._input_mel(batch)
            r1, r2, r3 = jax.random.split(rng, 3)
            g_params = self.generator.init(r1, mel)
            fake = self.generator.apply(g_params, mel)
            mpd_params = self.mpd.init(r2, audio, fake)
            msd_vars = self.msd.init(r3, audio, fake)
            return g_params, mpd_params, msd_vars

        g_params, mpd_params, msd_vars = _init(rng, batch)
        d_params = {
            "mpd": mpd_params["params"],
            "msd": msd_vars["params"],
        }
        d_stats = {"msd": msd_vars.get("batch_stats", {})}
        return g_params, {"params": d_params}, d_stats

    def _mel(self, audio, lens, cfg=None):
        mel, mel_lens = log_mel_spectrogram(audio, lens, cfg or self.mel_cfg)
        return jnp.swapaxes(mel, 1, 2), mel_lens

    def _input_mel(self, batch, g_params=None):
        """Generator input mel: precomputed (GTA finetune, `input_as_mel`
        models/hifigan.py:73-75) when present, else computed from audio.

        When `g_params` is given, the mel is cast to the parameters' float
        dtype: the mel front-end computes in fp32 (accuracy), but feeding
        an fp32 mel to a bf16 generator would promote every generator
        activation back to fp32 (mixed-precision leak)."""
        if "mel" in batch and batch["mel"] is not None:
            mel = batch["mel"]
        else:
            mel, _ = self._mel(batch["audio"], batch["audio_len"])
        if g_params is not None:
            dt = jnp.result_type(
                *[
                    x
                    for x in jax.tree_util.tree_leaves(g_params)
                    if jnp.issubdtype(x.dtype, jnp.floating)
                ][:1]
            )
            mel = mel.astype(dt)
        return mel

    def _disc_all(self, d_params, d_stats, y, y_hat, update_stats: bool):
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
    def forward_split(self, g_params, batch, rng, epoch):
        """(diff_out, aux) for the shared-forward GAN step: the generator
        forward (and its input mel) runs once per step."""
        return {"fake": self.generator.apply(g_params, self._input_mel(batch, g_params))}, {}

    def d_loss_from_out(self, d_params, d_stats, diff_out, aux, batch):
        audio = batch["audio"]
        fake = diff_out["fake"]
        mpd_out, msd_out, new_stats = self._disc_all(
            d_params, d_stats, audio, fake, update_stats=True
        )
        mpd_real, mpd_fake = mpd_out[0], mpd_out[1]
        msd_real, msd_fake = msd_out[0], msd_out[1]
        loss_mpd, _, _ = discriminator_loss(mpd_real, mpd_fake)
        loss_msd, _, _ = discriminator_loss(msd_real, msd_fake)
        loss = loss_mpd + loss_msd
        return loss, ({"d_loss_mpd": loss_mpd, "d_loss_msd": loss_msd}, new_stats)

    def d_loss_fn(self, d_params, d_stats, g_params, batch, rng, epoch):
        mel = self._input_mel(batch, g_params)
        fake = jax.lax.stop_gradient(self.generator.apply(g_params, mel))
        return self.d_loss_from_out(d_params, d_stats, {"fake": fake}, {}, batch)

    def g_loss_fn(self, g_params, d_params, d_stats, batch, rng, epoch):
        fake = self.generator.apply(g_params, self._input_mel(batch, g_params))
        return self.g_loss_from_out({"fake": fake}, {}, d_params, d_stats, batch, 0)

    def g_loss_from_out(self, diff_out, aux, d_params, d_stats, batch, epoch):
        audio = batch["audio"]
        lens = batch["audio_len"]
        fake = diff_out["fake"]
        # L1 mel is always computed against the GROUND-TRUTH audio's mel
        # (models/hifigan.py:211-232), even when the input is a GTA mel —
        # and with the full-band (highfreq=None) target mel config.
        mel_gt, _ = self._mel(audio, lens, self.trg_mel_cfg)
        mel_fake, _ = self._mel(fake, lens, self.trg_mel_cfg)

        l_mel = l1_mel_loss(mel_fake, mel_gt) * self.l1_factor
        mpd_out, msd_out, _ = self._disc_all(
            d_params, d_stats, audio, fake, update_stats=False
        )
        _, mpd_fake, mpd_fr, mpd_fg = mpd_out
        _, msd_fake, msd_fr, msd_fg = msd_out
        l_fm = feature_matching_loss(mpd_fr, mpd_fg) + feature_matching_loss(
            msd_fr, msd_fg
        )
        l_adv_mpd, _ = generator_loss(mpd_fake)
        l_adv_msd, _ = generator_loss(msd_fake)
        loss = l_mel + l_fm + l_adv_mpd + l_adv_msd
        return loss, {
            "g_mel_loss": l_mel,
            "g_fm_loss": l_fm,
            "g_adv_loss": l_adv_mpd + l_adv_msd,
        }

    def make_train_step(
        self, g_opt, d_opt, ema_decay=None, precision=None, shared_forward=True
    ):
        """shared_forward=True (default) runs the generator forward once per
        step via jax.vjp; the generic two-forward step is kept for
        equivalence testing."""
        if shared_forward:
            return make_shared_forward_gan_step(
                self.forward_split, self.d_loss_from_out, self.g_loss_from_out,
                g_opt, d_opt, ema_decay, precision=precision,
            )
        return make_gan_train_step(
            self.d_loss_fn, self.g_loss_fn, g_opt, d_opt, ema_decay,
            precision=precision,
        )

    def init_state(self, rng, batch, g_opt, d_opt, ema_decay=None) -> GANTrainState:
        g_params, d_params, d_stats = self.init_params(rng, batch)
        return create_gan_state(g_params, d_params, g_opt, d_opt, d_stats, ema_decay)

    # ------------------------------------------------------------------
    def convert_spectrogram_to_audio(self, g_params, spec: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, n_mel] -> audio [B, T*upsample]
        (models/hifigan.py:174-179)."""
        return self.generator.apply(g_params, spec)

    def compute_stft_bias(self, g_params) -> jnp.ndarray:
        """Bias magnitude spectrum: |STFT| of the generator's output on a
        zero mel (models/hifigan.py:353-375)."""
        from roar_tpu.ops.spectrogram import stft_magnitude

        zero_mel = jnp.zeros((1, 88, self.mel_cfg.nfilt), jnp.float32)
        bias_audio = self.generator.apply(g_params, zero_mel)
        mag = stft_magnitude(
            bias_audio,
            n_fft=self.mel_cfg.fft_length,
            hop_length=self.mel_cfg.hop_length,
            win_length=self.mel_cfg.win_length,
            window=self.mel_cfg.window,
            center=True,
        )
        return mag[:, :, 0:1]  # [1, F, 1]

    def denoise(
        self, g_params, audio: jnp.ndarray, strength: float = 0.0025,
        stft_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Subtract the generator's bias spectrum from synthesized audio
        (models/hifigan.py:353-390): mag' = clip(mag - strength*bias, 0),
        phase preserved."""
        from roar_tpu.ops.griffin_lim import istft
        from roar_tpu.ops.spectrogram import (
            _reflect_pad_1d,
            _windowed_dft_matrix,
            frame_signal,
        )

        if stft_bias is None:
            stft_bias = self.compute_stft_bias(g_params)
        n_fft = self.mel_cfg.fft_length
        hop = self.mel_cfg.hop_length
        win = self.mel_cfg.win_length
        basis = jnp.asarray(_windowed_dft_matrix(n_fft, win, self.mel_cfg.window))
        xp = _reflect_pad_1d(audio, n_fft // 2)
        frames = frame_signal(xp, n_fft, hop)
        proj = jnp.einsum("btn,nf->btf", frames, basis)
        nf = 1 + n_fft // 2
        re = jnp.swapaxes(proj[..., :nf], 1, 2)
        im = jnp.swapaxes(proj[..., nf:], 1, 2)
        mag = jnp.sqrt(re * re + im * im + 1e-12)
        new_mag = jnp.clip(mag - strength * stft_bias, min=0.0)
        scale = new_mag / jnp.maximum(mag, 1e-8)
        return istft(
            re * scale, im * scale, n_fft, hop, win, self.mel_cfg.window,
            length=audio.shape[-1],
        )
