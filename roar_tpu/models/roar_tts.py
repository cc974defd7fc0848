"""RoarTTS: JETS with speech-prompt conditioning, MRD, multi-res mel loss.

Re-design of roar/collections/tts/modules/roarttts.py (JETS variant with
`SpeechPromptEncoder` prompt conditioning :201-213) and models/roar_tts.py
(BigVGAN MultiResolutionDiscriminator + MultiResolutionMelLoss).  The prompt
encoder reuses the reference-encoder + style-attention machinery
(GlobalStyleToken): a prompt mel is summarized into one conditioning vector
fed through the JETS conditioning pathway.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from roar_tpu.losses.fastpitch_losses import duration_loss, pitch_loss
from roar_tpu.losses.hifigan_losses import discriminator_loss, feature_matching_loss, generator_loss
from roar_tpu.losses.stft_losses import multi_resolution_mel_loss
from roar_tpu.models.bigvgan import MultiResolutionDiscriminator
from roar_tpu.models.jets import JETSModule
from roar_tpu.models.jets_model import JETSModel
from roar_tpu.models.submodules import GlobalStyleToken
from roar_tpu.ops.forward_sum import bin_loss, forward_sum_loss
from flax import linen as nn


class SpeechPromptEncoder(nn.Module):
    """Prompt mel -> [B, 1, D] conditioning (roarttts.py:201-213 analogue)."""

    out_dim: int = 384

    @nn.compact
    def __call__(self, prompt_spec, prompt_lens=None):
        emb = GlobalStyleToken(gst_size=self.out_dim, name="gst")(
            prompt_spec, prompt_lens
        )
        return emb[:, None, :]


class PromptedJETSModule(JETSModule):
    """JETSModule whose speaker embedding comes from a speech prompt."""

    prompt_dim: int = 384

    def setup(self):
        super().setup()
        self.prompt_encoder = SpeechPromptEncoder(self.prompt_dim)

    def get_prompt_embedding(self, prompt_spec, prompt_lens=None):
        if prompt_spec is None:
            return None
        return self.prompt_encoder(prompt_spec, prompt_lens)


class RoarTTSModel(JETSModel):
    """JETS task + prompt conditioning + MRD instead of MSD + multi-res mel.

    Loss layout follows models/roar_tts.py: D = MPD + MRD LSGAN; G =
    MultiResolutionMelLoss x mel_scale + variance + alignment + fm + adv.
    """

    def __init__(self, cfg: Dict[str, Any]):
        super().__init__(cfg)
        # swap MSD -> MRD
        self.mrd = MultiResolutionDiscriminator()
        self.msd = None

    def _disc_all(self, d_params, d_stats, y, y_hat, update_stats):
        mpd_out = self.mpd.apply({"params": d_params["params"]["mpd"]}, y, y_hat)
        mrd_out = self.mrd.apply({"params": d_params["params"]["mrd"]}, y, y_hat)
        return mpd_out, mrd_out, d_stats

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
                spec=spec if self.learn_alignment else None,
                attn_prior=batch.get("align_prior_matrix"),
                mel_lens=mel_lens,
                input_lens=batch["text_len"],
            )
            seg = self.segment_size * self.hop_length
            fake = jnp.zeros((batch["audio"].shape[0], seg), jnp.float32)
            mpd_params = self.mpd.init(r2, fake, fake)
            mrd_params = self.mrd.init(r3, fake, fake)
            return g_params, mpd_params, mrd_params

        g_params, mpd_params, mrd_params = _init(rng, batch)
        d_params = {"params": {"mpd": mpd_params["params"], "mrd": mrd_params["params"]}}
        return g_params, d_params, {}

    def g_loss_from_out(self, diff_out, aux, d_params, d_stats, batch, epoch):
        out = {**diff_out, **aux}
        wav_pred = out["wav"]
        audio_seg = self._gt_segments(batch, out["z_start_idxs"])

        l_mel = (
            multi_resolution_mel_loss(
                wav_pred, audio_seg, self.mel_cfg.sample_rate,
                n_mels=self.mel_cfg.nfilt, fmax=self.mel_cfg.highfreq,
            )
            * self.mel_loss_scale
        )
        text_lens = batch["text_len"]
        l_dur = duration_loss(out["log_durs_predicted"], out["attn_hard_dur"], text_lens)
        loss = l_mel + l_dur
        metrics = {"g_mel_loss": l_mel, "dur_loss": l_dur}

        if out["pitch"] is not None:
            l_pitch = pitch_loss(out["pitch_predicted"], out["pitch"], text_lens)
            loss = loss + l_pitch
            metrics["pitch_loss"] = l_pitch
        if self.learn_alignment:
            ctc = forward_sum_loss(
                out["attn_logprob"], text_lens, out["mel_lens"],
                loss_scale=self.aligner_loss_scale,
            )
            bin_w = jnp.minimum((epoch + 0.0) / max(self.bin_loss_warmup_epochs, 1), 1.0)
            l_bin = bin_loss(out["attn_hard"], out["attn_soft"]) * bin_w * self.aligner_loss_scale
            loss = loss + ctc + l_bin
            metrics["ctc_loss"] = ctc

        mpd_out, mrd_out, _ = self._disc_all(d_params, d_stats, audio_seg, wav_pred, False)
        _, mpd_fake, mpd_fr, mpd_fg = mpd_out
        _, mrd_fake, mrd_fr, mrd_fg = mrd_out
        l_fm = (
            feature_matching_loss(mpd_fr, mpd_fg) + feature_matching_loss(mrd_fr, mrd_fg)
        ) * self.feature_loss_scale
        l_adv_mpd, _ = generator_loss(mpd_fake)
        l_adv_mrd, _ = generator_loss(mrd_fake)
        loss = loss + l_fm + (l_adv_mpd + l_adv_mrd) * self.adversarial_loss_scale
        metrics["g_fm_loss"] = l_fm
        metrics["g_adv_loss"] = l_adv_mpd + l_adv_mrd
        return loss, metrics

    def d_loss_from_out(self, d_params, d_stats, diff_out, aux, batch):
        out = {**diff_out, **aux}
        wav_pred = out["wav"]
        audio_seg = self._gt_segments(batch, out["z_start_idxs"])
        mpd_out, mrd_out, _ = self._disc_all(d_params, d_stats, audio_seg, wav_pred, True)
        loss_mpd, _, _ = discriminator_loss(mpd_out[0], mpd_out[1])
        loss_mrd, _, _ = discriminator_loss(mrd_out[0], mrd_out[1])
        loss = loss_mpd + loss_mrd
        return loss, ({"d_loss_mpd": loss_mpd, "d_loss_mrd": loss_mrd}, d_stats)
