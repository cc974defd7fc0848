"""VITS modules (flax): WN, flows, posterior encoder, stochastic duration
predictor, SynthesizerTrn.

Re-design of roar/collections/tts/modules/vits_modules.py (WN,
ResidualCouplingLayer, ConvFlow with rational-quadratic splines
parts/utils/splines.py, StochasticDurationPredictor :334, PosteriorEncoder
:531, SynthesizerTrn :725).  NOTE: the reference's VITS model is broken
in-tree (models/vits.py imports a missing `vits_losses`); this is a working
implementation, with the losses in roar_tpu.models.vits_model.

Layout: sequence tensors are [B, T, C]; masks are [B, T, 1] (1 = valid).
MAS runs on device (roar_tpu.ops.mas), replacing the reference's Numba
monotonic_align (modules/monotonic_align/numba_core.py:23-66).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from roar_tpu.models.hifigan import Generator
from roar_tpu.models.transformer import FFTransformerDecoder
from roar_tpu.ops.lengths import mask_from_lens, rand_slice_segments
from roar_tpu.ops.mas import mas_width1
from roar_tpu.ops.splines import unconstrained_rational_quadratic_spline

LOG_2PI = math.log(2 * math.pi)


class WN(nn.Module):
    """Non-causal WaveNet stack with gated units + global conditioning
    (vits_modules.py WN)."""

    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic=True):
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = nn.Dense(2 * h * self.n_layers, name="cond_layer")(g)  # [B, 1, 2H*L]
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = nn.Conv(
                2 * h, (self.kernel_size,), kernel_dilation=(dilation,),
                padding="SAME", name=f"in_layers_{i}",
            )(x)
            x_in = nn.Dropout(rate=self.p_dropout)(x_in, deterministic=deterministic)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * h : (i + 1) * 2 * h]
            a, b = jnp.split(x_in, 2, axis=-1)
            acts = jnp.tanh(a) * nn.sigmoid(b)
            out_ch = 2 * h if i < self.n_layers - 1 else h
            rs = nn.Conv(out_ch, (1,), name=f"res_skip_layers_{i}")(acts)
            if i < self.n_layers - 1:
                res, skip = jnp.split(rs, 2, axis=-1)
                x = (x + res) * mask
                output = output + skip
            else:
                output = output + rs
        return output * mask


class PosteriorEncoder(nn.Module):
    """Linear-spec -> latent posterior (vits_modules.py:531)."""

    in_channels: int
    out_channels: int
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0

    @nn.compact
    def __call__(self, spec, mask, g=None, rng=None):
        # spec: [B, T, F]; mask: [B, T, 1]
        x = nn.Conv(self.hidden_channels, (1,), name="pre")(spec) * mask
        x = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.n_layers, self.gin_channels, name="enc",
        )(x, mask, g)
        # zero-init: posterior starts at N(0,1).  A default-init projection
        # over WN features puts logs_q tails at ~7, so exp(2*logs_q) ~ e^14
        # and the step-0 KL explodes to ~5e6 (seen in the real-chip smoke).
        stats = nn.Conv(
            2 * self.out_channels, (1,), name="proj",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x) * mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if rng is None:
            rng = self.make_rng("latents")
        z = (m + jax.random.normal(rng, m.shape) * jnp.exp(logs)) * mask
        return z, m, logs


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only) coupling over channel halves
    (vits_modules.py ResidualCouplingLayer)."""

    channels: int
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        half = self.channels // 2
        x0, x1 = jnp.split(x, 2, axis=-1)
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * mask
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.n_layers, self.gin_channels, name="enc",
        )(h, mask, g)
        out_ch = half if self.mean_only else 2 * half
        stats = nn.Conv(
            out_ch, (1,), name="post",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h) * mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))
            return jnp.concatenate([x0, x1], -1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * mask
        return jnp.concatenate([x0, x1], -1), None


class ResidualCouplingBlock(nn.Module):
    """n_flows x (coupling + channel flip) (vits_modules.py)."""

    channels: int
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers, self.gin_channels,
                name=f"flows_{i}",
            )
            for i in range(self.n_flows)
        ]
        logdet_total = 0.0
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x, ld = layers[i](x, mask, g, reverse=False)
                logdet_total = logdet_total + ld
                x = jnp.flip(x, axis=-1)
            else:
                x = jnp.flip(x, axis=-1)
                x, _ = layers[i](x, mask, g, reverse=True)
        return x, logdet_total


class DDSConv(nn.Module):
    """Dilated depth-separable convs (SDP context net)."""

    channels: int
    kernel_size: int = 3
    n_layers: int = 3
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic=True):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(dilation,),
                feature_group_count=self.channels, padding="SAME",
                name=f"convs_sep_{i}",
            )(x * mask)
            y = nn.gelu(nn.LayerNorm(name=f"norm1_{i}")(y))
            y = nn.Conv(self.channels, (1,), name=f"convs_1x1_{i}")(y)
            y = nn.gelu(nn.LayerNorm(name=f"norm2_{i}")(y))
            y = nn.Dropout(rate=self.p_dropout)(y, deterministic=deterministic)
            x = x + y
        return x * mask


class ConvFlow(nn.Module):
    """Spline coupling flow over a 2-channel latent (vits_modules.py ConvFlow)."""

    in_channels: int = 2
    filter_channels: int = 192
    kernel_size: int = 3
    n_layers: int = 3
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        half = self.in_channels // 2
        x0, x1 = jnp.split(x, 2, axis=-1)
        h = nn.Conv(self.filter_channels, (1,), name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers, name="convs")(
            h, mask, g
        )
        h = nn.Conv(
            half * (self.num_bins * 3 - 1), (1,), name="proj",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h) * mask
        b, t, _ = x0.shape
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]
        x1_new, logabsdet = unconstrained_rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound
        )
        x_out = jnp.concatenate([x0, x1_new * mask], axis=-1)
        logdet = jnp.sum(logabsdet * mask, axis=(1, 2))
        if not reverse:
            return x_out, logdet
        return x_out, None


class ElementwiseAffine(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * mask, None


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration model (vits_modules.py:334).

    Training returns the duration NLL; reverse sampling returns log-durations.
    """

    in_channels: int = 192
    filter_channels: int = 192
    kernel_size: int = 3
    p_dropout: float = 0.5
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.pre = nn.Conv(self.filter_channels, (1,), name="pre")
        self.convs = DDSConv(self.filter_channels, self.kernel_size, 3, self.p_dropout)
        self.proj = nn.Conv(self.filter_channels, (1,))
        if self.gin_channels:
            self.cond = nn.Conv(self.filter_channels, (1,))
        # main flows over [B, T, 2]
        self.log_flow_affine = ElementwiseAffine(2)
        self.flows = [
            ConvFlow(2, self.filter_channels, self.kernel_size, num_bins=10)
            for _ in range(self.n_flows)
        ]
        # posterior flows
        self.post_pre = nn.Conv(self.filter_channels, (1,))
        self.post_convs = DDSConv(self.filter_channels, self.kernel_size, 3, self.p_dropout)
        self.post_proj = nn.Conv(self.filter_channels, (1,))
        self.post_affine = ElementwiseAffine(2)
        self.post_flows = [
            ConvFlow(2, self.filter_channels, self.kernel_size, num_bins=10)
            for _ in range(4)
        ]

    def _context(self, x, mask, g, deterministic):
        x = jax.lax.stop_gradient(x)
        h = self.pre(x)
        if g is not None and self.gin_channels:
            h = h + self.cond(jax.lax.stop_gradient(g))
        h = self.convs(h, mask, deterministic=deterministic)
        return self.proj(h) * mask

    def __call__(self, x, mask, w=None, g=None, reverse=False,
                 noise_scale=1.0, deterministic=True):
        h = self._context(x, mask, g, deterministic)
        b, t, _ = x.shape

        if not reverse:
            assert w is not None
            # posterior over (u, nu): e_q -> post flows conditioned on (h, h_w)
            h_w = self.post_proj(
                self.post_convs(self.post_pre(w), mask, deterministic=deterministic)
            ) * mask
            e_q = jax.random.normal(self.make_rng("sdp"), (b, t, 2)) * mask
            z_q = e_q
            logdet_q = 0.0
            z_q, ld = self.post_affine(z_q, mask)
            logdet_q = logdet_q + ld
            for f in self.post_flows:
                z_q, ld = f(z_q, mask, g=h + h_w)
                logdet_q = logdet_q + ld
                z_q = jnp.flip(z_q, axis=-1)
            z_u, z1 = jnp.split(z_q, 2, axis=-1)
            u = nn.sigmoid(z_u) * mask
            z0 = (w - u) * mask
            logdet_q = logdet_q + jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * mask, axis=(1, 2)
            )
            logq = (
                jnp.sum(-0.5 * (LOG_2PI + jnp.square(e_q)) * mask, axis=(1, 2))
                - logdet_q
            )

            # prior: log flow + affine + conv flows on [z0, z1]
            logdet_total = 0.0
            z0_log = jnp.log(jnp.clip(z0, min=1e-5)) * mask
            logdet_total = logdet_total + jnp.sum(-z0_log * mask, axis=(1, 2))
            z = jnp.concatenate([z0_log, z1], axis=-1)
            z, ld = self.log_flow_affine(z, mask)
            logdet_total = logdet_total + ld
            for f in self.flows:
                z, ld = f(z, mask, g=h)
                logdet_total = logdet_total + ld
                z = jnp.flip(z, axis=-1)
            nll = (
                jnp.sum(0.5 * (LOG_2PI + jnp.square(z)) * mask, axis=(1, 2))
                - logdet_total
            )
            return nll + logq  # [B]

        # reverse: sample log-durations
        e = (
            jax.random.normal(self.make_rng("sdp"), (b, t, 2))
            * mask * noise_scale
        )
        z = e
        for f in reversed(self.flows):
            z = jnp.flip(z, axis=-1)
            z, _ = f(z, mask, g=h, reverse=True)
        z, _ = self.log_flow_affine(z, mask, reverse=True)
        z0, _ = jnp.split(z, 2, axis=-1)
        return z0  # log-durations [B, T, 1]


class DurationPredictorVITS(nn.Module):
    """Deterministic duration predictor option (vits_modules.py DurationPredictor)."""

    filter_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.5
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic=True):
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels:
            x = x + nn.Conv(x.shape[-1], (1,), name="cond")(jax.lax.stop_gradient(g))
        for i in range(2):
            x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME",
                        name=f"conv_{i}")(x * mask)
            x = nn.relu(x)
            x = nn.LayerNorm(name=f"norm_{i}")(x)
            x = nn.Dropout(rate=self.p_dropout)(x, deterministic=deterministic)
        return nn.Conv(1, (1,), name="proj")(x * mask) * mask  # log durations


class TextEncoderVITS(nn.Module):
    """Token embed + FFT stack -> hidden + prior stats (vits TextEncoder)."""

    n_vocab: int
    out_channels: int = 192
    hidden_channels: int = 192
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    padding_idx: int = 0

    @nn.compact
    def __call__(self, tokens, deterministic=True):
        mask = (tokens != self.padding_idx)[..., None].astype(jnp.float32)
        emb = nn.Embed(
            self.n_vocab, self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels ** -0.5),
        )(tokens) * math.sqrt(self.hidden_channels) * mask
        x, _ = FFTransformerDecoder(
            n_layer=self.n_layers, n_head=self.n_heads,
            d_model=self.hidden_channels, d_head=self.hidden_channels // self.n_heads,
            d_inner=4 * self.hidden_channels, kernel_size=self.kernel_size,
            dropout=self.p_dropout, dropatt=self.p_dropout, name="encoder",
        )(emb, mask, deterministic=deterministic)
        # zero-init: prior starts at N(0,1) so the flow-mapped KL is O(1) per
        # element at step 0 (a default-init logs_p tail reaches exp(-2*logs)
        # ~ e^8 and the initial KL explodes to ~1e6)
        stats = nn.Conv(
            2 * self.out_channels, (1,), name="proj",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x) * mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return x, m, logs, mask


def gaussian_alignment_scores(z_p, m_p, logs_p):
    """neg_cent[b, t, s] = log N(z_p[b,t]; m_p[b,s], exp(logs_p[b,s])),
    computed with MXU contractions (SynthesizerTrn.forward math)."""
    s_p_sq_r = jnp.exp(-2 * logs_p)  # [B, S, C]
    nc1 = jnp.sum(-0.5 * LOG_2PI - logs_p, axis=-1)[:, None, :]  # [B,1,S]
    nc2 = jnp.einsum("btc,bsc->bts", jnp.square(z_p), -0.5 * s_p_sq_r)
    nc3 = jnp.einsum("btc,bsc->bts", z_p, m_p * s_p_sq_r)
    nc4 = jnp.sum(-0.5 * jnp.square(m_p) * s_p_sq_r, axis=-1)[:, None, :]
    return nc1 + nc2 + nc3 + nc4  # [B, T, S]


class SynthesizerTrn(nn.Module):
    """Full VITS (vits_modules.py:725)."""

    n_vocab: int
    spec_channels: int  # linear-spectrogram bins
    inter_channels: int = 192
    hidden_channels: int = 192
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    segment_size: int = 32  # latent frames fed to the decoder
    n_speakers: int = 0
    gin_channels: int = 256
    use_sdp: bool = True
    generator: Generator = None  # type: ignore[assignment]
    padding_idx: int = 0

    def setup(self):
        self.enc_p = TextEncoderVITS(
            self.n_vocab, self.inter_channels, self.hidden_channels,
            self.n_heads, self.n_layers, self.kernel_size, self.p_dropout,
            self.padding_idx,
        )
        self.enc_q = PosteriorEncoder(
            self.spec_channels, self.inter_channels, self.hidden_channels,
            gin_channels=self.gin_channels if self.n_speakers else 0,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels,
            gin_channels=self.gin_channels if self.n_speakers else 0,
        )
        if self.use_sdp:
            self.dp = StochasticDurationPredictor(
                self.hidden_channels, 192,
                gin_channels=self.gin_channels if self.n_speakers else 0,
            )
        else:
            self.dp = DurationPredictorVITS(
                gin_channels=self.gin_channels if self.n_speakers else 0
            )
        if self.n_speakers:
            self.emb_g = nn.Embed(self.n_speakers, self.gin_channels)
        self.dec = self.generator

    def _g(self, speaker):
        if self.n_speakers and speaker is not None:
            return self.emb_g(speaker)[:, None, :]
        return None

    def __call__(self, tokens, spec, spec_lens, speaker=None, deterministic=True):
        g = self._g(speaker)
        x, m_p, logs_p, x_mask = self.enc_p(tokens, deterministic=deterministic)
        y_mask = mask_from_lens(spec_lens, spec.shape[1])[..., None].astype(jnp.float32)
        z, m_q, logs_q = self.enc_q(spec, y_mask, g)
        z_p, _ = self.flow(z, y_mask, g)

        # MAS over Gaussian scores (on device)
        neg_cent = gaussian_alignment_scores(z_p, m_p, logs_p)
        text_lens = jnp.sum(x_mask[..., 0], axis=1).astype(jnp.int32)
        attn = jax.lax.stop_gradient(
            mas_width1(neg_cent, text_lens, spec_lens)
        )  # [B, T_spec, T_text]
        w = jnp.sum(attn, axis=1)[..., None]  # [B, T_text, 1]

        if self.use_sdp:
            l_length = self.dp(
                x, x_mask, w=w, g=g, deterministic=deterministic
            ) / jnp.maximum(jnp.sum(x_mask, axis=(1, 2)), 1.0)
        else:
            logw_hat = self.dp(x, x_mask, g=g, deterministic=deterministic)
            logw = jnp.log(w + 1e-6) * x_mask
            l_length = jnp.sum(jnp.square(logw_hat - logw), axis=(1, 2)) / jnp.maximum(
                jnp.sum(x_mask, axis=(1, 2)), 1.0
            )

        # expand prior stats through the alignment
        m_p_exp = jnp.einsum("bts,bsc->btc", attn, m_p)
        logs_p_exp = jnp.einsum("bts,bsc->btc", attn, logs_p)

        z_slice, ids = rand_slice_segments(
            self.make_rng("segments"), jnp.swapaxes(z, 1, 2), spec_lens,
            self.segment_size,
        )
        o = self.dec(jnp.swapaxes(z_slice, 1, 2))
        return {
            "audio": o,
            "l_length": l_length,
            "attn": attn,
            "ids_slice": ids,
            "x_mask": x_mask,
            "y_mask": y_mask,
            "z": z, "z_p": z_p, "m_p": m_p_exp, "logs_p": logs_p_exp,
            "m_q": m_q, "logs_q": logs_q,
        }

    def infer(self, tokens, speaker=None, noise_scale=0.667, length_scale=1.0,
              noise_scale_w=0.8, max_len: int = 1024):
        g = self._g(speaker)
        x, m_p, logs_p, x_mask = self.enc_p(tokens)
        if self.use_sdp:
            logw = self.dp(x, x_mask, g=g, reverse=True, noise_scale=noise_scale_w)
        else:
            logw = self.dp(x, x_mask, g=g)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0]
        from roar_tpu.ops.lengths import regulate_len

        m_p_exp, y_lens = regulate_len(w_ceil, m_p, max_len=max_len)
        logs_p_exp, _ = regulate_len(w_ceil, logs_p, max_len=max_len)
        y_mask = mask_from_lens(y_lens, max_len)[..., None].astype(jnp.float32)
        eps = jax.random.normal(self.make_rng("latents"), m_p_exp.shape)
        z_p = (m_p_exp + eps * jnp.exp(logs_p_exp) * noise_scale) * y_mask
        z, _ = self.flow(z_p, y_mask, g, reverse=True)
        o = self.dec(z * y_mask)
        return o, y_lens, y_mask
