"""Weight-transplant parity: reference torch math vs flax modules.

Builds a minimal torch implementation of the reference TransformerLayer
(MultiHeadAttn + PositionwiseConvFF, modules/attention.py:27-100 +
transformer.py:49-103) with reference parameter naming, converts the torch
state dict through training/convert.py, and checks the flax layer produces
the same outputs — numerical evidence that the architecture matches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roar_tpu.models.transformer import FFTransformerDecoder
from roar_tpu.training.convert import apply_mapped_params, map_fastpitch_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402


class TorchMHA(nn.Module):
    """Reference MultiHeadAttn math (post-LN path, no dropout), with proper
    key masking (we test without padding so the reference's float-mask quirk
    doesn't matter)."""

    def __init__(self, n_head, d_model, d_head):
        super().__init__()
        self.n_head, self.d_head = n_head, d_head
        self.qkv_net = nn.Linear(d_model, 3 * n_head * d_head)
        self.o_net = nn.Linear(n_head * d_head, d_model, bias=False)
        self.layer_norm = nn.LayerNorm(d_model)

    def forward(self, inp):
        n_head, d_head = self.n_head, self.d_head
        head_q, head_k, head_v = torch.chunk(self.qkv_net(inp), 3, dim=2)
        b, t, _ = inp.shape
        q = head_q.view(b, t, n_head, d_head).permute(2, 0, 1, 3).reshape(-1, t, d_head)
        k = head_k.view(b, t, n_head, d_head).permute(2, 0, 1, 3).reshape(-1, t, d_head)
        v = head_v.view(b, t, n_head, d_head).permute(2, 0, 1, 3).reshape(-1, t, d_head)
        attn = F.scaled_dot_product_attention(q, k, v)
        attn = attn.view(n_head, b, t, d_head).permute(1, 2, 0, 3).reshape(b, t, -1)
        return self.layer_norm(inp + self.o_net(attn))


class TorchConvFF(nn.Module):
    def __init__(self, d_model, d_inner, kernel_size):
        super().__init__()
        self.CoreNet = nn.Sequential(
            nn.Conv1d(d_model, d_inner, kernel_size, 1, kernel_size // 2),
            nn.ReLU(),
            nn.Conv1d(d_inner, d_model, kernel_size, 1, kernel_size // 2),
        )
        self.layer_norm = nn.LayerNorm(d_model)

    def forward(self, x):
        core = self.CoreNet(x.transpose(1, 2)).transpose(1, 2)
        return self.layer_norm(x + core)


class TorchFFTStack(nn.Module):
    """Reference FFTransformerDecoder body (pos emb + layers), 1 layer."""

    def __init__(self, n_head, d_model, d_head, d_inner, kernel_size):
        super().__init__()
        self.attn = TorchMHA(n_head, d_model, d_head)
        self.ff = TorchConvFF(d_model, d_inner, kernel_size)

    def forward(self, x, pos_emb):
        x = x + pos_emb
        x = self.attn(x)
        return self.ff(x)


def test_transformer_layer_weight_transplant_parity():
    torch.manual_seed(0)
    n_head, d_model, d_head, d_inner, ks = 2, 32, 16, 64, 3
    tmodel = TorchFFTStack(n_head, d_model, d_head, d_inner, ks).eval()

    # name the torch params with reference keys for the converter
    sd = {
        "decoder.layers.0.dec_attn.qkv_net.weight": tmodel.attn.qkv_net.weight.detach().numpy(),
        "decoder.layers.0.dec_attn.qkv_net.bias": tmodel.attn.qkv_net.bias.detach().numpy(),
        "decoder.layers.0.dec_attn.o_net.weight": tmodel.attn.o_net.weight.detach().numpy(),
        "decoder.layers.0.dec_attn.layer_norm.weight": tmodel.attn.layer_norm.weight.detach().numpy(),
        "decoder.layers.0.dec_attn.layer_norm.bias": tmodel.attn.layer_norm.bias.detach().numpy(),
        "decoder.layers.0.pos_ff.CoreNet.0.weight": tmodel.ff.CoreNet[0].weight.detach().numpy(),
        "decoder.layers.0.pos_ff.CoreNet.0.bias": tmodel.ff.CoreNet[0].bias.detach().numpy(),
        "decoder.layers.0.pos_ff.CoreNet.2.weight": tmodel.ff.CoreNet[2].weight.detach().numpy(),
        "decoder.layers.0.pos_ff.CoreNet.2.bias": tmodel.ff.CoreNet[2].bias.detach().numpy(),
        "decoder.layers.0.pos_ff.layer_norm.weight": tmodel.ff.layer_norm.weight.detach().numpy(),
        "decoder.layers.0.pos_ff.layer_norm.bias": tmodel.ff.layer_norm.bias.detach().numpy(),
    }

    fdec = FFTransformerDecoder(
        n_layer=1, n_head=n_head, d_model=d_model, d_head=d_head,
        d_inner=d_inner, kernel_size=ks, dropout=0.0, dropatt=0.0,
    )
    b, t = 2, 12
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, t, d_model)).astype(np.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    params = fdec.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)

    mapped = map_fastpitch_state_dict(sd)
    # the converter targets the FastPitchModule tree; this standalone decoder
    # drops the decoder_module scope
    mapped = {k.replace("decoder_module/", ""): v for k, v in mapped.items()}
    new_params, loaded, missing = apply_mapped_params(
        {"params": params["params"]}, mapped
    )
    # everything from the torch block must land
    assert len(loaded) == len(sd), (sorted(mapped.keys()), sorted(loaded))

    # torch forward with the same sinusoidal positions our decoder adds
    from roar_tpu.models.transformer import sinusoidal_positional_embedding

    pos = np.asarray(sinusoidal_positional_embedding(t, d_model))
    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(pos[None])).numpy()
    got, _ = fdec.apply(new_params, jnp.asarray(x), mask)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


class TestActualReferenceParity:
    """Transplant tests against the REAL reference torch modules imported
    from /root/reference (not twins) — VERDICT r1 #5 / SURVEY §7 hard part 6."""

    @pytest.fixture(scope="class")
    def ref(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from reference_import import import_reference_module

        return {
            "transformer": import_reference_module(
                "roar.collections.tts.modules.transformer"
            ),
            "hifigan": import_reference_module(
                "roar.collections.tts.modules.hifigan_modules"
            ),
        }

    def test_reference_fft_decoder_parity(self, ref):
        """Reference FFTransformerDecoder (transformer.py:148-224) forward
        == flax FFTransformerDecoder after weight transplant."""
        torch.manual_seed(0)
        n_layer, n_head, d_model, d_head, d_inner, ks = 2, 1, 32, 16, 64, 3
        tdec = ref["transformer"].FFTransformerDecoder(
            n_layer=n_layer, n_head=n_head, d_model=d_model, d_head=d_head,
            d_inner=d_inner, kernel_size=ks, dropout=0.0, dropatt=0.0,
        ).eval()

        sd = {
            f"decoder.{k}": v.detach().numpy()
            for k, v in tdec.state_dict().items()
        }
        fdec = FFTransformerDecoder(
            n_layer=n_layer, n_head=n_head, d_model=d_model, d_head=d_head,
            d_inner=d_inner, kernel_size=ks, dropout=0.0, dropatt=0.0,
        )
        # full-length sequences: the reference's float-key-mask quirk makes
        # padded keys leak into attention (documented divergence, README
        # "attention masking"), so padded batches legitimately differ
        b, t = 2, 12
        rng = np.random.default_rng(0)
        x = rng.standard_normal((b, t, d_model)).astype(np.float32)
        seq_lens = np.asarray([t, t], np.int64)
        mask_np = (np.arange(t)[None, :] < seq_lens[:, None]).astype(np.float32)

        params = fdec.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask_np[..., None])
        )
        mapped = map_fastpitch_state_dict(sd)
        mapped = {k.replace("decoder_module/", ""): v for k, v in mapped.items()}
        new_params, loaded, _ = apply_mapped_params({"params": params["params"]}, mapped)
        # every torch weight must land in the flax tree
        n_expected = len([k for k in sd if "pos_emb" not in k])
        assert len(loaded) == n_expected, (len(loaded), n_expected)

        with torch.no_grad():
            t_out, t_mask = tdec(
                input=torch.tensor(x), seq_lens=torch.tensor(seq_lens)
            )
        got, _ = fdec.apply(new_params, jnp.asarray(x), jnp.asarray(mask_np[..., None]))
        # compare only valid positions (reference zeroes padding via mask mult)
        ref_np = t_out.numpy() * mask_np[..., None]
        got_np = np.asarray(got) * mask_np[..., None]
        np.testing.assert_allclose(got_np, ref_np, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("resblock", [1, 2])
    def test_reference_hifigan_generator_parity(self, ref, resblock):
        """Reference HiFi-GAN Generator (hifigan_modules.py:164-255) mel->wav
        == flax Generator after weight-norm-aware transplant
        (training/convert.py map_hifigan_generator_state_dict)."""
        from roar_tpu.models.hifigan import Generator
        from roar_tpu.training.convert import map_hifigan_generator_state_dict

        torch.manual_seed(0)
        kw = dict(
            upsample_rates=[4, 4],
            upsample_kernel_sizes=[8, 8],
            upsample_initial_channel=32,
            resblock_kernel_sizes=[3, 5] if resblock == 1 else [3],
            resblock_dilation_sizes=(
                [[1, 3, 5], [1, 3, 5]] if resblock == 1 else [[1, 2]]
            ),
            initial_input_size=16,
        )
        tgen = ref["hifigan"].Generator(resblock=resblock, **kw).eval()
        fgen = Generator(
            resblock=resblock,
            upsample_rates=tuple(kw["upsample_rates"]),
            upsample_kernel_sizes=tuple(kw["upsample_kernel_sizes"]),
            upsample_initial_channel=kw["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(kw["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in kw["resblock_dilation_sizes"]
            ),
            initial_input_size=16,
        )

        rng = np.random.default_rng(1)
        mel = rng.standard_normal((2, 24, 16)).astype(np.float32)
        params = fgen.init(jax.random.PRNGKey(0), jnp.asarray(mel))
        sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
        mapped = map_hifigan_generator_state_dict(
            sd, num_kernels=len(kw["resblock_kernel_sizes"]), resblock=resblock
        )
        new_params, loaded, _ = apply_mapped_params(params, mapped)
        assert len(loaded) == len(mapped), sorted(set(mapped) - set(loaded))[:8]

        with torch.no_grad():
            ref_wav = tgen(x=torch.tensor(mel).transpose(1, 2)).squeeze(1).numpy()
        got = np.asarray(fgen.apply(new_params, jnp.asarray(mel)))
        assert got.shape == ref_wav.shape
        np.testing.assert_allclose(got, ref_wav, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_fastpitch_mapping_coverage():
    """A synthetic reference-named state dict covers the core FastPitch tree."""
    d, n_mel = 32, 20
    from roar_tpu.models import AlignerConfig, FastPitchModule, FFTConfig, PredictorConfig

    fft = FFTConfig(n_layer=1, n_head=1, d_model=d, d_head=16, d_inner=64, kernel_size=3)
    module = FastPitchModule(
        n_symbols=40, encoder=fft, decoder=fft,
        duration_predictor=PredictorConfig(input_size=d, filter_size=16),
        pitch_predictor=PredictorConfig(input_size=d, filter_size=16),
        aligner=AlignerConfig(n_text_channels=d, n_att_channels=16),
        symbols_embedding_dim=d, n_mel_channels=n_mel,
    )
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.integers(1, 40, (2, 8)).astype(np.int32))
    spec = jnp.asarray(rng.standard_normal((2, 24, n_mel)).astype(np.float32))
    pitch = jnp.asarray(rng.standard_normal((2, 24)).astype(np.float32))
    params = module.init(
        {"params": jax.random.PRNGKey(0)}, text, pitch=pitch, spec=spec,
        mel_lens=jnp.asarray([24, 24]), input_lens=jnp.asarray([8, 8]),
    )

    def rand(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {
        "encoder.word_emb.weight": rand(40, d),
        "encoder.layers.0.dec_attn.qkv_net.weight": rand(48, d),
        "encoder.layers.0.dec_attn.qkv_net.bias": rand(48),
        "encoder.layers.0.dec_attn.o_net.weight": rand(d, 16),
        "encoder.layers.0.dec_attn.layer_norm.weight": rand(d),
        "encoder.layers.0.dec_attn.layer_norm.bias": rand(d),
        "encoder.layers.0.pos_ff.CoreNet.0.weight": rand(64, d, 3),
        "encoder.layers.0.pos_ff.CoreNet.0.bias": rand(64),
        "encoder.layers.0.pos_ff.CoreNet.2.weight": rand(d, 64, 3),
        "encoder.layers.0.pos_ff.CoreNet.2.bias": rand(d),
        "encoder.layers.0.pos_ff.layer_norm.weight": rand(d),
        "encoder.layers.0.pos_ff.layer_norm.bias": rand(d),
        "duration_predictor.layers.0.conv.weight": rand(16, d, 3),
        "duration_predictor.layers.0.conv.bias": rand(16),
        "duration_predictor.layers.0.norm.weight": rand(16),
        "duration_predictor.layers.0.norm.bias": rand(16),
        "duration_predictor.fc.weight": rand(1, 16),
        "duration_predictor.fc.bias": rand(1),
        "aligner.key_proj.0.weight": rand(2 * d, d, 3),
        "aligner.key_proj.0.bias": rand(2 * d),
        "aligner.key_proj.2.weight": rand(16, 2 * d, 1),
        "aligner.key_proj.2.bias": rand(16),
        "aligner.query_proj.0.weight": rand(2 * n_mel, n_mel, 3),
        "aligner.query_proj.0.bias": rand(2 * n_mel),
        "aligner.query_proj.2.weight": rand(n_mel, 2 * n_mel, 1),
        "aligner.query_proj.2.bias": rand(n_mel),
        "aligner.query_proj.4.weight": rand(16, n_mel, 1),
        "aligner.query_proj.4.bias": rand(16),
        "pitch_emb.weight": rand(d, 1, 3),
        "pitch_emb.bias": rand(d),
        "proj.weight": rand(n_mel, d),
        "proj.bias": rand(n_mel),
    }
    mapped = map_fastpitch_state_dict(sd)
    new_params, loaded, missing = apply_mapped_params(params, mapped)
    assert len(loaded) == len(sd), (
        f"{len(loaded)}/{len(sd)} loaded",
        sorted(set(mapped) - set(loaded))[:10],
    )
    # a transplanted leaf actually carries the source values
    got = np.asarray(new_params["params"]["proj"]["kernel"])
    np.testing.assert_allclose(got, sd["proj.weight"].T)


class TestReferenceAlignerParity:
    """Transplant parity vs the REAL reference AlignmentEncoder
    (roar/collections/tts/modules/aligner.py:9-233)."""

    def test_reference_alignment_encoder_parity(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from reference_import import import_reference_module

        ref_aligner = import_reference_module(
            "roar.collections.tts.modules.aligner"
        )

        torch.manual_seed(0)
        n_mel, n_text, n_att = 16, 32, 16
        tenc = ref_aligner.AlignmentEncoder(
            n_mel_channels=n_mel, n_text_channels=n_text,
            n_att_channels=n_att, temperature=0.0005, dist_type="l2",
        ).eval()

        from roar_tpu.models.aligner import AlignmentEncoder as FlaxAligner

        fenc = FlaxAligner(
            n_mel_channels=n_mel, n_text_channels=n_text,
            n_att_channels=n_att, temperature=0.0005, dist_type="l2",
        )

        rng = np.random.default_rng(3)
        b, t_mel, t_text = 2, 24, 10
        queries = rng.standard_normal((b, t_mel, n_mel)).astype(np.float32)
        keys = rng.standard_normal((b, t_text, n_text)).astype(np.float32)
        prior = rng.random((b, t_mel, t_text)).astype(np.float32)

        params = fenc.init(
            jax.random.PRNGKey(0), jnp.asarray(queries), jnp.asarray(keys),
            key_mask=jnp.ones((b, t_text), bool), attn_prior=jnp.asarray(prior),
        )
        sd = {f"aligner.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
        mapped = map_fastpitch_state_dict(sd)
        mapped = {k.replace("aligner_module/", ""): v for k, v in mapped.items()}
        new_params, loaded, missing = apply_mapped_params(
            {"params": params["params"]}, mapped
        )
        assert len(loaded) == len(sd), (loaded, list(sd))

        with torch.no_grad():
            # reference layout: queries [B, C1, T1], keys [B, C2, T2]
            t_attn, t_logprob = tenc(
                torch.tensor(queries).transpose(1, 2),
                torch.tensor(keys).transpose(1, 2),
                mask=None, attn_prior=torch.tensor(prior),
            )
        attn, logprob = fenc.apply(
            new_params, jnp.asarray(queries), jnp.asarray(keys),
            key_mask=jnp.ones((b, t_text), bool), attn_prior=jnp.asarray(prior),
        )
        np.testing.assert_allclose(
            np.asarray(logprob), t_logprob.numpy(), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(attn), t_attn.numpy(), atol=2e-4, rtol=1e-3
        )


class TestReferenceFullFastPitchParity:
    """Whole-graph transplant parity vs the REAL reference FastPitchModule
    (roar/collections/tts/modules/fastpitch.py:153-405), learn_alignment=False
    (given durations) so the Numba binarize path is never touched."""

    def test_reference_full_fastpitch_forward_parity(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from reference_import import import_reference_module

        ref_fp = import_reference_module("roar.collections.tts.modules.fastpitch")
        ref_tr = import_reference_module("roar.collections.tts.modules.transformer")

        torch.manual_seed(0)
        d, n_mel, vocab = 32, 16, 40
        tenc = ref_tr.FFTransformerEncoder(
            n_layer=1, n_head=1, d_model=d, d_head=16, d_inner=64,
            kernel_size=3, dropout=0.0, dropatt=0.0,
            n_embed=vocab, d_embed=d, padding_idx=0,
        )
        tdec = ref_tr.FFTransformerDecoder(
            n_layer=1, n_head=1, d_model=d, d_head=16, d_inner=64,
            kernel_size=3, dropout=0.0, dropatt=0.0,
        )
        tdur = ref_fp.TemporalPredictor(d, filter_size=16, kernel_size=3, dropout=0.0)
        tpit = ref_fp.TemporalPredictor(d, filter_size=16, kernel_size=3, dropout=0.0)
        tmod = ref_fp.FastPitchModule(
            encoder_module=tenc, decoder_module=tdec,
            duration_predictor=tdur, pitch_predictor=tpit,
            energy_predictor=None, aligner=None, speaker_encoder=None,
            n_speakers=1, symbols_embedding_dim=d,
            pitch_embedding_kernel_size=3, energy_embedding_kernel_size=3,
            n_mel_channels=n_mel,
        ).eval()

        from roar_tpu.models import FastPitchModule, FFTConfig, PredictorConfig

        fft = FFTConfig(n_layer=1, n_head=1, d_model=d, d_head=16, d_inner=64,
                        kernel_size=3, dropout=0.0, dropatt=0.0)
        fmod = FastPitchModule(
            n_symbols=vocab, padding_idx=0, encoder=fft, decoder=fft,
            duration_predictor=PredictorConfig(input_size=d, filter_size=16, dropout=0.0),
            pitch_predictor=PredictorConfig(input_size=d, filter_size=16, dropout=0.0),
            aligner=None, n_speakers=1, symbols_embedding_dim=d,
            n_mel_channels=n_mel,
        )

        rng = np.random.default_rng(5)
        b, t_text = 2, 9
        text = rng.integers(1, vocab, size=(b, t_text)).astype(np.int64)
        durs = rng.integers(1, 4, size=(b, t_text)).astype(np.int64)
        # equal decoded lengths: the reference decoder feeds torch SDPA a 0/1
        # FLOAT mask, giving padded keys a +1 additive bonus (documented
        # divergence, README 'attention masking') — ragged rows legitimately
        # differ, so the whole-graph comparison uses full-length rows
        durs[:, -1] += durs.sum(-1).max() - durs.sum(-1)
        t_frames = int(durs.sum(-1).max())
        pitch = rng.standard_normal((b, t_frames)).astype(np.float32)

        params = fmod.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(text, jnp.int32),
            durs=jnp.asarray(durs, jnp.int32), pitch=jnp.asarray(pitch),
            max_mel_len=t_frames,
        )
        sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
        mapped = map_fastpitch_state_dict(sd, n_layers=1)
        new_params, loaded, _ = apply_mapped_params(params, mapped)
        n_expected = len(
            [k for k in sd if "pos_emb" not in k and "pitch_mean" not in k
             and "pitch_std" not in k]
        )
        assert len(loaded) == n_expected, (len(loaded), n_expected)

        with torch.no_grad():
            (t_spect, t_dec_lens, t_durs_pred, t_log_durs, t_pitch_pred,
             *_rest) = tmod(
                text=torch.tensor(text), durs=torch.tensor(durs),
                pitch=torch.tensor(pitch),
            )
        out = fmod.apply(
            new_params,
            jnp.asarray(text, jnp.int32), durs=jnp.asarray(durs, jnp.int32),
            pitch=jnp.asarray(pitch), max_mel_len=t_frames,
        )
        np.testing.assert_array_equal(
            np.asarray(out["num_frames"]), t_dec_lens.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(out["log_durs_predicted"]), t_log_durs.numpy(),
            atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["pitch_predicted"]), t_pitch_pred.numpy(),
            atol=2e-4, rtol=1e-3,
        )
        # reference spect is [B, n_mel, T]; ours is [B, T, n_mel]
        ref_spect = t_spect.numpy().transpose(0, 2, 1)
        got = np.asarray(out["spect"])
        # compare valid frames per row (both pad beyond dec_lens)
        for i in range(b):
            n = int(t_dec_lens[i])
            np.testing.assert_allclose(
                got[i, :n], ref_spect[i, :n], atol=5e-4, rtol=1e-3
            )


class TestReferenceMPDParity:
    """Transplant parity vs the REAL reference MultiPeriodDiscriminator
    (hifigan_modules.py:257-390): with the generator mapping this completes
    vocoder checkpoint continuation (G + MPD)."""

    @pytest.mark.slow
    def test_reference_mpd_parity(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from reference_import import import_reference_module

        ref = import_reference_module("roar.collections.tts.modules.hifigan_modules")
        from roar_tpu.models.hifigan import MultiPeriodDiscriminator
        from roar_tpu.training.convert import map_hifigan_mpd_state_dict

        torch.manual_seed(0)
        tmpd = ref.MultiPeriodDiscriminator(debug=True).eval()
        fmpd = MultiPeriodDiscriminator(debug=True)

        rng = np.random.default_rng(7)
        y = rng.standard_normal((2, 4410)).astype(np.float32) * 0.2
        y_hat = rng.standard_normal((2, 4410)).astype(np.float32) * 0.2

        params = fmpd.init(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(y_hat))
        sd = {k: v.detach().numpy() for k, v in tmpd.state_dict().items()}
        mapped = map_hifigan_mpd_state_dict(sd)
        new_params, loaded, _ = apply_mapped_params(params, mapped)
        n_expected = len({k.rsplit(".", 1)[0] for k in sd}) * 2 + len(
            [k for k in sd if k.endswith(".bias")]
        ) - len({k.rsplit(".", 1)[0] for k in sd})  # kernel+scale per conv, +bias
        assert len(loaded) == len(mapped), (len(loaded), len(mapped))
        assert len(mapped) == 6 * 5 * 3  # 5 periods x 6 convs x (kernel,scale,bias)

        with torch.no_grad():
            t_real, t_fake, t_fr, t_ff = tmpd(
                y=torch.tensor(y).unsqueeze(1), y_hat=torch.tensor(y_hat).unsqueeze(1)
            )
        f_real, f_fake, f_fr, f_ff = fmpd.apply(
            new_params, jnp.asarray(y), jnp.asarray(y_hat)
        )
        assert len(f_real) == len(t_real) == 5
        for i in range(5):
            np.testing.assert_allclose(
                np.asarray(f_real[i]).reshape(t_real[i].shape), t_real[i].numpy(),
                atol=3e-4, rtol=1e-3,
            )
            np.testing.assert_allclose(
                np.asarray(f_fake[i]).reshape(t_fake[i].shape), t_fake[i].numpy(),
                atol=3e-4, rtol=1e-3,
            )
            # last feature map too (shape differs only in layout)
            tf = t_fr[i][-1].numpy()  # [B, C, H, W]
            ff = np.asarray(f_fr[i][-1])  # [B, H, W, C]
            np.testing.assert_allclose(
                ff.transpose(0, 3, 1, 2), tf, atol=3e-4, rtol=1e-3
            )


@pytest.mark.slow
def test_vocoder_checkpoint_continuation_gan_step():
    """End-to-end continuation: a reference-style HiFi-GAN checkpoint
    (Generator + MPD weight-normed state dicts from the ACTUAL reference
    modules) transplants into a HifiGanModel training state and takes one
    finite GAN step — a reference-trained vocoder resumes adversarial
    training here."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from reference_import import import_reference_module

    ref = import_reference_module("roar.collections.tts.modules.hifigan_modules")
    from roar_tpu.models.hifigan_model import HifiGanModel
    from roar_tpu.training.convert import (
        map_hifigan_generator_state_dict,
        map_hifigan_mpd_state_dict,
    )
    from roar_tpu.training.optim import build_optimizer

    torch.manual_seed(0)
    gen_kw = dict(
        resblock=2, upsample_rates=[8, 4], upsample_kernel_sizes=[16, 8],
        upsample_initial_channel=16, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], initial_input_size=16,
    )
    tgen = ref.Generator(**gen_kw).eval()
    tmpd = ref.MultiPeriodDiscriminator(debug=True).eval()

    cfg = {
        "preprocessor": {"sample_rate": 22050, "nfilt": 16, "n_window_size": 256,
                         "n_window_stride": 32, "n_fft": 256, "highfreq": 8000,
                         "preemph": None, "normalize": None, "mag_power": 1.0,
                         "log_zero_guard_type": "clamp",
                         "log_zero_guard_value": 1e-05, "dither": 0.0,
                         "pad_to": 0, "exact_pad": True},
        "generator": {"resblock": 2, "upsample_rates": [8, 4],
                      "upsample_kernel_sizes": [16, 8],
                      "upsample_initial_channel": 16,
                      "resblock_kernel_sizes": [3],
                      "resblock_dilation_sizes": [[1, 3]]},
        "debug": True,
        "optim": {"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]},
    }
    model = HifiGanModel(cfg)
    seg = 1024
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, seg)) * 0.1, jnp.float32),
        "audio_len": jnp.full((2,), seg, jnp.int32),
    }
    g_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    d_opt = build_optimizer({"name": "adamw", "lr": 2e-4, "betas": [0.8, 0.99]})
    state = model.init_state(jax.random.PRNGKey(0), batch, g_opt, d_opt)

    g_sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    g_mapped = map_hifigan_generator_state_dict(g_sd, num_kernels=1, resblock=2)
    new_g, loaded_g, _ = apply_mapped_params(state.g_params, g_mapped)
    assert len(loaded_g) == len(g_mapped) and loaded_g

    mpd_sd = {k: v.detach().numpy() for k, v in tmpd.state_dict().items()}
    mpd_mapped = {
        k.replace("params/", "params/mpd/"): v
        for k, v in map_hifigan_mpd_state_dict(mpd_sd).items()
    }
    new_d, loaded_d, _ = apply_mapped_params(
        {"params": state.d_params["params"]}, mpd_mapped
    )
    assert len(loaded_d) == len(mpd_mapped) and loaded_d

    state = state.replace(g_params=new_g, d_params=new_d)
    step = model.make_train_step(g_opt, d_opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


class TestReferenceMSDParity:
    """Transplant parity vs the REAL reference MultiScaleDiscriminator —
    including the spectral-normed first scale (exact-by-construction: W_eff
    baked into the kernel, power-iteration state seeded with its true top
    singular vector so flax's one-step sigma is 1)."""

    @pytest.mark.slow
    def test_reference_msd_parity(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from reference_import import import_reference_module

        ref = import_reference_module("roar.collections.tts.modules.hifigan_modules")
        from roar_tpu.models.hifigan import MultiScaleDiscriminator
        from roar_tpu.training.convert import map_hifigan_msd_state_dict

        torch.manual_seed(0)
        tmsd = ref.MultiScaleDiscriminator(debug=True)

        rng = np.random.default_rng(9)
        y = rng.standard_normal((2, 4096)).astype(np.float32) * 0.2
        y_hat = rng.standard_normal((2, 4096)).astype(np.float32) * 0.2

        # converge torch's spectral-norm power iteration (one step per train
        # forward): a TRAINED checkpoint always carries converged u/v, but a
        # fresh module's sigma = u^T W v is not yet the spectral norm, while
        # flax always normalizes by the true norm
        tmsd.train()
        with torch.no_grad():
            for _ in range(200):
                tmsd(y=torch.tensor(y).unsqueeze(1), y_hat=torch.tensor(y_hat).unsqueeze(1))
        tmsd = tmsd.eval()
        fmsd = MultiScaleDiscriminator(debug=True)

        vs = fmsd.init(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(y_hat))
        sd = {k: v.detach().numpy() for k, v in tmsd.state_dict().items()}
        p_map, s_map = map_hifigan_msd_state_dict(sd)
        new_params, loaded_p, _ = apply_mapped_params(
            {"params": vs["params"]}, p_map
        )
        new_stats, loaded_s, _ = apply_mapped_params(
            {"batch_stats": vs["batch_stats"]}, s_map
        )
        assert len(loaded_p) == len(p_map) and len(loaded_s) == len(s_map)
        # 3 scales x 8 convs: scale0 kernel+bias (16) + u/sigma in stats (16);
        # scales 1-2 kernel+scale+bias (3*8*2 = 48)
        assert len(p_map) == 16 + 48 and len(s_map) == 16

        with torch.no_grad():
            t_real, t_fake, t_fr, t_ff = tmsd(
                y=torch.tensor(y).unsqueeze(1), y_hat=torch.tensor(y_hat).unsqueeze(1)
            )
        f_real, f_fake, f_fr, f_ff = fmsd.apply(
            {"params": new_params["params"], "batch_stats": new_stats["batch_stats"]},
            jnp.asarray(y), jnp.asarray(y_hat), update_stats=False,
        )
        assert len(f_real) == len(t_real) == 3
        for i in range(3):
            # scale 0 tolerance is set by torch's power-iteration residual
            tol = dict(atol=3e-3, rtol=5e-3) if i == 0 else dict(atol=5e-4, rtol=1e-3)
            np.testing.assert_allclose(
                np.asarray(f_real[i]).reshape(t_real[i].shape), t_real[i].numpy(), **tol
            )
            np.testing.assert_allclose(
                np.asarray(f_fake[i]).reshape(t_fake[i].shape), t_fake[i].numpy(), **tol
            )
