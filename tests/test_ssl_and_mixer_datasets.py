"""Tests for MixerTTSXDataset (LM tokens) and FastPitchSSLDataset
(reference dataset.py:1034-1141, 1344-1731)."""

import json
import wave

import numpy as np
import pytest

from roar_tpu.data.dataset import MixerTTSXDataset
from roar_tpu.data.ssl_dataset import FastPitchSSLDataset
from roar_tpu.data.tokenizers import EnglishCharsTokenizer


def write_wav(path, sr=22050, seconds=0.4, freq=220.0):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.tobytes())
    return len(t)


def make_manifest(tmp_path, n=3, speakers=(0, 0, 1)):
    entries = []
    for i in range(n):
        wav = tmp_path / f"utt{i}.wav"
        n_samp = write_wav(wav, freq=200.0 + 50 * i)
        entries.append(
            {
                "audio_filepath": str(wav),
                "text": f"hello world {i}",
                "duration": n_samp / 22050.0,
                "speaker": int(speakers[i % len(speakers)]),
            }
        )
    mf = tmp_path / "manifest.json"
    with open(mf, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return mf, entries


class StubLMTokenizer:
    """Zero-egress stand-in for AlbertTokenizer: char codes as ids."""

    pad_id = 0
    space_id = 1

    def __call__(self, text):
        return [2 + (ord(c) % 96) for c in text]


class TestMixerTTSXDataset:
    def test_lm_tokens_and_collate(self, tmp_path):
        mf, _ = make_manifest(tmp_path)
        ds = MixerTTSXDataset(
            lm_tokenizer=StubLMTokenizer(),
            manifest_filepath=str(mf),
            sample_rate=22050,
            text_tokenizer=EnglishCharsTokenizer(),
            sup_data_path=str(tmp_path / "sup"),
            sup_data_types=("align_prior_matrix",),
        )
        items = [ds[i] for i in range(len(ds))]
        assert all("lm_tokens" in it for it in items)
        batch = ds.collate(items)
        assert batch["lm_tokens"].shape[0] == 3
        # padding uses the LM pad id
        lens = [len(ds.id2lm_tokens[i]) for i in range(3)]
        tmax = batch["lm_tokens"].shape[1]
        assert tmax == max(lens)
        for j, L in enumerate(lens):
            assert (batch["lm_tokens"][j, L:] == StubLMTokenizer.pad_id).all()
        # base TTSDataset keys survive
        assert "text" in batch and "align_prior_matrix" in batch

    def test_unknown_lm_model_raises(self, tmp_path):
        mf, _ = make_manifest(tmp_path)
        with pytest.raises(NotImplementedError):
            MixerTTSXDataset(
                lm_model="bert",
                manifest_filepath=str(mf),
                sample_rate=22050,
                text_tokenizer=EnglishCharsTokenizer(),
            )


def make_ssl_supdata(tmp_path, ds_entries, emb_type="embedding", c_dim=12, s_dim=8):
    sup = tmp_path / "sup_data"
    sup.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for e in ds_entries:
        import os
        from pathlib import Path

        base = os.path.commonpath(
            [os.path.dirname(os.path.abspath(x["audio_filepath"])) for x in ds_entries]
        )
        fid = str(
            Path(e["audio_filepath"]).relative_to(base).with_suffix("")
        ).replace("/", "_")
        t_enc = 7
        t_mel = 19
        np.save(sup / f"{emb_type}_content_embedding_{fid}.npy",
                rng.standard_normal((c_dim, t_enc)).astype(np.float32))
        emb = rng.standard_normal((s_dim,)).astype(np.float32)
        np.save(sup / f"speaker_embedding_{fid}.npy", emb / np.linalg.norm(emb))
        np.save(sup / f"duration_embedding_{fid}.npy",
                np.full((t_enc,), t_mel / t_enc, np.float32))
        np.save(sup / f"pitch_contour_{fid}.npy",
                np.abs(rng.standard_normal((t_mel,))).astype(np.float32) * 100 + 100)
        np.save(sup / f"mel_spec_{fid}.npy",
                rng.standard_normal((80, t_mel)).astype(np.float32))
    stats = {"0": {"pitch_mean": 150.0, "pitch_std": 30.0},
             "1": {"pitch_mean": 210.0, "pitch_std": 40.0}}
    with open(sup / "speaker_pitch_stats.json", "w") as f:
        json.dump(stats, f)
    return sup


class TestFastPitchSSLDataset:
    def test_item_and_collate(self, tmp_path):
        mf, entries = make_manifest(tmp_path)
        sup = make_ssl_supdata(tmp_path, entries)
        ds = FastPitchSSLDataset(
            manifest_filepath=str(mf),
            sample_rate=22050,
            ssl_content_emb_type="embedding",
            pad_multiple=1024,
            pitch_conditioning=True,
            pitch_normalization="speaker_wise",
            pitch_mean=180.0,
            pitch_std=35.0,
            sup_data_dir=str(sup),
        )
        item = ds[0]
        assert item["audio"].shape[0] % 1024 == 0
        assert item["content_embedding"].shape == (12, 7)
        assert item["pitch_contour"].shape == (19,)
        batch = ds.collate([ds[i] for i in range(3)])
        assert batch["content_embedding"].shape == (3, 12, 7)
        assert batch["mel_spectrogram"].shape == (3, 80, 19)
        assert batch["speaker_embedding"].shape == (3, 8)
        assert batch["pitch_contour"].shape == (3, 19)
        assert set(batch) >= {
            "audio", "audio_len", "content_embedding", "encoded_len",
            "speaker", "mel_len", "dataset_id", "duration",
        }

    def test_speaker_conditioning_modes(self, tmp_path):
        mf, entries = make_manifest(tmp_path)
        sup = make_ssl_supdata(tmp_path, entries)
        common = dict(
            manifest_filepath=str(mf), sample_rate=22050,
            ssl_content_emb_type="embedding", sup_data_dir=str(sup),
        )
        per_sample = FastPitchSSLDataset(**common)[0]["speaker_embedding"]
        mean_ds = FastPitchSSLDataset(speaker_conditioning_type="mean", **common)
        mean0 = mean_ds[0]["speaker_embedding"]
        mean1 = mean_ds[1]["speaker_embedding"]
        # utterances 0 and 1 are the same speaker -> identical mean embedding
        np.testing.assert_allclose(mean0, mean1)
        assert not np.allclose(per_sample, mean0)
        np.testing.assert_allclose(np.linalg.norm(mean0), 1.0, rtol=1e-5)

        interp = FastPitchSSLDataset(
            speaker_conditioning_type="interpolate", **common
        )[0]["speaker_embedding"]
        np.testing.assert_allclose(np.linalg.norm(interp), 1.0, rtol=1e-5)

    def test_speaker_wise_norm_falls_back_when_missing(self, tmp_path):
        mf, entries = make_manifest(tmp_path, speakers=(5, 5, 5))
        sup = make_ssl_supdata(tmp_path, entries)
        ds = FastPitchSSLDataset(
            manifest_filepath=str(mf), sample_rate=22050,
            ssl_content_emb_type="embedding", sup_data_dir=str(sup),
            pitch_conditioning=True, pitch_normalization="speaker_wise",
            pitch_mean=100.0, pitch_std=10.0,
        )
        item = ds[0]  # speaker 5 absent from stats -> global fallback
        assert np.isfinite(item["pitch_contour"]).all()

    def test_missing_supdata_raises(self, tmp_path):
        mf, _ = make_manifest(tmp_path)
        ds = FastPitchSSLDataset(
            manifest_filepath=str(mf), sample_rate=22050,
            ssl_content_emb_type="embedding", sup_data_dir=str(tmp_path / "nope"),
        )
        with pytest.raises(FileNotFoundError):
            ds[0]

    def test_bad_emb_type_raises(self, tmp_path):
        mf, _ = make_manifest(tmp_path)
        with pytest.raises(ValueError):
            FastPitchSSLDataset(
                manifest_filepath=str(mf), sample_rate=22050,
                ssl_content_emb_type="bogus",
            )


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
