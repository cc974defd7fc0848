"""Data layer tests: tokenizers, audio IO, manifest, dataset end-to-end."""

import json
from pathlib import Path

import numpy as np
import pytest

from roar_tpu.data import (
    AudioSegment,
    BucketSpec,
    LengthBucketBatchSampler,
    SupDataConfig,
    SupDataExtractor,
    TTSDataset,
    VocoderDataset,
    pitch_statistics,
    read_manifest,
    read_wav,
    resample,
    write_manifest,
    write_wav,
)
from roar_tpu.data.tokenizers import (
    BengaliCharsTokenizer,
    EnglishCharsTokenizer,
    HindiCharsTokenizer,
    TamilCharsTokenizer,
)


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------


def test_tamil_tokenizer_roundtrip():
    tok = TamilCharsTokenizer(pad_with_space=True)
    text = "வணக்கம் உலகம்"
    ids = tok.encode(text)
    assert len(ids) == len(text) + 2  # padded with spaces
    assert tok.decode(ids).strip() == text
    # pad/oov ids beyond base tokens
    assert tok.pad == len(tok.tokens) - 2
    assert tok.oov == len(tok.tokens) - 1


def test_hindi_tokenizer_mixed_language_and_digits():
    tok = HindiCharsTokenizer()
    ids = tok.encode("नमस्ते ABC 42!")
    decoded = tok.decode(ids)
    assert "नमस्ते" in decoded
    assert "abc" in decoded  # ascii folded to lowercase
    assert "42" in decoded
    assert "!" in decoded


def test_bengali_tokenizer_skips_unknown():
    tok = BengaliCharsTokenizer()
    with pytest.warns(UserWarning):
        ids = tok.encode("বাংলা 中")  # CJK char must be skipped with warning
    assert tok.decode(ids) == "বাংলা"


def test_english_tokenizer_preprocessing():
    tok = EnglishCharsTokenizer()
    ids = tok.encode("Héllo, World’s!")
    assert tok.decode(ids) == "hello, world's!"


def test_whitespace_collapsing_and_trailing_strip():
    tok = EnglishCharsTokenizer()
    assert tok.decode(tok.encode("a   b  ")) == "a b"


def test_ipa_lexicon_tables():
    from roar_tpu.data import ipa_lexicon as L

    assert L.get_grapheme_character_set("en-US", "lower") == "abcdefghijklmnopqrstuvwxyz"
    assert "Ä" in L.get_grapheme_character_set("de-DE", "upper")
    # mixed = upper + lower, ß handled without the SS expansion
    mixed = L.get_grapheme_character_set("de-DE", "mixed")
    assert "ẞ" in mixed and "ß" in mixed and "SS" not in mixed
    assert "ə" in L.get_ipa_character_set("en-US")
    assert "¿" in L.get_ipa_punctuation_list("es-ES")
    assert "„" in L.get_ipa_punctuation_list("de-DE")
    with pytest.raises(ValueError):
        L.validate_locale("fr-FR")


def test_ipa_tokenizer_roundtrip():
    from roar_tpu.data.tokenizers import IPACharsTokenizer

    tok = IPACharsTokenizer(locale="en-US", pad_with_space=True)
    with pytest.warns(UserWarning):  # stress mark not in inventory -> skipped
        ids = tok.encode("həˈloʊ wɜrld")
    assert tok.decode(ids).strip() == "həloʊ wɜrld"
    # punctuation from the locale list
    ids2 = tok.encode("əmeɪzɪŋ!")
    assert tok.decode(ids2).strip().endswith("!")


def test_word_tokenize_unchanged_spans():
    from roar_tpu.data.tokenizers import (
        any_locale_word_tokenize,
        english_word_tokenize,
    )

    out = english_word_tokenize("Hello |NVIDIA unchanged| World!")
    assert (["hello"], False) in out
    assert (["NVIDIA", "unchanged"], True) in out
    assert (["world"], False) in out
    # any-locale keeps case and handles accents as word chars
    out2 = any_locale_word_tokenize("Ö l")
    assert out2[0] == (["Ö"], False)


def test_energy_audio_trimmer():
    from roar_tpu.data.audio_trimming import EnergyAudioTrimmer

    sr = 22050
    sil = np.zeros(sr // 2, np.float32)
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio = np.concatenate([sil, tone, sil])
    trimmer = EnergyAudioTrimmer(db_threshold=40, pad_seconds=0.05)
    trimmed, start, end = trimmer.trim_audio(audio, sr, "t")
    # speech span recovered within pad + one hop of the true boundaries
    slack = int(0.05 * sr) + 2048
    assert abs(start - len(sil)) <= slack
    assert abs(end - (len(sil) + len(tone))) <= slack
    assert trimmed.shape[0] == end - start


def test_vad_audio_trimmer():
    from roar_tpu.data.audio_trimming import VadAudioTrimmer

    sr = 22050
    rng = np.random.default_rng(0)
    # quiet broadband noise floor (flat spectrum) around a tonal segment
    noise = (0.002 * rng.standard_normal(sr // 2)).astype(np.float32)
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio = np.concatenate([noise, tone, noise])
    trimmer = VadAudioTrimmer(pad_seconds=0.05)
    trimmed, start, end = trimmer.trim_audio(audio, sr, "t")
    slack = int(0.05 * sr) + int(4096 * sr / 16000) + 2
    assert abs(start - len(noise)) <= slack
    assert abs(end - (len(noise) + len(tone))) <= slack
    # all-silence input -> empty with a warning
    with pytest.warns(UserWarning):
        empty, s, e = trimmer.trim_audio(np.zeros(sr, np.float32), sr, "sil")
    assert empty.size == 0 and (s, e) == (0, 0)


def test_speech_frame_boundaries():
    from roar_tpu.data.audio_trimming import (
        get_start_and_end_of_speech_frames,
        pad_sample_indices,
    )

    is_speech = np.array([0, 1, 0, 1, 1, 1, 0, 1, 0], bool)
    # threshold 2: first run of 2 starts at 3, last run ends at 6
    assert get_start_and_end_of_speech_frames(is_speech, 2) == (3, 6)
    # threshold 1: single frames count
    assert get_start_and_end_of_speech_frames(is_speech, 1) == (1, 8)
    with pytest.warns(UserWarning):
        assert get_start_and_end_of_speech_frames(np.zeros(5, bool), 1) == (0, 0)
    assert pad_sample_indices(100, 200, 250, 100, 0.6) == (40, 250)


def test_sentencepiece_gate():
    """Without the sentencepiece package the wrapper raises a clear
    ImportError (the package is not in this image)."""
    from roar_tpu.data import sentencepiece_tokenizer as sp

    if sp._spm is None:
        with pytest.raises(ImportError, match="sentencepiece"):
            sp.SentencePieceTokenizer("/nonexistent.model")
    else:  # pragma: no cover
        with pytest.raises(ValueError, match="invalid"):
            sp.SentencePieceTokenizer("/nonexistent.model")


# ---------------------------------------------------------------------------
# Audio IO
# ---------------------------------------------------------------------------


def test_wav_roundtrip(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_resample_preserves_tone(tmp_path):
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[:16384]))
    peak_hz = spec.argmax() * sr_out / 16384
    assert abs(peak_hz - 440) < 5


def test_audio_segment_trim(tmp_path):
    sr = 22050
    x = np.concatenate(
        [np.zeros(sr // 2), 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr), np.zeros(sr // 2)]
    ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, sr)
    seg = AudioSegment.from_file(p, target_sr=sr, trim=True)
    assert seg.num_samples < len(x) - sr // 2  # most silence removed


# ---------------------------------------------------------------------------
# Manifest + sampler
# ---------------------------------------------------------------------------


def test_manifest_roundtrip(tmp_path):
    p = tmp_path / "m.json"
    entries = [
        {"audio_filepath": "a.wav", "text": "hello", "duration": 1.0},
        {"audio_filepath": "b.wav", "text": "world", "duration": 2.0},
    ]
    write_manifest(p, entries)
    assert read_manifest(p) == entries


def test_bucket_sampler_sharding():
    lengths = list(np.random.default_rng(0).uniform(1, 10, size=103))
    all_idx = set()
    for rank in range(4):
        s = LengthBucketBatchSampler(
            lengths, batch_size=4, num_shards=4, shard_rank=rank, seed=1
        )
        batches = list(s)
        assert all(len(b) == 4 for b in batches)
        for b in batches:
            all_idx.update(b)
    # shards are disjoint and equally sized
    s0 = LengthBucketBatchSampler(lengths, 4, 4, 0, seed=1)
    s1 = LengthBucketBatchSampler(lengths, 4, 4, 1, seed=1)
    assert len(list(s0)) == len(list(s1))
    assert len(all_idx) <= 103


def test_bucket_sampler_batches_have_similar_lengths():
    rng = np.random.default_rng(2)
    lengths = rng.uniform(1, 30, size=256)
    s = LengthBucketBatchSampler(lengths, batch_size=8, seed=0)
    spreads = []
    for batch in s:
        ls = lengths[list(batch)]
        spreads.append(ls.max() - ls.min())
    # Bucketed batches should be far tighter than random batching.
    assert np.median(spreads) < 8.0


# ---------------------------------------------------------------------------
# Dataset end-to-end on a synthetic manifest
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    sr = 22050
    entries = []
    rng = np.random.default_rng(0)
    freqs = [165.0, 220.0, 110.0]
    for i, f in enumerate(freqs):
        dur = 0.5 + 0.3 * i
        t = np.arange(int(sr * dur)) / sr
        x = (0.4 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(len(t))).astype(
            np.float32
        )
        p = root / f"wavs/utt{i}.wav"
        p.parent.mkdir(exist_ok=True)
        write_wav(str(p), x, sr)
        entries.append(
            {
                "audio_filepath": str(p),
                "text": f"வணக்கம் உலகம் {i}",
                "duration": dur,
                "speaker_id": i % 2,
            }
        )
    man = root / "manifest.json"
    write_manifest(man, entries)
    return root, man, sr


@pytest.mark.slow
def test_tts_dataset_end_to_end(tiny_corpus):
    root, man, sr = tiny_corpus
    tok = TamilCharsTokenizer(pad_with_space=True)
    ds = TTSDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=tok,
        sup_data_path=str(root / "sup"),
        sup_data_types=["align_prior_matrix", "pitch", "energy", "speaker_id"],
        n_fft=1024,
        win_length=1024,
        hop_length=256,
        n_mels=80,
        highfreq=8000,
        min_duration=0.1,
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["text"].dtype == np.int32
    assert item["pitch"].ndim == 1
    # pYIN should find the 165 Hz tone
    voiced_pitch = item["pitch"][item["pitch"] > 0]
    assert len(voiced_pitch) > 0
    assert abs(np.median(voiced_pitch) - 165.0) < 8.0
    # prior matches (mel_len, text_len)
    assert item["align_prior_matrix"].shape == (int(item["mel_len"]), int(item["text_len"]))
    # energy positive on the tone
    assert item["energy"].max() > 0

    # cache hit on second access — no recompute needed
    again = ds[0]
    np.testing.assert_allclose(again["pitch"], item["pitch"])

    batch = ds.collate([ds[i] for i in range(3)], BucketSpec(16, 32, 16384))
    assert batch["text"].shape[1] % 16 == 0
    assert batch["pitch"].shape[1] % 32 == 0
    assert batch["audio"].shape[1] % 16384 == 0
    assert batch["align_prior_matrix"].shape == (
        3,
        batch["pitch"].shape[1],
        batch["text"].shape[1],
    )
    # padding of text uses pad id
    assert (batch["text"][0, int(batch["text_len"][0]):] == tok.pad).all()


def test_pitch_normalization(tiny_corpus):
    root, man, sr = tiny_corpus
    tok = TamilCharsTokenizer()
    ds = TTSDataset(
        manifest_filepath=str(man),
        sample_rate=sr,
        text_tokenizer=tok,
        sup_data_path=str(root / "sup"),
        sup_data_types=["pitch"],
        n_fft=1024,
        win_length=1024,
        hop_length=256,
        pitch_norm=True,
        pitch_mean=165.0,
        pitch_std=30.0,
    )
    item = ds[0]
    # previously-zero frames stay exactly zero; voiced frames normalized
    raw = ds.extractor.load_cached("pitch", ds.file_id(ds.entries[0]))
    assert ((item["pitch"] == 0) == (raw == 0)).all()
    voiced = raw > 0
    np.testing.assert_allclose(
        item["pitch"][voiced], (raw[voiced] - 165.0) / 30.0, atol=1e-5
    )


def test_vocoder_dataset(tiny_corpus):
    root, man, sr = tiny_corpus
    ds = VocoderDataset(
        manifest_filepath=str(man), sample_rate=sr, n_segments=8192, seed=3
    )
    item = ds[0]
    assert item["audio"].shape == (8192,)
    batch = ds.collate([ds[i] for i in range(3)])
    assert batch["audio"].shape == (3, 8192)


def test_pitch_statistics():
    stats = pitch_statistics([np.array([0.0, 100.0, 200.0]), np.array([0.0, 0.0])])
    assert stats["pitch_mean"] == 150.0
    assert stats["pitch_min"] == 100.0


class TestNewStyleVocoderDataset:
    def _corpus(self, tmp_path, n=3):
        import json
        import wave

        import numpy as np

        sr = 22050
        entries = []
        for i in range(n):
            t = np.arange(sr) / sr
            x = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t) * 32767).astype(
                np.int16
            )
            p = tmp_path / f"v{i}.wav"
            with wave.open(str(p), "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(sr)
                f.writeframes(x.tobytes())
            entries.append(
                {"audio_filepath": str(p), "text": "x", "duration": 1.0}
            )
        mf = tmp_path / "v.json"
        mf.write_text("".join(json.dumps(e) + "\n" for e in entries))
        return mf

    def test_meta_sampling_and_collate(self, tmp_path):
        import numpy as np

        from roar_tpu.data.vocoder_dataset import VocoderDataset

        mf = self._corpus(tmp_path)
        ds = VocoderDataset(
            dataset_meta={
                "a": {"manifest_path": str(mf), "audio_dir": str(tmp_path),
                      "sample_weight": 3.0},
            },
            sample_rate=22050,
            n_samples=4096,
            weighted_sampling_steps_per_epoch=5,
            audio_multiple=1024,
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["audio"].shape == (4096,)
        assert not Path(item["audio_filepath"]).is_absolute()
        batch = ds.collate([ds[i] for i in range(3)])
        assert batch["audio"].shape == (3, 4096)
        assert batch["audio"].shape[1] % 1024 == 0
        idx = ds.get_sampler_indices(batch_size=2)
        assert idx.shape == (10,)
        assert set(idx.tolist()) <= {0, 1, 2}

    def test_trunc_and_processors(self, tmp_path):
        from roar_tpu.data.vocoder_dataset import VocoderDataset

        class Doubler:
            def process(self, example):
                example["audio"] = example["audio"] * 2.0

        mf = self._corpus(tmp_path)
        ds = VocoderDataset(
            dataset_meta={"a": {"manifest_path": str(mf), "audio_dir": str(tmp_path)}},
            sample_rate=22050,
            trunc_duration=0.25,
            feature_processors={"x2": Doubler()},
        )
        item = ds[0]
        assert item["audio"].shape[0] == int(0.25 * 22050)
        assert abs(item["audio"]).max() > 0.5  # doubled amplitude

    def test_missing_audio_raises_after_retries(self, tmp_path):
        import json

        from roar_tpu.data.vocoder_dataset import VocoderDataset

        mf = tmp_path / "bad.json"
        mf.write_text(json.dumps({"audio_filepath": "nope.wav", "duration": 1.0}) + "\n")
        ds = VocoderDataset(
            dataset_meta={"a": {"manifest_path": str(mf), "audio_dir": str(tmp_path)}},
            sample_rate=22050,
            num_audio_retries=2,
        )
        with pytest.raises(ValueError, match="Failed to read audio"):
            ds[0]


def test_batch_iterator_prefetch_matches_sync():
    """batch_iterator(num_workers>0) must yield the same batches in the
    same order as the synchronous path (reference dataloader_params
    num_workers semantics), and propagate loader exceptions."""
    from roar_tpu.training.run import batch_iterator

    class ToyDataset:
        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

        def collate(self, items):
            return {"x": np.stack([it["x"] for it in items])}

    ds = ToyDataset()
    sampler = [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]]
    sync = list(batch_iterator(ds, sampler))
    threaded = list(batch_iterator(ds, sampler, num_workers=3))
    assert len(sync) == len(threaded) == 5
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["x"], b["x"])

    class BoomDataset(ToyDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        list(batch_iterator(BoomDataset(), sampler, num_workers=2))


def test_paired_real_fake_spectrograms_dataset(tmp_path):
    """ref PairedRealFakeSpectrogramsDataset (dataset.py:1303-1342): paired
    mel .npy manifest -> enhancer batch keys, bucket-padded time axis,
    off-by-one pair tolerance."""
    import json

    from roar_tpu.data import BucketSpec, PairedRealFakeSpectrogramsDataset

    man = tmp_path / "pairs.json"
    with man.open("w") as f:
        for i, (tf_, tr) in enumerate([(50, 50), (71, 70)]):  # GTA off-by-one
            fake = np.random.default_rng(i).standard_normal((16, tf_)).astype(np.float32)
            real = np.random.default_rng(i + 9).standard_normal((16, tr)).astype(np.float32)
            np.save(tmp_path / f"f{i}.npy", fake)
            np.save(tmp_path / f"r{i}.npy", real)
            f.write(json.dumps({"mel_filepath": str(tmp_path / f"f{i}.npy"),
                                "mel_gt_filepath": str(tmp_path / f"r{i}.npy")}) + "\n")
    ds = PairedRealFakeSpectrogramsDataset(str(man))
    assert len(ds) == 2 and ds.lengths == [50.0, 70.0]
    item = ds[1]
    assert item["input_spectrogram"].shape == (16, 70)  # trimmed to min
    batch = ds.collate([ds[0], ds[1]], BucketSpec(1, 32, 1))
    assert batch["input_spectrogram"].shape == (2, 16, 96)  # padded to x32
    assert batch["target_spectrogram"].shape == (2, 16, 96)
    np.testing.assert_array_equal(batch["lengths"], [50, 70])
    # padding is zero beyond each length
    assert np.all(batch["input_spectrogram"][0, :, 50:] == 0)

    with pytest.raises(ValueError):
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"mel_filepath": "x"}) + "\n")
        PairedRealFakeSpectrogramsDataset(str(bad))
