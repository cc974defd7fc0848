"""Tests for ASR support code: clustering (ops/clustering.py), speaker_utils,
audio_utils, and the ASR datasets (reference asr/parts/utils/*,
asr/data/*)."""

import json
import wave

import numpy as np
import pytest

from roar_tpu.data import audio_utils, speaker_utils
from roar_tpu.data.asr_datasets import (
    AudioToCharDataset,
    AudioToLabelDataset,
    AudioToTargetDataset,
    CharParser,
)
from roar_tpu.ops.clustering import (
    NMESC,
    SpeakerClustering,
    SpectralClustering,
    binarize_topp,
    cos_affinity,
    kmeans,
    laplacian,
)


# ----------------------------------------------------------------------
# Clustering
# ----------------------------------------------------------------------

def speaker_embs(n_spk=3, per=30, d=16, sep=4.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_spk, d)) * sep
    emb = np.concatenate(
        [centers[i] + 0.4 * rng.standard_normal((per, d)) for i in range(n_spk)]
    )
    truth = np.repeat(np.arange(n_spk), per)
    perm = rng.permutation(len(emb))
    return emb[perm], truth[perm]


def purity(labels, truth):
    from itertools import permutations

    k = max(labels.max(), truth.max()) + 1
    best = 0.0
    for p in permutations(range(k)):
        mapped = np.asarray([p[l] for l in labels])
        best = max(best, float((mapped == truth).mean()))
    return best


class TestClustering:
    def test_affinity_properties(self):
        import jax.numpy as jnp

        emb, _ = speaker_embs()
        aff = np.asarray(cos_affinity(jnp.asarray(emb)))
        assert aff.shape == (90, 90)
        assert 0.0 <= aff.min() and aff.max() <= 1.0 + 1e-6
        np.testing.assert_allclose(aff, aff.T, atol=1e-5)

    def test_binarize_symmetric(self):
        import jax.numpy as jnp

        aff = cos_affinity(jnp.asarray(speaker_embs()[0]))
        b = np.asarray(binarize_topp(aff, jnp.asarray(5)))
        np.testing.assert_allclose(b, b.T, atol=1e-6)
        assert set(np.unique(b)).issubset({0.0, 0.5, 1.0})

    def test_laplacian_rows_sum_zero(self):
        import jax.numpy as jnp

        aff = cos_affinity(jnp.asarray(speaker_embs()[0]))
        b = binarize_topp(aff, jnp.asarray(5))
        L = np.asarray(laplacian(b))
        np.testing.assert_allclose(L.sum(axis=1), 0.0, atol=1e-4)

    def test_nmesc_estimates_speaker_count(self):
        import jax.numpy as jnp

        for n_spk in (2, 3, 4):
            emb, _ = speaker_embs(n_spk=n_spk, seed=n_spk)
            aff = cos_affinity(jnp.asarray(emb))
            est, p_hat = NMESC(aff, max_num_speakers=8).forward()
            assert est == n_spk, f"expected {n_spk}, got {est}"
            assert p_hat >= 2

    def test_end_to_end_speaker_clustering(self):
        emb, truth = speaker_embs(n_spk=3)
        labels = SpeakerClustering(max_num_speakers=8)(emb)
        assert purity(labels, truth) > 0.95

    def test_oracle_num_speakers(self):
        emb, truth = speaker_embs(n_spk=2, seed=5)
        labels = SpeakerClustering().forward_infer(emb, oracle_num_speakers=2)
        assert set(labels.tolist()) == {0, 1}
        assert purity(labels, truth) > 0.95

    def test_kmeans_basic(self):
        import jax.numpy as jnp

        x = np.concatenate([np.zeros((10, 2)), np.ones((10, 2)) * 5]).astype(
            np.float32
        )
        labels, inertia = kmeans(jnp.asarray(x), 2, jnp.asarray(0))
        labels = np.asarray(labels)
        assert len(set(labels[:10])) == 1 and len(set(labels[10:])) == 1
        assert labels[0] != labels[10]
        assert float(inertia) < 1e-3

    def test_tiny_input(self):
        assert SpeakerClustering()(np.zeros((2, 8))).tolist() == [0, 0]


# ----------------------------------------------------------------------
# speaker_utils
# ----------------------------------------------------------------------

class TestSpeakerUtils:
    def test_rttm_roundtrip(self, tmp_path):
        labels = ["0.0 1.5 speaker_0", "1.5 3.0 speaker_1", "3.0 4.0 speaker_0"]
        path = speaker_utils.labels_to_rttmfile(labels, "sess", str(tmp_path))
        back = speaker_utils.rttm_to_labels(path)
        assert back == labels

    def test_contiguous_and_merge(self):
        stamps = ["0.0 2.0 speaker_0", "1.0 3.0 speaker_0", "3.0 4.0 speaker_1"]
        cont = speaker_utils.get_contiguous_stamps(stamps)
        # overlap [1,2] split at midpoint 1.5
        assert cont[0] == "0.0 1.5 speaker_0"
        merged = speaker_utils.merge_stamps(cont)
        assert merged == ["0.0 3.0 speaker_0", "3.0 4.0 speaker_1"]

    def test_interval_algebra(self):
        assert speaker_utils.is_overlap([0, 2], [1, 3])
        assert not speaker_utils.is_overlap([0, 1], [1, 2])
        assert speaker_utils.get_overlap_range([0, 2], [1, 3]) == [1, 2]
        assert speaker_utils.merge_float_intervals(
            [[0.0, 1.0], [0.5, 2.0], [3.0, 4.0]]
        ) == [[0.0, 2.0], [3.0, 4.0]]
        assert speaker_utils.get_sub_range_list(
            [1.0, 3.0], [[0.0, 1.5], [2.0, 5.0]]
        ) == [[1.0, 1.5], [2.0, 3.0]]

    def test_subsegments(self):
        subs = speaker_utils.get_subsegments(10.0, window=1.5, shift=0.75, duration=3.0)
        assert subs[0] == [10.0, 1.5]
        assert subs[-1][0] + subs[-1][1] == pytest.approx(13.0)

    def test_generate_cluster_labels_and_der(self):
        ranges = [f"{i*0.5} {(i+1)*0.5}" for i in range(8)]
        clusters = [0, 0, 0, 1, 1, 0, 0, 0]
        hyp, lines = speaker_utils.generate_cluster_labels(ranges, clusters)
        assert hyp[0].endswith("speaker_0") and len(lines) == 8
        der_self = speaker_utils.diarization_error_rate(hyp, hyp)
        assert der_self == pytest.approx(0.0)
        # a deliberately wrong hypothesis has DER > 0
        bad = ["0.0 4.0 speaker_0"]
        assert speaker_utils.diarization_error_rate(hyp, bad) > 0.1

    def test_audio_rttm_map(self, tmp_path):
        mf = tmp_path / "m.json"
        mf.write_text(
            json.dumps(
                {"audio_filepath": "/x/a.wav", "duration": 3.0, "offset": 0}
            )
            + "\n"
        )
        out = speaker_utils.audio_rttm_map(str(mf))
        assert "a" in out and out["a"]["duration"] == 3.0

    def test_embedding_normalize(self):
        embs = np.random.default_rng(0).standard_normal((5, 8))
        normed = speaker_utils.embedding_normalize(embs)
        np.testing.assert_allclose(np.linalg.norm(normed, axis=1), 1.0, rtol=1e-5)


# ----------------------------------------------------------------------
# audio_utils
# ----------------------------------------------------------------------

class TestAudioUtils:
    def test_db_conversions(self):
        assert audio_utils.mag2db(10.0) == pytest.approx(20.0, abs=1e-6)
        assert audio_utils.db2mag(20.0) == pytest.approx(10.0)
        assert audio_utils.pow2db(100.0) == pytest.approx(20.0, abs=1e-6)
        assert audio_utils.rms(np.ones(10) * 2) == pytest.approx(2.0)

    def test_select_channels(self):
        x = np.stack([np.ones(8), 2 * np.ones(8)], axis=-1)
        np.testing.assert_allclose(audio_utils.select_channels(x, "average"), 1.5)
        np.testing.assert_allclose(audio_utils.select_channels(x, 1), 2.0)
        assert audio_utils.select_channels(x, [0]).shape == (8,)
        with pytest.raises(ValueError):
            audio_utils.select_channels(x, 5)

    def test_get_segment_start(self):
        rng = np.random.default_rng(0)
        sig = rng.standard_normal(1000).astype(np.float32)
        assert audio_utils.get_segment_start(sig, sig[123:300]) == 123

    def test_si_sdr_scale_invariance(self):
        rng = np.random.default_rng(0)
        t = rng.standard_normal(4000)
        est = 3.7 * t  # pure rescale: SI-SDR should be (near) infinite
        si = audio_utils.calculate_sdr(est, t, scale_invariant=True)
        plain = audio_utils.calculate_sdr(est, t)
        assert si > 80.0
        assert plain < si

    def test_convolution_invariant_sdr(self):
        rng = np.random.default_rng(0)
        t = rng.standard_normal(4000)
        h = np.asarray([0.8, 0.15, 0.05])
        est = np.convolve(t, h)[: len(t)]
        ci = audio_utils.calculate_sdr(
            est, t, convolution_invariant=True, convolution_filter_length=16
        )
        assert ci > 40.0

    def test_toeplitz(self):
        x = np.asarray([1.0, 2.0, 3.0])
        m = audio_utils.toeplitz(x)
        expect = np.asarray([[1, 2, 3], [2, 1, 2], [3, 2, 1]], float)
        np.testing.assert_allclose(m, expect)

    def test_theoretical_coherence_properties(self):
        pos = np.asarray([[0.0, 0, 0], [0.05, 0, 0], [0.1, 0, 0]])
        coh = audio_utils.theoretical_coherence(pos, sample_rate=16000, fft_length=256)
        assert coh.shape == (129, 3, 3)
        np.testing.assert_allclose(coh[:, 0, 0], 1.0)
        np.testing.assert_allclose(coh, coh.swapaxes(1, 2), atol=1e-8)
        # DC bin: fully coherent
        np.testing.assert_allclose(coh[0], 1.0, atol=1e-8)

    def test_noise_field_matches_coherence(self):
        """Independent noise transformed to a spherical field must have
        estimated coherence closer to the theoretical one than the input."""
        rng = np.random.default_rng(0)
        pos = np.asarray([[0.0, 0, 0], [0.04, 0, 0]])
        fft_length = 256
        noise = rng.standard_normal((16000 * 2, 2))
        out = audio_utils.generate_approximate_noise_field(
            pos, noise, sample_rate=16000, fft_length=fft_length
        )
        from scipy.signal import stft as sp_stft

        def coh_err(x):
            _, _, S = sp_stft(x.T, nperseg=fft_length,
                              noverlap=3 * fft_length // 4, window="hann")
            est = audio_utils.estimated_coherence(S.transpose(1, 2, 0))
            want = audio_utils.theoretical_coherence(
                pos, sample_rate=16000, fft_length=fft_length
            )
            return np.mean(np.abs(est.real[5:-5] - want[5:-5]))

        assert coh_err(out) < 0.5 * coh_err(noise)

    def test_wrap_to_pi(self):
        np.testing.assert_allclose(
            audio_utils.wrap_to_pi(np.asarray([3 * np.pi])), [-np.pi], atol=1e-9
        )
        np.testing.assert_allclose(
            audio_utils.wrap_to_pi(np.asarray([0.5, -0.5])), [0.5, -0.5], atol=1e-9
        )


# ----------------------------------------------------------------------
# ASR datasets
# ----------------------------------------------------------------------

def write_wav(path, sr=16000, seconds=0.3, freq=300.0):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.tobytes())


class TestASRDatasets:
    def make_manifest(self, tmp_path, extra=lambda i: {}):
        entries = []
        for i in range(3):
            wav = tmp_path / f"u{i}.wav"
            write_wav(wav, freq=250 + 30 * i)
            e = {"audio_filepath": str(wav), "duration": 0.3,
                 "text": f"abc {i}"}
            e.update(extra(i))
            entries.append(e)
        mf = tmp_path / "m.json"
        mf.write_text("".join(json.dumps(e) + "\n" for e in entries))
        return mf

    def test_char_parser(self):
        p = CharParser(list("abc "))
        assert p("ab cz") == [0, 1, 3, 2]  # z dropped

    def test_audio_to_char(self, tmp_path):
        mf = self.make_manifest(tmp_path)
        ds = AudioToCharDataset(
            str(mf), labels=list("abc 0123456789"), sample_rate=16000,
            audio_multiple=1024, text_multiple=4,
        )
        batch = ds.collate([ds[i] for i in range(3)])
        assert batch["audio"].shape[1] % 1024 == 0
        assert batch["tokens"].shape == (3, 8)
        assert (batch["tokens_len"] == 5).all()
        # pad id = len(labels) (blank) fills beyond tokens_len
        assert (batch["tokens"][0, 5:] == 14).all()

    def test_audio_to_char_with_augmentor(self, tmp_path):
        """The reference's `augmentor` YAML dict wires online perturbation
        into the ASR datasets (audio_to_text.py augmentor arg)."""
        mf = self.make_manifest(tmp_path)
        kw = dict(labels=list("abc 0123456789"), sample_rate=16000,
                  audio_multiple=1024, text_multiple=4)
        clean = AudioToCharDataset(str(mf), **kw)
        aug = AudioToCharDataset(
            str(mf),
            augmentor={"white_noise": {"prob": 1.0, "min_level": -40,
                                       "max_level": -40}},
            **kw,
        )
        import numpy as np

        a, b = clean[0]["audio"], aug[0]["audio"]
        assert a.shape == b.shape
        assert not np.allclose(a, b)
        assert np.abs(a - b).std() > 1e-4  # noise actually injected

    def test_audio_to_label(self, tmp_path):
        mf = self.make_manifest(tmp_path, extra=lambda i: {"label": f"spk{i % 2}"})
        ds = AudioToLabelDataset(
            str(mf), labels=None, sample_rate=16000,
            window_length_in_sec=0.2, audio_multiple=1024,
        )
        assert ds.labels == ["spk0", "spk1"]
        item = ds[0]
        assert item["audio"].shape[0] == int(0.2 * 16000)
        batch = ds.collate([ds[i] for i in range(3)])
        assert batch["label"].tolist() == [0, 1, 0]

    def test_audio_to_target(self, tmp_path):
        def extra(i):
            tgt = tmp_path / f"t{i}.wav"
            write_wav(tgt, freq=100)
            return {"input_filepath": str(tmp_path / f"u{i}.wav"),
                    "target_filepath": str(tgt)}

        mf = self.make_manifest(tmp_path, extra=extra)
        ds = AudioToTargetDataset(
            str(mf), sample_rate=16000, audio_duration=0.1, audio_multiple=512,
        )
        item = ds[0]
        assert item["input_signal"].shape == item["target_signal"].shape
        assert item["input_signal"].shape[0] == 1600
        batch = ds.collate([ds[i] for i in range(3)])
        assert batch["input_signal"].shape == batch["target_signal"].shape
        assert batch["input_signal"].shape[1] % 512 == 0

    def test_audio_to_target_with_embedding(self, tmp_path):
        """embedding_key loads a per-item .npy vector and collates to
        [B, D] + lengths (ref AudioToTargetWithEmbeddingDataset
        audio_to_audio.py:1015-1121); builders dispatch all 3 variants."""
        def extra(i):
            tgt = tmp_path / f"t{i}.wav"
            write_wav(tgt, freq=100)
            emb = tmp_path / f"e{i}.npy"
            np.save(emb, np.full(8 + i, float(i), np.float32))
            return {"input_filepath": str(tmp_path / f"u{i}.wav"),
                    "target_filepath": str(tgt),
                    "reference_filepath": str(tgt),
                    "embedding_filepath": str(emb)}

        mf = self.make_manifest(tmp_path, extra=extra)
        ds = AudioToTargetDataset(
            str(mf), sample_rate=16000, embedding_key="embedding_filepath",
            audio_duration=0.1, audio_multiple=512,
        )
        item = ds[1]
        assert item["embedding_vector"].shape == (9,)
        batch = ds.collate([ds[i] for i in range(3)])
        assert batch["embedding_vector"].shape == (3, 10)  # padded to max D
        assert batch["embedding_len"].tolist() == [8, 9, 10]
        assert batch["embedding_vector"][2, 9] == 2.0

        from roar_tpu.data.asr_builders import (
            get_audio_to_target_dataset,
            get_audio_to_target_with_embedding_dataset,
            get_audio_to_target_with_reference_dataset,
        )

        cfg = {"manifest_filepath": str(mf), "sample_rate": 16000,
               "audio_duration": 0.1, "audio_multiple": 512}
        assert get_audio_to_target_dataset(cfg).embedding_key is None
        ref_ds = get_audio_to_target_with_reference_dataset(cfg)
        assert "reference_signal" in ref_ds[0]
        emb_ds = get_audio_to_target_with_embedding_dataset(cfg)
        assert emb_ds[0]["embedding_vector"].shape == (8,)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))


class TestTarredDatasets:
    """Tarred shard IO (ref audio_to_text.py:779-1431 webdataset path)."""

    def make_tarred_corpus(self, tmp_path, n=6, n_shards=2):
        import tarfile as tfmod

        entries = []
        shard_files = [tmp_path / f"audio_{i}.tar" for i in range(n_shards)]
        tars = [tfmod.open(str(p), "w") for p in shard_files]
        for i in range(n):
            wav = tmp_path / f"utt{i}.wav"
            write_wav(wav, freq=200 + 20 * i)
            entries.append({"audio_filepath": f"utt{i}.wav", "duration": 0.3,
                            "text": f"abc {i}"})
            tars[i % n_shards].add(str(wav), arcname=f"utt{i}.wav")
        for t in tars:
            t.close()
        mf = tmp_path / "m.json"
        mf.write_text("".join(json.dumps(e) + "\n" for e in entries))
        return mf, shard_files

    def test_brace_expansion(self):
        from roar_tpu.data.tarred_datasets import expand_braces

        assert expand_braces("a_{0..3}.tar") == [f"a_{i}.tar" for i in range(4)]
        assert expand_braces("a_{08..10}.tar") == ["a_08.tar", "a_09.tar", "a_10.tar"]
        assert expand_braces("plain.tar") == ["plain.tar"]
        assert expand_braces(["x_{0..1}.tar", "y.tar"]) == ["x_0.tar", "x_1.tar", "y.tar"]

    def test_shard_partition(self):
        from roar_tpu.data.tarred_datasets import partition_shards

        shards = [f"s{i}" for i in range(4)]
        assert partition_shards(shards, 2, 0) == ["s0", "s2"]
        assert partition_shards(shards, 2, 1) == ["s1", "s3"]
        assert partition_shards(shards) == shards

    def test_tarred_char_dataset_iterates_all(self, tmp_path):
        from roar_tpu.data.tarred_datasets import TarredAudioToCharDataset

        mf, shards = self.make_tarred_corpus(tmp_path)
        ds = TarredAudioToCharDataset(
            [str(s) for s in shards], str(mf),
            labels=list("abc 0123456789"), sample_rate=16000,
        )
        items = list(ds)
        assert len(items) == 6 == len(ds)
        for it in items:
            assert it["audio"].dtype == np.float32 and it["audio_len"] > 0
            assert it["tokens_len"] == 5

    def test_tarred_sharded_ranks_disjoint(self, tmp_path):
        from roar_tpu.data.tarred_datasets import TarredAudioToCharDataset

        mf, shards = self.make_tarred_corpus(tmp_path)
        kw = dict(labels=list("abc 0123456789"), sample_rate=16000)
        ds0 = TarredAudioToCharDataset([str(s) for s in shards], str(mf),
                                       num_shards=2, shard_rank=0, **kw)
        ds1 = TarredAudioToCharDataset([str(s) for s in shards], str(mf),
                                       num_shards=2, shard_rank=1, **kw)
        assert len(ds0.shards) == 1 and len(ds1.shards) == 1
        t0 = {tuple(i["tokens"].tolist()) for i in ds0}
        t1 = {tuple(i["tokens"].tolist()) for i in ds1}
        assert len(t0) == 3 and len(t1) == 3
        assert not (t0 & t1)  # ranks see disjoint utterances

    def test_shuffle_n_changes_order(self, tmp_path):
        from roar_tpu.data.tarred_datasets import TarredAudioToCharDataset

        mf, shards = self.make_tarred_corpus(tmp_path, n=12, n_shards=1)
        kw = dict(labels=list("abc 0123456789"), sample_rate=16000)
        plain = TarredAudioToCharDataset([str(s) for s in shards], str(mf), **kw)
        shuf = TarredAudioToCharDataset([str(s) for s in shards], str(mf),
                                        shuffle_n=8, seed=3, **kw)
        order_a = [int(i["audio_len"]) for i in plain]
        order_b = [int(i["audio_len"]) for i in shuf]
        assert sorted(order_a) == sorted(order_b)
        # same multiset; shuffled order differs (lengths vary per utt? they
        # don't — use token text instead)
        texts_a = [tuple(i["tokens"].tolist()) for i in plain]
        texts_b = [tuple(i["tokens"].tolist()) for i in shuf]
        assert sorted(texts_a) == sorted(texts_b)
        assert texts_a != texts_b


class TestMultiscaleMachinery:
    """Multiscale diarization bookkeeping (ref speaker_utils.py:117-285,
    1331-1416; offline_clustering.py:395-424,709-744)."""

    def test_parse_scale_configs(self):
        su = speaker_utils
        single = su.parse_scale_configs(1.5, 0.75, None)
        assert single["scale_dict"] == {0: (1.5, 0.75)}
        multi = su.parse_scale_configs([1.5, 1.0, 0.5], [0.75, 0.5, 0.25], [1, 1, 1])
        assert len(multi["scale_dict"]) == 3
        assert multi["scale_dict"][2] == (0.5, 0.25)
        with pytest.raises(ValueError):
            su.parse_scale_configs([0.5, 1.5], [0.25, 0.75], [1, 1])  # ascending
        with pytest.raises(ValueError):
            su.parse_scale_configs([1.5, 1.0], [0.75], [1, 1])  # length mismatch
        with pytest.raises(ValueError):
            su.parse_scale_configs([1.5], 0.75, [1])  # mixed scalar/list
        assert su.parse_scale_configs("x", "y", None) is None

    def _scales(self):
        # scale 0: two 2s segments; scale 1 (base): four 1s segments
        ts0 = np.asarray([[0.0, 2.0], [2.0, 4.0]])
        ts1 = np.asarray([[0.0, 1.0], [1.0, 2.0], [2.0, 3.0], [3.0, 4.0]])
        return ts0, ts1

    def test_get_argmin_mat(self):
        ts0, ts1 = self._scales()
        maps = speaker_utils.get_argmin_mat([ts0, ts1])
        # base segments 0,1 (anchors 0.5, 1.5) -> scale-0 segment 0 (anchor 1.0)
        assert maps[0].tolist() == [0, 0, 1, 1]
        assert maps[1].tolist() == [0, 1, 2, 3]  # base maps to itself

    def test_embs_and_timestamps_roundtrip(self):
        ts0, ts1 = self._scales()
        e0 = np.ones((2, 8)) * 0
        e1 = np.ones((4, 8)) * 1
        ms = {0: ({"utt": e0}, {"utt": ts0}), 1: ({"utt": e1}, {"utt": ts1})}
        args = speaker_utils.parse_scale_configs([2.0, 1.0], [1.0, 0.5], [1, 1])
        out = speaker_utils.get_embs_and_timestamps(ms, args)["utt"]
        assert out["embeddings"].shape == (6, 8)
        assert out["multiscale_segment_counts"].tolist() == [2, 4]
        embs, stamps = speaker_utils.split_input_data(
            out["embeddings"], out["timestamps"], out["multiscale_segment_counts"]
        )
        np.testing.assert_array_equal(embs[0], e0)
        np.testing.assert_array_equal(stamps[1], ts1)
        argmats = speaker_utils.get_scale_mapping_argmat(out)
        assert argmats[0].tolist() == [0, 0, 1, 1]

    def test_get_timestamps(self):
        ts0, ts1 = self._scales()
        args = speaker_utils.parse_scale_configs([2.0, 1.0], [1.0, 0.5], [1, 1])
        out = speaker_utils.get_timestamps({0: {"u": ts0}, 1: {"u": ts1}}, args)
        assert set(out["u"]["scale_dict"]) == {0, 1}

    def test_overlap_stamps_and_threshold(self):
        cont = ["0.0 1.0 speaker_0", "1.0 2.0 speaker_1", "2.0 3.0 speaker_0"]
        # speaker 1 also speaks during segments 0 and 2
        out = speaker_utils.get_overlap_stamps(cont, [[], [0, 2]])
        assert out == ["0.0 1.0 speaker_1", "2.0 3.0 speaker_1"]
        thr = speaker_utils.get_adaptive_threshold(2, 0.6, 5)
        assert thr == pytest.approx(0.6)
        assert speaker_utils.get_adaptive_threshold(5, 0.6, 5) == pytest.approx(1.0)


class TestVadRttmManifest:
    def test_write_rttm2manifest_and_validate(self, tmp_path):
        su = speaker_utils
        rttm = tmp_path / "a.rttm"
        rttm.write_text(
            "SPEAKER a 1 0.5 1.0 <NA> <NA> speaker_0 <NA> <NA>\n"
            "SPEAKER a 1 1.0 1.0 <NA> <NA> speaker_1 <NA> <NA>\n"
            "SPEAKER a 1 5.0 0.5 <NA> <NA> speaker_0 <NA> <NA>\n"
        )
        amap = {
            "a": {"audio_filepath": "/x/a.wav", "rttm_filepath": str(rttm),
                  "offset": 0.0, "duration": 4.0}
        }
        out = tmp_path / "vad.json"
        su.write_rttm2manifest(amap, str(out))
        entries = [json.loads(l) for l in out.read_text().splitlines()]
        # [0.5,2.0] merged; [5.0,5.5] clipped away by duration 4.0
        assert len(entries) == 1
        assert entries[0]["offset"] == 0.5 and entries[0]["duration"] == 1.5
        assert entries[0]["label"] == "UNK"
        su.validate_vad_manifest(amap, str(out))  # no raise
        # empty manifest raises
        empty = tmp_path / "empty.json"
        empty.write_text("")
        with pytest.raises(ValueError):
            su.validate_vad_manifest(amap, str(empty))

    def test_vad_out_from_lines(self):
        su = speaker_utils
        assert su.get_vad_out_from_rttm_line(
            "SPEAKER a 1 2.5 1.25 <NA> <NA> speaker_0 <NA> <NA>"
        ) == (2.5, 1.25)
        assert su.get_vad_out_from_rttm_line("0.5 2.0 speech") == (0.5, 2.0)
