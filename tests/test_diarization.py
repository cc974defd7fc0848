"""Diarization pipeline: online segmentor semantics, speaker-embedding
encoder, and the end-to-end clustering diarizer (offline + streaming).

Reference surfaces: speaker_utils.py:1705-1840 (OnlineSegmentor),
:1141-1330 (online segment helpers); the end-to-end driver exceeds the
reference, which ships only the utilities.
"""

import json
import wave

import numpy as np
import pytest

from roar_tpu.data.speaker_utils import (
    OnlineSegmentor,
    get_new_cursor_for_update,
    get_online_subsegments_from_buffer,
    get_speech_labels_for_update,
    repeat_signal,
)

SR = 16000


# ----------------------------------------------------------------------
# Online segmentation helpers
# ----------------------------------------------------------------------

def test_repeat_signal_tiles_to_length():
    sig = np.arange(5, dtype=np.float32)
    out = repeat_signal(sig, 5, 12)
    assert out.shape == (12,)
    np.testing.assert_array_equal(out[:5], sig)
    np.testing.assert_array_equal(out[5:10], sig)
    np.testing.assert_array_equal(out[10:], sig[:2])
    assert repeat_signal(np.zeros(0, np.float32), 0, 4).shape == (4,)


def test_cursor_invalidates_overlapping_tail():
    ranges = [[0.0, 1.5], [0.75, 2.25], [1.5, 3.0], [2.25, 3.75]]
    # frame at 2.0: every tail segment whose END >= 2.0 is invalidated
    # (reference walks back while frame_start <= t_range[1],
    # speaker_utils.py:1165-1173) -> pops the last three
    cursor, idx = get_new_cursor_for_update(2.0, ranges)
    assert idx == 1
    assert cursor == 0.75  # onset of the earliest popped segment
    # frame beyond all segments: nothing invalidated
    cursor, idx = get_new_cursor_for_update(5.0, ranges)
    assert idx == 4 and cursor == 5.0
    # empty history
    cursor, idx = get_new_cursor_for_update(1.0, [])
    assert idx == 0 and cursor == 1.0


def test_speech_labels_for_update_merges_overlap_region():
    cumulative = np.array([[0.0, 2.0]])
    vad = np.array([[1.8, 4.0]])
    labels, new_cum = get_speech_labels_for_update(
        frame_start=2.0, buffer_end=4.0, cumulative_speech_labels=cumulative,
        vad_timestamps=vad, cursor_for_old_segments=1.5,
    )
    # overlap region [1.5, 2.0] of the old timeline + new VAD clipped to
    # [2.0, 4.0] merge into one contiguous interval
    np.testing.assert_allclose(labels, [[1.5, 4.0]])
    np.testing.assert_allclose(new_cum, [[0.0, 4.0]], atol=1e-6)


def test_online_subsegments_fixed_window_and_indices():
    buffer = np.random.default_rng(0).standard_normal(4 * SR).astype(np.float32)
    speech = np.array([[0.5, 3.5]])
    sigs, ranges, inds = get_online_subsegments_from_buffer(
        buffer_start=0.0, buffer_end=4.0, sample_rate=SR,
        speech_labels_for_update=speech, audio_buffer=buffer,
        segment_indexes=[], window=1.0, shift=0.5,
    )
    assert len(sigs) == len(ranges) == len(inds)
    assert inds == list(range(len(inds)))  # fresh stream starts at 0
    assert all(s.shape == (SR,) for s in sigs)  # fixed window length
    assert all(0.0 <= a < b <= 4.0 + 1e-6 for a, b in ranges)


def test_online_segmentor_stream_replaces_stale_tail():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(10 * SR).astype(np.float32) * 0.1
    seg = OnlineSegmentor(SR)
    seg_audio, seg_ranges, seg_idx = [], [], []
    frame, buf = 2.0, 6.0
    for t in np.arange(0.0, 10.0, frame):
        seg.buffer_start = max(0.0, t + frame - buf)
        seg.buffer_end = min(t + frame, 10.0)
        seg.frame_start = t
        a = int(seg.buffer_start * SR)
        b = int(seg.buffer_end * SR)
        vad = np.array([[seg.buffer_start, seg.buffer_end]])
        seg_audio, seg_ranges, seg_idx = seg.run_online_segmentation(
            audio[a:b], vad, seg_audio, seg_ranges, seg_idx,
            window=1.5, shift=0.75,
        )
        assert len(seg_audio) == len(seg_ranges) == len(seg_idx)
        # ranges are sorted and unique per index
        starts = [r[0] for r in seg_ranges]
        assert starts == sorted(starts)
    # the stream covered the whole timeline
    assert seg_ranges[0][0] <= 0.1
    assert seg_ranges[-1][1] >= 9.0
    # cumulative VAD timeline merged into one interval
    np.testing.assert_allclose(
        seg.cumulative_speech_labels, [[0.0, 10.0]], atol=1e-6
    )


# ----------------------------------------------------------------------
# Speaker-embedding encoder
# ----------------------------------------------------------------------

def _mel(audio_batch, lens):
    import jax.numpy as jnp

    from roar_tpu.ops.spectrogram import MelConfig, log_mel_spectrogram

    mel, mel_lens = log_mel_spectrogram(
        jnp.asarray(audio_batch), jnp.asarray(lens),
        MelConfig(sample_rate=SR, dither=0.0, normalize=None),
    )
    return jnp.swapaxes(mel, 1, 2), mel_lens


@pytest.mark.slow
def test_speaker_encoder_shapes_norm_and_masking():
    import jax
    import jax.numpy as jnp

    from roar_tpu.models.speaker_embedding import SpeakerEncoder

    model = SpeakerEncoder(emb_dim=64, channels=16)
    rng = np.random.default_rng(0)
    n = SR // 2
    audio = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    mel, mel_lens = _mel(audio, [n, n // 2])
    params = model.init(jax.random.PRNGKey(0), mel, mel_lens)
    emb = jax.jit(model.apply)(params, mel, mel_lens)
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4
    )
    # masking: mutating frames beyond mel_lens must not change the embedding
    t = mel.shape[1]
    mask = (jnp.arange(t)[None, :, None] >= jnp.asarray(mel_lens)[:, None, None])
    mel_mut = jnp.where(mask, 7.7, mel)
    emb2 = jax.jit(model.apply)(params, mel_mut, mel_lens)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=2e-5)


def test_spectral_embedding_separates_distinct_sources():
    from roar_tpu.models.speaker_embedding import spectral_embedding

    rng = np.random.default_rng(0)
    t = np.arange(SR) / SR
    sine = lambda f: (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    batch = np.stack([
        sine(200), sine(205),                      # "speaker A" segments
        rng.standard_normal(SR).astype(np.float32) * 0.1,
        rng.standard_normal(SR).astype(np.float32) * 0.1,  # "speaker B"
    ])
    mel, lens = _mel(batch, [SR] * 4)
    emb = np.asarray(spectral_embedding(mel, lens))
    sim = emb @ emb.T
    assert sim[0, 1] > sim[0, 2] and sim[0, 1] > sim[0, 3]
    assert sim[2, 3] > sim[2, 0] and sim[2, 3] > sim[2, 1]


# ----------------------------------------------------------------------
# End-to-end diarizer
# ----------------------------------------------------------------------

def _two_speaker_wav(path, turns, total_sec=12.0):
    """Alternating speakers: two harmonic stacks with distinct f0/timbre
    (both tonal, so the spectral-flatness VAD detects both — broadband
    noise would be rejected as non-speech by design).
    `turns` = [(start, end, 'A'|'B')]; silence elsewhere."""
    n = int(total_sec * SR)
    t = np.arange(n) / SR
    audio = np.zeros(n, np.float32)
    a_sig = 0.25 * (np.sin(2 * np.pi * 210 * t) + 0.5 * np.sin(2 * np.pi * 420 * t))
    b_sig = 0.25 * (np.sin(2 * np.pi * 540 * t) + 0.7 * np.sin(2 * np.pi * 1620 * t))
    for s, e, spk in turns:
        i, j = int(s * SR), int(e * SR)
        audio[i:j] = (a_sig if spk == "A" else b_sig)[i:j]
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return audio


TURNS = [
    (0.3, 2.8, "A"), (3.2, 5.7, "B"), (6.1, 8.6, "A"), (9.0, 11.5, "B"),
]


@pytest.fixture(scope="module")
def diar_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("diar")
    wav = root / "two_spk.wav"
    _two_speaker_wav(wav, TURNS)
    rttm = root / "two_spk.rttm"
    with open(rttm, "w") as f:
        for s, e, spk in TURNS:
            f.write(
                f"SPEAKER two_spk 1   {s:.3f}   {e - s:.3f} "
                f"<NA> <NA> {spk} <NA> <NA>\n"
            )
    manifest = root / "manifest.json"
    with open(manifest, "w") as f:
        f.write(json.dumps({
            "audio_filepath": str(wav),
            "rttm_filepath": str(rttm),
            "num_speakers": 2,
        }) + "\n")
    return root, manifest


def _config(**kw):
    from roar_tpu.models.diarization import DiarizationConfig

    base = dict(
        sample_rate=SR,
        window_lengths_in_sec=[1.0, 0.5],
        shift_lengths_in_sec=[0.5, 0.25],
        multiscale_weights=[1.0, 1.0],
        embedding="spectral",
        oracle_num_speakers=True,
        emb_batch=32,
    )
    base.update(kw)
    return DiarizationConfig(**base)


def test_offline_diarization_end_to_end(diar_corpus):
    from roar_tpu.models.diarization import ClusteringDiarizer

    root, manifest = diar_corpus
    out = root / "rttm_out"
    results = ClusteringDiarizer(_config()).diarize_manifest(
        str(manifest), str(out)
    )
    res = results["two_spk"]
    assert (out / "two_spk.rttm").exists()
    assert res["der"] < 0.25, res
    speakers = {l.split()[2] for l in res["labels"]}
    assert len(speakers) == 2


def test_streaming_diarization_end_to_end(diar_corpus):
    from roar_tpu.models.diarization import ClusteringDiarizer

    root, manifest = diar_corpus
    out = root / "rttm_stream"
    results = ClusteringDiarizer(_config()).diarize_manifest(
        str(manifest), str(out), streaming=True
    )
    res = results["two_spk"]
    assert res["der"] < 0.35, res
    assert len({l.split()[2] for l in res["labels"]}) == 2


@pytest.mark.slow
def test_learned_encoder_pipeline_smoke(diar_corpus):
    """SpeakerEncoder (untrained) path: pipeline runs, produces finite
    embeddings and a valid RTTM (clusters are arbitrary without training)."""
    from roar_tpu.models.diarization import ClusteringDiarizer

    root, manifest = diar_corpus
    out = root / "rttm_enc"
    cfg = _config(embedding="encoder", emb_dim=32)
    results = ClusteringDiarizer(cfg).diarize_manifest(str(manifest), str(out))
    res = results["two_spk"]
    assert (out / "two_spk.rttm").exists()
    assert res["labels"], "encoder pipeline produced no turns"


def test_diarize_cli(diar_corpus):
    """The example CLI end-to-end (the real user surface)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "diarize_cli",
        Path(__file__).resolve().parents[1] / "examples/speaker_tasks/diarize.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root, manifest = diar_corpus
    out = root / "rttm_cli"
    summary = mod.main([
        "--config-name=diarization",
        f"manifest_filepath={manifest}",
        f"out_dir={out}",
        "diarizer.embedding=spectral",
        "diarizer.oracle_num_speakers=true",
        "diarizer.window_lengths_in_sec=[1.0,0.5]",
        "diarizer.shift_lengths_in_sec=[0.5,0.25]",
        "diarizer.multiscale_weights=[1.0,1.0]",
    ])
    assert summary["num_utterances"] == 1
    assert summary["mean_der"] is not None and summary["mean_der"] < 0.25
    assert (out / "summary.json").exists()
