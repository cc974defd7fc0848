"""Clustering-based speaker diarization pipeline (offline + streaming).

End-to-end driver the reference only gestures at: its diarization utilities
(asr/parts/utils/speaker_utils.py, offline_clustering.py) assume an
external VAD + speaker-embedding model and ship no runnable pipeline.  Here
the full chain runs:

    audio -> VAD (statistical, or oracle RTTM) -> multiscale subsegments
          -> batched mel + speaker embeddings (one jitted program, padded
             to power-of-two buckets so segment count never recompiles)
          -> multiscale-fused affinity -> NME-SC spectral clustering
          -> RTTM (+ DER when ground truth is available)

Streaming mode replays the same audio through `OnlineSegmentor`
(data/speaker_utils.py, reference speaker_utils.py:1705-1840) with a
sliding buffer, re-clustering on each step — the reference's online
diarizer loop without its torch dependencies.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from roar_tpu.data.speaker_utils import (
    OnlineSegmentor,
    diarization_error_rate,
    generate_cluster_labels,
    get_argmin_mat,
    get_subsegments,
    labels_to_rttmfile,
    merge_float_intervals,
    parse_scale_configs,
    repeat_signal,
    rttm_to_labels,
)
from roar_tpu.ops.clustering import SpeakerClustering


@dataclasses.dataclass
class DiarizationConfig:
    sample_rate: int = 16000
    # VAD (data/audio_trimming.py spectral_flatness_vad)
    vad_threshold: float = 0.5
    vad_win_length: int = 400
    vad_hop_length: int = 160
    vad_min_speech_sec: float = 0.2
    vad_merge_gap_sec: float = 0.15
    # multiscale segmentation (descending scale order, ref speaker_utils:117)
    window_lengths_in_sec: Sequence[float] = (1.5, 1.0, 0.5)
    shift_lengths_in_sec: Sequence[float] = (0.75, 0.5, 0.25)
    multiscale_weights: Sequence[float] = (1.0, 1.0, 1.0)
    # embeddings
    embedding: str = "encoder"  # "encoder" | "spectral"
    emb_dim: int = 192
    emb_batch: int = 64
    restore_path: Optional[str] = None
    # clustering (ops/clustering.py NME-SC)
    max_num_speakers: int = 8
    max_rp_threshold: float = 0.15
    sparse_search_volume: int = 30
    oracle_num_speakers: bool = False
    # streaming
    buffer_sec: float = 8.0
    frame_sec: float = 2.0


def vad_intervals(
    audio: np.ndarray, cfg: DiarizationConfig
) -> List[List[float]]:
    """Speech [start, end] seconds via the statistical VAD
    (data/audio_trimming.py:142-157), with gap-merging and a minimum
    duration gate."""
    from roar_tpu.data.audio_trimming import _frame, spectral_flatness_vad

    frames = _frame(audio, cfg.vad_win_length, cfg.vad_hop_length)
    if frames.shape[0] == 0:
        return []
    speech = spectral_flatness_vad(frames) >= cfg.vad_threshold
    hop_sec = cfg.vad_hop_length / cfg.sample_rate
    win_sec = cfg.vad_win_length / cfg.sample_rate
    raw = []
    start = None
    for i, s in enumerate(speech):
        if s and start is None:
            start = i * hop_sec
        elif not s and start is not None:
            raw.append([start, i * hop_sec + win_sec])
            start = None
    if start is not None:
        raw.append([start, len(speech) * hop_sec + win_sec])
    if not raw:
        return []
    # merge close intervals, drop blips
    merged = merge_float_intervals(
        [[max(0.0, s - cfg.vad_merge_gap_sec / 2), e + cfg.vad_merge_gap_sec / 2]
         for s, e in raw]
    )
    dur = len(audio) / cfg.sample_rate
    return [[max(0.0, s), min(e, dur)] for s, e in merged
            if e - s >= cfg.vad_min_speech_sec]


def oracle_vad_from_rttm(rttm_path: str) -> List[List[float]]:
    """Speech intervals = union of ground-truth speaker turns."""
    spans = []
    for lab in rttm_to_labels(rttm_path):
        s, e, _ = lab.split()
        spans.append([float(s), float(e)])
    return merge_float_intervals(spans) if spans else []


class _Embedder:
    """Batched segment -> embedding on device; segment batches are padded to
    power-of-two buckets so the jitted program never recompiles on count."""

    def __init__(self, cfg: DiarizationConfig):
        import jax
        import jax.numpy as jnp

        from roar_tpu.ops.spectrogram import MelConfig, log_mel_spectrogram

        self.cfg = cfg
        # normalize=None: per-feature normalization would zero out exactly
        # the per-bin statistics a speaker signature lives in
        self.mel_cfg = MelConfig(
            sample_rate=cfg.sample_rate, dither=0.0, normalize=None
        )
        self._jax, self._jnp = jax, jnp

        if cfg.embedding == "spectral":
            from roar_tpu.models.speaker_embedding import spectral_embedding

            def embed(audio, lens):
                mel, mel_lens = log_mel_spectrogram(audio, lens, self.mel_cfg)
                return spectral_embedding(jnp.swapaxes(mel, 1, 2), mel_lens)

            self._embed = jax.jit(embed)
            self.params = None
        else:
            from roar_tpu.models.speaker_embedding import SpeakerEncoder

            self.model = SpeakerEncoder(emb_dim=cfg.emb_dim)
            if cfg.restore_path:
                from roar_tpu.training.save_restore import restore_from

                _, self.params = restore_from(cfg.restore_path)
            else:
                probe = jnp.zeros((1, int(1.5 * cfg.sample_rate)), jnp.float32)
                mel, _ = log_mel_spectrogram(
                    probe, jnp.array([probe.shape[1]]), self.mel_cfg
                )
                self.params = jax.jit(self.model.init)(
                    jax.random.PRNGKey(0), jnp.swapaxes(mel, 1, 2)
                )

            def embed(params, audio, lens):
                mel, mel_lens = log_mel_spectrogram(audio, lens, self.mel_cfg)
                return self.model.apply(params, jnp.swapaxes(mel, 1, 2), mel_lens)

            self._embed = jax.jit(embed)

    def __call__(self, segments: np.ndarray) -> np.ndarray:
        """segments: [N, S] fixed-window signals -> [N, D] embeddings."""
        jnp = self._jnp
        n, s = segments.shape
        out = []
        bs = self.cfg.emb_batch
        for i in range(0, n, bs):
            chunk = segments[i : i + bs]
            pad = int(2 ** np.ceil(np.log2(max(len(chunk), 1)))) - len(chunk)
            pad = min(pad, bs - len(chunk))
            batch = np.pad(chunk, ((0, pad), (0, 0)))
            lens = jnp.full((batch.shape[0],), s, jnp.int32)
            if self.params is None:
                emb = self._embed(jnp.asarray(batch), lens)
            else:
                emb = self._embed(self.params, jnp.asarray(batch), lens)
            out.append(np.asarray(emb[: len(chunk)]))
        return np.concatenate(out, axis=0) if out else np.zeros((0, 1), np.float32)


def _cut_segments(
    audio: np.ndarray, speech: List[List[float]], window: float, shift: float,
    sample_rate: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Subsegment speech intervals and slice fixed-window signals
    (short tails repeat-padded).  Returns (signals [N, W*sr], stamps [N, 2])."""
    slice_len = int(window * sample_rate)
    sigs, stamps = [], []
    for s, e in speech:
        for st, dur in get_subsegments(s, window, shift, e - s):
            if dur <= 0.01:
                continue
            a = int(st * sample_rate)
            b = min(int((st + dur) * sample_rate), len(audio))
            seg = audio[a:b]
            if seg.size == 0:
                continue
            if seg.size < slice_len:
                seg = repeat_signal(seg, seg.size, slice_len)
            sigs.append(seg[:slice_len])
            stamps.append([st, st + dur])
    if not sigs:
        return np.zeros((0, slice_len), np.float32), np.zeros((0, 2), np.float64)
    return (np.stack(sigs).astype(np.float32),
            np.asarray(stamps, np.float64))


def _fuse_multiscale(
    embs_per_scale: List[np.ndarray],
    stamps_per_scale: List[np.ndarray],
    weights: Sequence[float],
) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted average of each base-scale segment's nearest embedding per
    scale (offline_clustering.py:395-424 argmin mapping semantics).
    Returns (fused embeddings [Nb, D], base stamps [Nb, 2])."""
    argmins = get_argmin_mat([np.asarray(t) for t in stamps_per_scale])
    w = np.asarray(weights, np.float64)
    w = w / max(w.sum(), 1e-8)
    fused = sum(
        w[i] * np.asarray(embs_per_scale[i])[argmins[i]]
        for i in range(len(embs_per_scale))
    )
    norms = np.linalg.norm(fused, axis=-1, keepdims=True)
    return fused / np.maximum(norms, 1e-8), np.asarray(stamps_per_scale[-1])


class ClusteringDiarizer:
    """Offline multiscale clustering diarizer; `diarize` runs one utterance,
    `diarize_manifest` a whole manifest with RTTM outputs + DER."""

    def __init__(self, cfg: DiarizationConfig):
        self.cfg = cfg
        # validates scale ordering/lengths (ref speaker_utils.py:117-200)
        self.scale_args = parse_scale_configs(
            list(cfg.window_lengths_in_sec),
            list(cfg.shift_lengths_in_sec),
            list(cfg.multiscale_weights),
        )
        self.embedder = _Embedder(cfg)
        self.clustering = SpeakerClustering(
            max_num_speakers=cfg.max_num_speakers,
            max_rp_threshold=cfg.max_rp_threshold,
            sparse_search_volume=cfg.sparse_search_volume,
        )

    # ------------------------------------------------------------------
    def diarize(
        self,
        audio: np.ndarray,
        speech: Optional[List[List[float]]] = None,
        num_speakers: Optional[int] = None,
    ) -> List[str]:
        """-> labels ['<start> <end> speaker_<k>', ...] (merged turns)."""
        cfg = self.cfg
        if speech is None:
            speech = vad_intervals(audio, cfg)
        if not speech:
            return []
        embs_per_scale, stamps_per_scale = [], []
        for w, s in zip(cfg.window_lengths_in_sec, cfg.shift_lengths_in_sec):
            sigs, stamps = _cut_segments(audio, speech, w, s, cfg.sample_rate)
            if len(sigs) == 0:
                return []
            embs_per_scale.append(self.embedder(sigs))
            stamps_per_scale.append(stamps)
        fused, base_stamps = _fuse_multiscale(
            embs_per_scale, stamps_per_scale, cfg.multiscale_weights
        )
        labels_idx = self.clustering.forward_infer(
            fused, oracle_num_speakers=num_speakers
        )
        ranges = [f"{s:.3f} {e:.3f}" for s, e in base_stamps]
        merged, _ = generate_cluster_labels(ranges, np.asarray(labels_idx))
        return merged

    # ------------------------------------------------------------------
    def diarize_streaming(
        self,
        audio: np.ndarray,
        num_speakers: Optional[int] = None,
    ) -> List[str]:
        """Replay `audio` through OnlineSegmentor with a sliding buffer,
        embedding only the segments each step adds, re-clustering on the
        running embedding set (the reference's online diarizer loop,
        speaker_utils.py:1705-1840)."""
        cfg = self.cfg
        seg = OnlineSegmentor(cfg.sample_rate)
        window = cfg.window_lengths_in_sec[-1]
        shift = cfg.shift_lengths_in_sec[-1]
        seg_audio: List[np.ndarray] = []
        seg_ranges: List[List[float]] = []
        seg_idx: List[int] = []
        embs: Dict[int, np.ndarray] = {}

        total = len(audio) / cfg.sample_rate
        frame = cfg.frame_sec
        buf = cfg.buffer_sec
        labels: List[str] = []
        t = 0.0
        while t < total:
            seg.buffer_start = max(0.0, t + frame - buf)
            seg.buffer_end = min(t + frame, total)
            seg.frame_start = t
            a = int(seg.buffer_start * cfg.sample_rate)
            b = int(seg.buffer_end * cfg.sample_rate)
            chunk = audio[a:b]
            vad = vad_intervals(chunk, cfg)
            vad_abs = np.asarray(
                [[s + seg.buffer_start, e + seg.buffer_start] for s, e in vad],
                np.float64,
            ).reshape(-1, 2)
            seg_audio, seg_ranges, seg_idx = seg.run_online_segmentation(
                chunk, vad_abs, seg_audio, seg_ranges, seg_idx, window, shift
            )
            new = [i for i, gidx in enumerate(seg_idx) if gidx not in embs]
            if new:
                sigs = np.stack([seg_audio[i] for i in new]).astype(np.float32)
                for i, e in zip(new, self.embedder(sigs)):
                    embs[seg_idx[i]] = e
            t += frame
        if not seg_idx:
            return []
        emb_mat = np.stack([embs[g] for g in seg_idx])
        labels_idx = self.clustering.forward_infer(
            emb_mat, oracle_num_speakers=num_speakers
        )
        ranges = [f"{s:.3f} {e:.3f}" for s, e in seg_ranges]
        merged, _ = generate_cluster_labels(ranges, np.asarray(labels_idx))
        return merged

    # ------------------------------------------------------------------
    def diarize_manifest(
        self, manifest_path: str, out_dir: str, streaming: bool = False
    ) -> Dict[str, Dict]:
        """Each manifest line: {audio_filepath, [rttm_filepath],
        [num_speakers], [offset], [duration]}.  Writes <uniq_id>.rttm into
        out_dir; returns {uniq_id: {rttm, labels, [der]}}."""
        from roar_tpu.data.audio import AudioSegment
        from roar_tpu.data.manifest import read_manifest
        from roar_tpu.data.speaker_utils import get_uniqname_from_filepath

        cfg = self.cfg
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        results: Dict[str, Dict] = {}
        for entry in read_manifest(manifest_path):
            uniq_id = entry.get("uniq_id") or get_uniqname_from_filepath(
                entry["audio_filepath"]
            )
            audio = AudioSegment.from_file(
                entry["audio_filepath"],
                target_sr=cfg.sample_rate,
                offset=entry.get("offset", 0) or 0,
                duration=entry.get("duration"),
            ).samples
            n_spk = entry.get("num_speakers") if cfg.oracle_num_speakers else None
            if streaming:
                labels = self.diarize_streaming(audio, num_speakers=n_spk)
            else:
                speech = None
                if entry.get("oracle_vad") and entry.get("rttm_filepath"):
                    speech = oracle_vad_from_rttm(entry["rttm_filepath"])
                labels = self.diarize(audio, speech=speech, num_speakers=n_spk)
            rttm = labels_to_rttmfile(labels, uniq_id, out_dir)
            res = {"rttm": rttm, "labels": labels}
            if entry.get("rttm_filepath"):
                ref_labels = rttm_to_labels(entry["rttm_filepath"])
                res["der"] = diarization_error_rate(ref_labels, labels)
            results[uniq_id] = res
        return results
