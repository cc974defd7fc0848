"""Speaker-diarization bookkeeping: RTTM IO, segment math, cluster labels.

Lean re-design of roar/collections/asr/parts/utils/speaker_utils.py
(the offline subset used by clustering-based diarization: uniq-id helpers
:30-70, audio_rttm_map :72, RTTM read/write :340-404, stamp merging
:287-325, interval algebra :676-870, subsegmentation :925-1012, cluster
labels :423-452, embedding_normalize :1687) plus the streaming subset:
`OnlineSegmentor` (:723 below, redesign of the reference's online
segmentor) feeding the streaming diarization driver in
examples/speaker_tasks/diarize.py.  The pyannote visualization hook is
out of scope; a native DER scorer (`diarization_error_rate`) replaces
the pyannote dependency.
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ----------------------------------------------------------------------
# IDs and manifests
# ----------------------------------------------------------------------

def get_uniqname_from_filepath(filepath: str) -> str:
    """Base filename without extension (speaker_utils.py:30-38)."""
    if not isinstance(filepath, str):
        raise TypeError("Expected str, got " + type(filepath).__name__)
    return os.path.splitext(os.path.basename(filepath))[0]


def get_uniq_id_with_dur(meta: Dict, decimals: int = 3) -> str:
    """`<name>_<offset>_<end>` id (speaker_utils.py:50-69)."""
    bare = get_uniqname_from_filepath(meta["audio_filepath"])
    offset = round(float(meta.get("offset") or 0.0), decimals)
    end = round(offset + float(meta["duration"]), decimals)
    return f"{bare}_{offset}_{end}"


def audio_rttm_map(manifest: str, attach_dur: bool = False) -> Dict[str, Dict]:
    """Manifest (audio_filepath/rttm_filepath/...) -> uniq-id keyed dict
    (speaker_utils.py:72-115)."""
    out: Dict[str, Dict] = {}
    with open(manifest) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            dic = json.loads(line)
            meta = {
                "audio_filepath": dic["audio_filepath"],
                "rttm_filepath": dic.get("rttm_filepath"),
                "offset": dic.get("offset"),
                "duration": dic.get("duration"),
                "text": dic.get("text"),
                "label": dic.get("label", "infer"),
                "uem_filepath": dic.get("uem_filepath"),
                "ctm_filepath": dic.get("ctm_filepath"),
            }
            if attach_dur:
                uniq = get_uniq_id_with_dur(meta)
            else:
                uniq = get_uniqname_from_filepath(dic["audio_filepath"])
            if uniq in out:
                raise KeyError(f"Duplicate uniq id {uniq} in manifest {manifest}")
            out[uniq] = meta
    return out


# ----------------------------------------------------------------------
# RTTM
# ----------------------------------------------------------------------

def convert_rttm_line(rttm_line: str, round_digits: int = 3) -> Tuple[float, float, str]:
    """One RTTM SPEAKER line -> (start, end, speaker)
    (speaker_utils.py:366-391), with the reference's validity checks."""
    parts = rttm_line.strip().split()
    start = round(float(parts[3]), round_digits)
    dur = round(float(parts[4]), round_digits)
    speaker = parts[7]
    if dur < 0 or start < 0:
        raise ValueError(f"Invalid RTTM timing in line: {rttm_line!r}")
    return start, start + dur, speaker


def rttm_to_labels(rttm_filename: str) -> List[str]:
    """RTTM file -> ['<start> <end> <speaker>', ...] (speaker_utils.py:393-403)."""
    labels = []
    with open(rttm_filename) as f:
        for line in f:
            if not line.strip():
                continue
            start, end, speaker = convert_rttm_line(line)
            labels.append(f"{start} {end} {speaker}")
    return labels


def labels_to_rttmfile(labels: Sequence[str], uniq_id: str, out_rttm_dir: str) -> str:
    """['<start> <end> <speaker>'] -> RTTM file (speaker_utils.py:340-357)."""
    filename = os.path.join(out_rttm_dir, uniq_id + ".rttm")
    with open(filename, "w") as f:
        for line in labels:
            start, end, speaker = line.strip().split()
            f.write(
                "SPEAKER {} 1   {:.3f}   {:.3f} <NA> <NA> {} <NA> <NA>\n".format(
                    uniq_id, float(start), float(end) - float(start), speaker
                )
            )
    return filename


# ----------------------------------------------------------------------
# Stamp merging / interval algebra
# ----------------------------------------------------------------------

def get_contiguous_stamps(stamps: Sequence[str]) -> List[str]:
    """Resolve overlaps by splitting at the midpoint (speaker_utils.py:287-305)."""
    lines = list(stamps)
    out = []
    for i in range(len(lines) - 1):
        start, end, speaker = lines[i].split()
        next_start, next_end, next_speaker = lines[i + 1].split()
        if float(end) > float(next_start):
            avg = str((float(next_start) + float(end)) / 2.0)
            lines[i + 1] = " ".join([avg, next_end, next_speaker])
            out.append(f"{start} {avg} {speaker}")
        else:
            out.append(f"{start} {end} {speaker}")
    start, end, speaker = lines[-1].split()
    out.append(f"{start} {end} {speaker}")
    return out


def merge_stamps(lines: Sequence[str]) -> List[str]:
    """Merge adjacent same-speaker stamps (speaker_utils.py:307-325)."""
    stamps = list(lines)
    out = []
    for i in range(len(stamps) - 1):
        start, end, speaker = stamps[i].split()
        next_start, next_end, next_speaker = stamps[i + 1].split()
        if float(end) == float(next_start) and speaker == next_speaker:
            stamps[i + 1] = " ".join([start, next_end, next_speaker])
        else:
            out.append(f"{start} {end} {speaker}")
    start, end, speaker = stamps[-1].split()
    out.append(f"{start} {end} {speaker}")
    return out


def is_overlap(range_a: Sequence[float], range_b: Sequence[float]) -> bool:
    """Half-open overlap check (speaker_utils.py:676-693)."""
    return range_a[1] > range_b[0] and range_a[0] < range_b[1]


def get_overlap_range(range_a, range_b) -> List[float]:
    """Intersection of two overlapping ranges (speaker_utils.py:694-713)."""
    if not is_overlap(range_a, range_b):
        raise ValueError(f"ranges {range_a} and {range_b} do not overlap")
    return [max(range_a[0], range_b[0]), min(range_a[1], range_b[1])]


def fl2int(x: float, decimals: int = 3) -> int:
    return int(round(x * 10**decimals))


def int2fl(x: int, decimals: int = 3) -> float:
    return round(x / 10**decimals, decimals)


def merge_int_intervals(intervals: Sequence[Sequence[int]]) -> List[List[int]]:
    """Union of integer intervals (speaker_utils.py:714-771)."""
    if not intervals:
        return []
    ivs = sorted((list(i) for i in intervals), key=lambda x: x[0])
    out = [ivs[0]]
    for s, e in ivs[1:]:
        if s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def merge_float_intervals(
    ranges: Sequence[Sequence[float]], decimals: int = 5
) -> List[List[float]]:
    """Union of float intervals via fixed-point ints (speaker_utils.py:787-833)."""
    ints = [[fl2int(s, decimals), fl2int(e, decimals)] for s, e in ranges]
    return [[int2fl(s, decimals), int2fl(e, decimals)] for s, e in merge_int_intervals(ints)]


def get_sub_range_list(
    target_range: Sequence[float], source_range_list: Sequence[Sequence[float]]
) -> List[List[float]]:
    """Clip source ranges to the target range (speaker_utils.py:835-870)."""
    out = []
    for r in source_range_list:
        if is_overlap(r, target_range):
            out.append(get_overlap_range(r, target_range))
    return sorted(out, key=lambda x: x[0])


# ----------------------------------------------------------------------
# Subsegmentation
# ----------------------------------------------------------------------

def get_subsegments(
    offset: float, window: float, shift: float, duration: float
) -> List[List[float]]:
    """[start, dur] windows over a segment (speaker_utils.py:986-1012)."""
    subsegments: List[List[float]] = []
    start = offset
    slice_end = start + duration
    base = math.ceil((duration - window) / shift)
    slices = 1 if base < 0 else base + 1
    for slice_id in range(slices):
        end = min(start + window, slice_end)
        subsegments.append([start, end - start])
        start = offset + (slice_id + 1) * shift
    return subsegments


def segments_manifest_to_subsegments_manifest(
    segments_manifest_file: str,
    subsegments_manifest_file: Optional[str] = None,
    window: float = 1.5,
    shift: float = 0.75,
    min_subsegment_duration: float = 0.05,
) -> str:
    """Split VAD segments into diarization subsegments
    (speaker_utils.py:925-984)."""
    if subsegments_manifest_file is None:
        pwd = os.getcwd()
        subsegments_manifest_file = os.path.join(pwd, "subsegments.json")
    with open(segments_manifest_file) as segs, open(
        subsegments_manifest_file, "w"
    ) as out:
        for line in segs:
            if not line.strip():
                continue
            dic = json.loads(line)
            subs = get_subsegments(
                dic.get("offset", 0.0), window, shift, dic["duration"]
            )
            for start, dur in subs:
                if dur < min_subsegment_duration:
                    continue
                meta = {
                    "audio_filepath": dic["audio_filepath"],
                    "offset": start,
                    "duration": dur,
                    "label": dic.get("label", "UNK"),
                    "uniq_id": dic.get("uniq_id"),
                }
                out.write(json.dumps(meta) + "\n")
    return subsegments_manifest_file


# ----------------------------------------------------------------------
# Cluster labels -> diarization hypothesis
# ----------------------------------------------------------------------

def generate_cluster_labels(
    segment_ranges: Sequence[str], cluster_labels: Sequence[int]
) -> Tuple[List[str], List[str]]:
    """(merged speaker-turn labels, raw per-segment lines)
    (speaker_utils.py:423-452)."""
    lines = []
    for rng, label in zip(segment_ranges, cluster_labels):
        lines.append(f"{rng} speaker_{int(label)}")
    cont = get_contiguous_stamps(lines)
    return merge_stamps(cont), lines


def embedding_normalize(embs: np.ndarray, use_std: bool = False, eps: float = 1e-10):
    """Mean (optionally std) normalize then unit-scale embeddings
    (speaker_utils.py:1687-1704)."""
    embs = embs - embs.mean(axis=0)
    if use_std:
        embs = embs / (embs.std(axis=0) + eps)
    embs_l2_norm = np.maximum(np.linalg.norm(embs, ord=2, axis=-1), eps)[:, None]
    return embs / embs_l2_norm


# ----------------------------------------------------------------------
# Scoring (replaces the reference's pyannote dependency)
# ----------------------------------------------------------------------

def _labels_to_frames(labels: Sequence[str], resolution: float = 0.01):
    """Rasterize '<start> <end> <spk>' labels onto a frame grid."""
    if not labels:
        return np.zeros((0,), np.int64), {}
    end_max = max(float(l.split()[1]) for l in labels)
    n = int(math.ceil(end_max / resolution))
    spk_ids: Dict[str, int] = {}
    frames = np.full((n,), -1, np.int64)
    for l in labels:
        s, e, spk = l.split()
        spk_ids.setdefault(spk, len(spk_ids))
        frames[int(float(s) / resolution) : int(float(e) / resolution)] = spk_ids[spk]
    return frames, spk_ids


def diarization_error_rate(
    ref_labels: Sequence[str], hyp_labels: Sequence[str], resolution: float = 0.01
) -> float:
    """Frame-based DER with optimal speaker mapping (Hungarian over the
    confusion matrix).  Single-speaker-per-frame simplification — adequate
    for the non-overlap hypotheses generate_cluster_labels produces."""
    ref, _ = _labels_to_frames(ref_labels, resolution)
    hyp, _ = _labels_to_frames(hyp_labels, resolution)
    n = max(len(ref), len(hyp))
    ref = np.pad(ref, (0, n - len(ref)), constant_values=-1)
    hyp = np.pad(hyp, (0, n - len(hyp)), constant_values=-1)

    n_ref = int(ref.max()) + 1
    n_hyp = int(hyp.max()) + 1
    speech = ref >= 0
    if not speech.any():
        return 0.0
    conf = np.zeros((max(n_ref, 1), max(n_hyp, 1)), np.int64)
    both = speech & (hyp >= 0)
    np.add.at(conf, (ref[both], hyp[both]), 1)
    try:
        from scipy.optimize import linear_sum_assignment

        ri, hi = linear_sum_assignment(-conf)
        matched = conf[ri, hi].sum()
    except ImportError:  # greedy fallback
        matched = 0
        c = conf.copy()
        for _ in range(min(c.shape)):
            i, j = np.unravel_index(np.argmax(c), c.shape)
            matched += c[i, j]
            c[i, :] = -1
            c[:, j] = -1
    miss = int((speech & (hyp < 0)).sum())
    fa = int((~speech & (hyp >= 0)).sum())
    confusion = int(both.sum()) - int(matched)
    return float(miss + fa + confusion) / float(speech.sum())


# ----------------------------------------------------------------------
# Multiscale machinery (speaker_utils.py:117-285, offline_clustering.py
# get_argmin_mat :395 / split_input_data :709) — numpy re-design
# ----------------------------------------------------------------------

def parse_scale_configs(window_lengths_in_sec, shift_lengths_in_sec,
                        multiscale_weights) -> Optional[Dict]:
    """Validate multiscale diarizer parameters (speaker_utils.py:117-200):
    scalars mean single-scale; lists must be equal-length, in descending
    scale order, with window > shift per scale."""
    floats = all(isinstance(v, float) for v in
                 (window_lengths_in_sec, shift_lengths_in_sec))
    lists = [isinstance(v, (list, tuple)) for v in
             (window_lengths_in_sec, shift_lengths_in_sec, multiscale_weights)]
    if floats:
        windows, shifts, weights = ([window_lengths_in_sec],
                                    [shift_lengths_in_sec], [1.0])
    elif all(lists):
        windows, shifts, weights = (list(window_lengths_in_sec),
                                    list(shift_lengths_in_sec),
                                    list(multiscale_weights))
    elif any(lists):
        raise ValueError(
            "Provide list configs for all three of window, shift and "
            "multiscale weights (or scalars for window and shift)"
        )
    else:
        return None
    ok_len = len({len(windows), len(shifts), len(weights)}) == 1 and weights
    ok_order = windows == sorted(windows)[::-1] and shifts == sorted(shifts)[::-1]
    ok_ws = all(w > s for w, s in zip(windows, shifts))
    if not (ok_len and ok_order and ok_ws):
        raise ValueError("Multiscale parameters are not properly setup.")
    return {
        "use_single_scale_clustering": False,
        "scale_dict": {i: (w, s) for i, (w, s) in enumerate(zip(windows, shifts))},
        "multiscale_weights": weights,
    }


def split_input_data(embeddings_in_scales: np.ndarray,
                     timestamps_in_scales: np.ndarray,
                     multiscale_segment_counts: Sequence[int]):
    """Split scale-concatenated embeddings/timestamps back into per-scale
    lists (offline_clustering.py:709-744)."""
    counts = list(map(int, multiscale_segment_counts))
    splits = np.cumsum(counts)[:-1]
    return (np.split(np.asarray(embeddings_in_scales), splits),
            np.split(np.asarray(timestamps_in_scales), splits))


def get_argmin_mat(timestamps_in_scales: List[np.ndarray]) -> List[np.ndarray]:
    """For each scale, map every BASE-scale (last, shortest) segment to the
    nearest segment of that scale by anchor (midpoint) distance
    (offline_clustering.py:395-424)."""
    anchors = [np.mean(np.asarray(ts, np.float64), axis=1)
               for ts in timestamps_in_scales]
    base = anchors[-1]
    return [np.argmin(np.abs(a[None, :] - base[:, None]), axis=1)
            for a in anchors]


def get_embs_and_timestamps(multiscale_embeddings_and_timestamps: Dict,
                            multiscale_args_dict: Dict) -> Dict:
    """Rearrange per-scale {scale: (embeddings_by_id, timestamps_by_id)}
    into per-utterance concatenated arrays + bookkeeping
    (speaker_utils.py:203-257)."""
    args = multiscale_args_dict
    if args.get("use_single_scale_clustering"):
        args = dict(args)
        args["scale_dict"] = {0: multiscale_args_dict["scale_dict"][0]}
        args["multiscale_weights"] = multiscale_args_dict["multiscale_weights"][:1]
    first_embs, _ = multiscale_embeddings_and_timestamps[0]
    out = {}
    for uniq_id in first_embs:
        embs, stamps, counts = [], [], []
        for scale_idx in sorted(args["scale_dict"]):
            e, t = multiscale_embeddings_and_timestamps[scale_idx]
            if len(e[uniq_id]) != len(t[uniq_id]):
                raise ValueError(
                    "Mismatch of counts between embedding vectors and timestamps"
                )
            embs.append(np.asarray(e[uniq_id]))
            stamps.append(np.asarray(t[uniq_id], np.float64))
            counts.append(len(e[uniq_id]))
        out[uniq_id] = {
            "multiscale_weights": np.asarray(args["multiscale_weights"],
                                             np.float32)[None, :],
            "embeddings": np.concatenate(embs, axis=0),
            "timestamps": np.concatenate(stamps, axis=0),
            "multiscale_segment_counts": np.asarray(counts, np.int64),
        }
    return out


def get_timestamps(multiscale_timestamps: Dict, multiscale_args_dict: Dict) -> Dict:
    """Rearrange per-scale timestamps by unique id (speaker_utils.py:259-285)."""
    out = {uniq_id: {"scale_dict": {}} for uniq_id in multiscale_timestamps[0]}
    for scale_idx in sorted(multiscale_args_dict["scale_dict"]):
        for uniq_id, ts in multiscale_timestamps[scale_idx].items():
            out[uniq_id]["scale_dict"][scale_idx] = {"time_stamps": ts}
    return out


def get_scale_mapping_argmat(uniq_embs_and_timestamps: Dict) -> Dict[int, np.ndarray]:
    """Per-scale argmin mapping matrices for one utterance
    (speaker_utils.py:1331-1360)."""
    _, ts = split_input_data(
        uniq_embs_and_timestamps["embeddings"],
        uniq_embs_and_timestamps["timestamps"],
        uniq_embs_and_timestamps["multiscale_segment_counts"],
    )
    return dict(enumerate(get_argmin_mat(ts)))


# ----------------------------------------------------------------------
# Overlap-aware stamps (speaker_utils.py:1361-1446)
# ----------------------------------------------------------------------

def get_overlap_stamps(cont_stamps: List[str],
                       ovl_spk_idx: List[List[int]]) -> List[str]:
    """Assign overlap speech to existing segments: for speaker s, every
    segment index in ovl_spk_idx[s] also gets a `speaker_s` stamp; merged
    per speaker (speaker_utils.py:1361-1389)."""
    per_spk: List[List[str]] = [[] for _ in ovl_spk_idx]
    for spk, idxs in enumerate(ovl_spk_idx):
        wanted = set(idxs)
        for idx, line in enumerate(cont_stamps):
            if idx in wanted:
                start, end, _ = line.split()
                per_spk[spk].append(f"{start} {end} speaker_{spk}")
    out: List[str] = []
    for lines in per_spk:
        if lines:
            out.extend(merge_stamps(lines))
    return out


def get_adaptive_threshold(estimated_num_of_spks: int, min_threshold: float,
                           overlap_infer_spk_limit: int) -> float:
    """Scale the overlap-detection sigmoid threshold with speaker count
    (speaker_utils.py:1392-1416)."""
    return min_threshold - (estimated_num_of_spks - 2) * (min_threshold - 1) / (
        overlap_infer_spk_limit - 2
    )


# ----------------------------------------------------------------------
# VAD/RTTM -> manifest plumbing (speaker_utils.py:553-675,872-924)
# ----------------------------------------------------------------------

def get_vad_out_from_rttm_line(rttm_line: str) -> Tuple[float, float]:
    """(start, duration) from an RTTM line or a bare `start dur label` VAD
    table line (speaker_utils.py:553-563)."""
    parts = rttm_line.strip().split()
    if len(parts) > 3:
        return float(parts[3]), float(parts[4])
    return float(parts[0]), float(parts[1])


def read_rttm_lines(rttm_file_path: str) -> List[str]:
    if rttm_file_path and os.path.exists(rttm_file_path):
        with open(rttm_file_path) as f:
            return f.readlines()
    raise FileNotFoundError(f"RTTM file not found: {rttm_file_path!r}")


def get_offset_and_duration(audio_rttm_map: Dict, uniq_id: str,
                            decimals: int = 5) -> Tuple[float, float]:
    """Offset/duration from the map, falling back to the audio header
    (speaker_utils.py:565-590)."""
    meta = audio_rttm_map[uniq_id]
    if meta.get("duration"):
        return (round(float(meta.get("offset") or 0.0), decimals),
                round(float(meta["duration"]), decimals))
    from roar_tpu.data.audio import AudioSegment

    samples = AudioSegment.from_file(meta["audio_filepath"]).samples
    sr = AudioSegment.from_file(meta["audio_filepath"]).sample_rate
    return 0.0, len(samples) / sr


def write_rttm2manifest(audio_rttm_map: Dict, manifest_file: str,
                        decimals: int = 5) -> str:
    """Oracle-VAD manifest from RTTM files: merged speech intervals,
    clipped to [offset, offset+duration], one UNK-label entry per segment
    (speaker_utils.py:872-924)."""
    with open(manifest_file, "w", encoding="utf-8") as out:
        for uniq_id, meta in audio_rttm_map.items():
            lines = read_rttm_lines(meta["rttm_filepath"])
            offset, duration = get_offset_and_duration(audio_rttm_map, uniq_id,
                                                       decimals)
            raw = []
            for line in lines:
                start, dur = get_vad_out_from_rttm_line(line)
                raw.append([start, start + dur])
            merged = merge_float_intervals(raw)
            clipped = get_sub_range_list([offset, offset + duration], merged)
            for stt, end in clipped:
                json.dump(
                    {
                        "audio_filepath": meta["audio_filepath"],
                        "offset": round(stt, decimals),
                        "duration": round(end - stt, decimals),
                        "label": "UNK",
                        "uniq_id": uniq_id,
                    },
                    out,
                )
                out.write("\n")
    return manifest_file


def validate_vad_manifest(audio_rttm_map: Dict, vad_manifest: str) -> None:
    """Every utterance in the map must have at least one speech segment in
    the VAD manifest (speaker_utils.py:647-675)."""
    covered = set()
    with open(vad_manifest, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                entry = json.loads(line)
                covered.add(entry.get("uniq_id")
                            or get_uniqname_from_filepath(entry["audio_filepath"]))
    missing = set(audio_rttm_map) - covered
    if missing == set(audio_rttm_map):
        raise ValueError("The vad manifest file is empty. Check the VAD output.")
    for uniq_id in sorted(missing):
        import warnings

        warnings.warn(f"{uniq_id} has no speech segments in the VAD manifest")


# ----------------------------------------------------------------------
# Streaming (online) segmentation
#
# Host-side bookkeeping for the streaming diarizer: an audio ring buffer
# arrives chunk by chunk; the segmentor keeps a cumulative VAD timeline and
# re-cuts embedding-extraction subsegments only for the region the new
# frame invalidates.  numpy re-design of the reference's OnlineSegmentor
# (speaker_utils.py:1705-1840) and its helpers (:1013-1330) — the device
# never sees this logic; it only gets the fixed-size segment batches.
# ----------------------------------------------------------------------

def repeat_signal(sig: np.ndarray, sig_len: int, required_len: int) -> np.ndarray:
    """Tile a short segment up to `required_len` samples
    (reference asr/parts/preprocessing/segment repeat-padding semantics)."""
    if sig_len <= 0:
        return np.zeros((required_len,), dtype=sig.dtype)
    reps = int(math.ceil(required_len / sig_len))
    return np.tile(sig[:sig_len], reps)[:required_len]


def get_target_sig(
    sig: np.ndarray, start_sec: float, end_sec: float, slice_length: int,
    sample_rate: int,
) -> np.ndarray:
    """Slice [start_sec, end_sec) out of a buffer, capped at slice_length
    samples (speaker_utils.py:1013-1040)."""
    start_idx = int(start_sec * sample_rate)
    end_idx = min(int(end_sec * sample_rate), slice_length + start_idx)
    return sig[start_idx:end_idx]


def get_new_cursor_for_update(
    frame_start: float, segment_range_ts: List[List[float]]
) -> Tuple[float, int]:
    """Walk back over tail segments that overlap the new frame; returns
    (cursor_time, first_invalidated_index) (speaker_utils.py:1141-1176)."""
    cursor_for_old_segments = frame_start
    count = 0
    while len(segment_range_ts) > count:
        t_range = segment_range_ts[-(count + 1)]
        if frame_start > t_range[1]:
            break
        count += 1
        cursor_for_old_segments = t_range[0]
    return cursor_for_old_segments, len(segment_range_ts) - count


def get_speech_labels_for_update(
    frame_start: float,
    buffer_end: float,
    cumulative_speech_labels: np.ndarray,
    vad_timestamps: np.ndarray,
    cursor_for_old_segments: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge the overlap region of the previous timeline with the new VAD
    output; returns (labels to re-segment, updated cumulative timeline)
    (speaker_utils.py:1071-1139)."""
    update_overlap_range: List[float] = []
    if cursor_for_old_segments < frame_start:
        update_overlap_range = [float(cursor_for_old_segments), float(frame_start)]

    vad_list = [[float(s), float(e)] for s, e in np.atleast_2d(vad_timestamps)
                if e > s]
    cum_list = [[float(s), float(e)] for s, e in np.atleast_2d(
        cumulative_speech_labels.reshape(-1, 2))]

    new_incoming = get_sub_range_list([float(frame_start), float(buffer_end)],
                                      vad_list)
    overlap_speech = (
        get_sub_range_list(update_overlap_range, cum_list)
        if update_overlap_range else []
    )
    labels_for_update = merge_float_intervals(overlap_speech + new_incoming) \
        if (overlap_speech + new_incoming) else []
    cumulative = merge_float_intervals(cum_list + new_incoming) \
        if (cum_list + new_incoming) else []
    return (np.asarray(labels_for_update, dtype=np.float64).reshape(-1, 2),
            np.asarray(cumulative, dtype=np.float64).reshape(-1, 2))


def get_online_segments_from_slices(
    sig: np.ndarray,
    buffer_start: float,
    buffer_end: float,
    subsegments: List[List[float]],
    ind_offset: int,
    window: float,
    sample_rate: int,
) -> Tuple[int, List[np.ndarray], List[List[float]], List[int]]:
    """Cut fixed-length segment signals from buffer-relative subsegments;
    short tails are repeat-padded to the window length
    (speaker_utils.py:1179-1249)."""
    sigs_list, sig_range_list, sig_indexes = [], [], []
    slice_length = int(window * sample_rate)
    buffer_len = buffer_end - buffer_start
    for start_sec, dur in subsegments:
        if start_sec > buffer_end:
            continue
        ind_offset += 1
        end_sec = min(float(start_sec + dur), buffer_len)
        signal = get_target_sig(sig, start_sec, end_sec, slice_length, sample_rate)
        if signal.size == 0:
            raise ValueError("zero-length online segment; check VAD output")
        if signal.size < slice_length:
            signal = repeat_signal(signal, signal.size, slice_length)
        sigs_list.append(signal)
        sig_range_list.append([buffer_start + start_sec, buffer_start + end_sec])
        sig_indexes.append(ind_offset)
    return ind_offset, sigs_list, sig_range_list, sig_indexes


def get_online_subsegments_from_buffer(
    buffer_start: float,
    buffer_end: float,
    sample_rate: int,
    speech_labels_for_update: np.ndarray,
    audio_buffer: np.ndarray,
    segment_indexes: List[int],
    window: float,
    shift: float,
) -> Tuple[List[np.ndarray], List[List[float]], List[int]]:
    """Subsegment each updated speech interval and slice its signals from
    the buffer (speaker_utils.py:1251-1330)."""
    sigs_list, sig_range_list, sig_indexes = [], [], []
    ind_offset = segment_indexes[-1] if segment_indexes else -1
    for range_spl in np.atleast_2d(speech_labels_for_update.reshape(-1, 2)):
        range_offs = [float(range_spl[0]) - buffer_start,
                      float(range_spl[1]) - buffer_start]
        range_t = [max(0.0, range_offs[0]), range_offs[1]]
        subsegments = get_subsegments(
            offset=range_t[0], window=window, shift=shift,
            duration=range_t[1] - range_t[0],
        )
        ind_offset, sigs, ranges, inds = get_online_segments_from_slices(
            sig=audio_buffer, buffer_start=buffer_start, buffer_end=buffer_end,
            subsegments=subsegments, ind_offset=ind_offset, window=window,
            sample_rate=sample_rate,
        )
        sigs_list.extend(sigs)
        sig_range_list.extend(ranges)
        sig_indexes.extend(inds)
    return sigs_list, sig_range_list, sig_indexes


class OnlineSegmentor:
    """Streaming segmentor: feed (audio_buffer, vad_timestamps) per step,
    get back the rolling embedding-extraction segment lists with the stale
    tail replaced (speaker_utils.py:1705-1840).

    The caller advances `frame_start`/`buffer_start`/`buffer_end` as its
    ring buffer slides; `cumulative_speech_labels` carries the merged VAD
    timeline across steps.
    """

    def __init__(self, sample_rate: int):
        self.frame_start: float = 0.0
        self.buffer_start: float = 0.0
        self.buffer_end: float = 0.0
        self.sample_rate = int(sample_rate)
        self.cumulative_speech_labels: np.ndarray = np.zeros((0, 2), np.float64)

    def run_online_segmentation(
        self,
        audio_buffer: np.ndarray,
        vad_timestamps: np.ndarray,
        segment_raw_audio: List[np.ndarray],
        segment_range_ts: List[List[float]],
        segment_indexes: List[int],
        window: float,
        shift: float,
    ) -> Tuple[List[np.ndarray], List[List[float]], List[int]]:
        if self.buffer_start < 0:
            return segment_raw_audio, segment_range_ts, segment_indexes
        vad_timestamps = np.asarray(vad_timestamps, np.float64).reshape(-1, 2)
        if not segment_raw_audio and vad_timestamps.shape[0] > 0:
            vad_timestamps[0][0] = max(vad_timestamps[0][0], 0.0)
            speech_labels_for_update = vad_timestamps
            self.cumulative_speech_labels = speech_labels_for_update.copy()
        else:
            cursor_for_old_segments, cursor_index = get_new_cursor_for_update(
                self.frame_start, segment_range_ts
            )
            # drop the tail the new frame invalidates
            del segment_range_ts[cursor_index:]
            del segment_raw_audio[cursor_index:]
            del segment_indexes[cursor_index:]
            speech_labels_for_update, self.cumulative_speech_labels = (
                get_speech_labels_for_update(
                    self.frame_start, self.buffer_end,
                    self.cumulative_speech_labels, vad_timestamps,
                    cursor_for_old_segments,
                )
            )
        sigs, ranges, inds = get_online_subsegments_from_buffer(
            buffer_start=self.buffer_start,
            buffer_end=self.buffer_end,
            sample_rate=self.sample_rate,
            speech_labels_for_update=speech_labels_for_update,
            audio_buffer=np.asarray(audio_buffer),
            segment_indexes=segment_indexes,
            window=window,
            shift=shift,
        )
        segment_raw_audio.extend(sigs)
        segment_range_ts.extend(ranges)
        segment_indexes.extend(inds)
        if not len(segment_raw_audio) == len(segment_range_ts) == len(segment_indexes):
            raise ValueError("Segment information has a mismatch in length.")
        return segment_raw_audio, segment_range_ts, segment_indexes
