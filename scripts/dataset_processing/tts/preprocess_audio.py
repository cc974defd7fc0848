"""Audio preprocessing: resample, trim silence, peak-normalize, rewrite
manifest.

Port of the reference scripts/dataset_processing/tts/preprocess_audio.py
(which uses EnergyAudioTrimmer / VadAudioTrimmer + normalize_volume).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import numpy as np

from roar_tpu.data.audio import AudioSegment, write_wav
from roar_tpu.data.manifest import read_manifest, write_manifest


def normalize_volume(audio: np.ndarray, volume_level: float) -> np.ndarray:
    """Peak normalization (tts_dataset_utils.py:54-66)."""
    if not (0.0 <= volume_level <= 1.0):
        raise ValueError(f"Volume must be in range [0.0, 1.0], got {volume_level}")
    if audio.size == 0:
        return audio
    peak = np.max(np.abs(audio))
    if peak == 0:
        return audio
    return volume_level * (audio / peak)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_manifest", required=True)
    p.add_argument("--output_manifest", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--trim", action="store_true")
    p.add_argument("--trim_db", type=float, default=60.0)
    p.add_argument("--volume_level", type=float, default=0.95)
    p.add_argument("--min_duration", type=float, default=0.0)
    p.add_argument("--max_duration", type=float, default=float("inf"))
    args = p.parse_args()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    entries = read_manifest(args.input_manifest)
    kept = []
    for e in entries:
        seg = AudioSegment.from_file(
            e["audio_filepath"], target_sr=args.sample_rate,
            trim=args.trim, trim_db=args.trim_db,
        )
        audio = normalize_volume(seg.samples, args.volume_level)
        dur = len(audio) / args.sample_rate
        if not (args.min_duration <= dur <= args.max_duration):
            continue
        out_path = out_dir / Path(e["audio_filepath"]).name
        write_wav(str(out_path), audio, args.sample_rate)
        new = dict(e)
        new["audio_filepath"] = str(out_path)
        new["duration"] = round(dur, 4)
        kept.append(new)
    write_manifest(args.output_manifest, kept)
    print(f"Wrote {len(kept)}/{len(entries)} entries to {args.output_manifest}")


if __name__ == "__main__":
    main()
