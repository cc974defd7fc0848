"""Audio preprocessing: resample, trim silence, peak-normalize, rewrite
manifest.

Port of the reference scripts/dataset_processing/tts/preprocess_audio.py
(which uses EnergyAudioTrimmer / VadAudioTrimmer + normalize_volume).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from roar_tpu.data.audio import AudioSegment, write_wav
from roar_tpu.data.audio_trimming import (
    EnergyAudioTrimmer,
    VadAudioTrimmer,
    normalize_volume,
)
from roar_tpu.data.manifest import read_manifest, write_manifest


def build_trimmer(args):
    if args.trimmer == "energy":
        return EnergyAudioTrimmer(
            db_threshold=int(args.trim_db), pad_seconds=args.pad_seconds
        )
    if args.trimmer == "vad":
        return VadAudioTrimmer(
            vad_threshold=args.vad_threshold, pad_seconds=args.pad_seconds
        )
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_manifest", required=True)
    p.add_argument("--output_manifest", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--trim", action="store_true", help="alias for --trimmer=energy")
    p.add_argument("--trimmer", choices=["none", "energy", "vad"], default="none")
    p.add_argument("--trim_db", type=float, default=50.0)
    p.add_argument("--vad_threshold", type=float, default=0.5)
    p.add_argument("--pad_seconds", type=float, default=0.1)
    p.add_argument("--volume_level", type=float, default=0.95)
    p.add_argument("--min_duration", type=float, default=0.0)
    p.add_argument("--max_duration", type=float, default=float("inf"))
    args = p.parse_args()
    if args.trim and args.trimmer == "none":
        args.trimmer = "energy"
    trimmer = build_trimmer(args)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    entries = read_manifest(args.input_manifest)
    kept = []
    for e in entries:
        seg = AudioSegment.from_file(e["audio_filepath"], target_sr=args.sample_rate)
        audio = seg.samples
        if trimmer is not None:
            audio, _, _ = trimmer.trim_audio(
                audio, args.sample_rate, audio_id=e["audio_filepath"]
            )
            if audio.size == 0:
                continue
        audio = normalize_volume(audio, args.volume_level)
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
