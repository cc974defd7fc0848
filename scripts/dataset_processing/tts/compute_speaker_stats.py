"""Per-speaker pitch statistics from cached sup-data.

Port of the reference scripts/dataset_processing/tts/compute_speaker_stats.py:
reads the pitch cache produced by extract_sup_data.py, aggregates nonzero
pitch mean/std per speaker, writes a speaker-stats JSON consumable as
`pitch_stats` by TTSDataset (per-speaker pitch normalization).
"""

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import numpy as np

from roar_tpu.data.manifest import read_manifest


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest_path", required=True)
    p.add_argument("--sup_data_path", required=True)
    p.add_argument("--output_path", required=True)
    args = p.parse_args()

    entries = read_manifest(args.manifest_path)
    pitch_dir = Path(args.sup_data_path) / "pitch"
    per_speaker = defaultdict(list)
    all_pitch = []
    for e in entries:
        pp = Path(e["audio_filepath"])
        fid = "_".join(pp.parts[-2:]).replace(pp.suffix, "")
        f = pitch_dir / f"{fid}.npy"
        if not f.exists():
            continue
        pitch = np.load(f)
        voiced = pitch[pitch != 0.0]
        if voiced.size:
            per_speaker[str(e.get("speaker_id", "default"))].append(voiced)
            all_pitch.append(voiced)

    stats = {}
    for spk, arrs in per_speaker.items():
        v = np.concatenate(arrs)
        stats[spk] = {"pitch_mean": float(v.mean()), "pitch_std": float(v.std())}
    if all_pitch:
        v = np.concatenate(all_pitch)
        stats["default"] = {"pitch_mean": float(v.mean()), "pitch_std": float(v.std())}

    with open(args.output_path, "w") as f:
        json.dump(stats, f, indent=2)
    print(f"Wrote stats for {len(stats)} speakers to {args.output_path}")


if __name__ == "__main__":
    main()
