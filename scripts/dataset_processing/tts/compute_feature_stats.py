"""Aggregate mean/std of cached features (pitch, energy) globally and per
speaker.

Port of the reference scripts/dataset_processing/tts/compute_feature_stats.py.
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
    p.add_argument("--feature_dir", required=True)
    p.add_argument("--feature_names", nargs="+", default=["pitch", "energy"])
    p.add_argument("--stats_path", required=True)
    p.add_argument("--mask_zeros", action="store_true", default=True)
    args = p.parse_args()

    entries = read_manifest(args.manifest_path)
    stats = {"default": {}}
    for feat in args.feature_names:
        fdir = Path(args.feature_dir) / feat
        per_speaker = defaultdict(list)
        alls = []
        for e in entries:
            pp = Path(e["audio_filepath"])
            fid = "_".join(pp.parts[-2:]).replace(pp.suffix, "")
            f = fdir / f"{fid}.npy"
            if not f.exists():
                continue
            v = np.load(f).astype(np.float64)
            if args.mask_zeros:
                v = v[v != 0.0]
            if v.size:
                alls.append(v)
                per_speaker[str(e.get("speaker_id", "default"))].append(v)
        if alls:
            v = np.concatenate(alls)
            stats["default"][f"{feat}_mean"] = float(v.mean())
            stats["default"][f"{feat}_std"] = float(v.std())
        for spk, arrs in per_speaker.items():
            v = np.concatenate(arrs)
            stats.setdefault(spk, {})
            stats[spk][f"{feat}_mean"] = float(v.mean())
            stats[spk][f"{feat}_std"] = float(v.std())

    with open(args.stats_path, "w") as f:
        json.dump(stats, f, indent=2)
    print(f"Wrote {args.stats_path}")


if __name__ == "__main__":
    main()
