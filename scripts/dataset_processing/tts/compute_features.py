"""Precompute features (pitch/energy/voiced masks) into a feature directory.

Port of the reference scripts/dataset_processing/tts/compute_features.py
(the "new-style" featurizer pipeline, features.py:166-397) — on roar_tpu the
batched device extractor covers all featurizers in one pass.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from roar_tpu.data.audio import AudioSegment
from roar_tpu.data.manifest import read_manifest
from roar_tpu.data.sup_data import SupDataConfig, SupDataExtractor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest_path", required=True)
    p.add_argument("--feature_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--n_fft", type=int, default=1024)
    p.add_argument("--win_length", type=int, default=1024)
    p.add_argument("--hop_length", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args()

    cfg = SupDataConfig(
        sample_rate=args.sample_rate,
        n_fft=args.n_fft,
        win_length=args.win_length,
        hop_length=args.hop_length,
    )
    extractor = SupDataExtractor(cfg, args.feature_dir, batch_size=args.batch_size)
    entries = read_manifest(args.manifest_path)

    def file_id(e):
        pp = Path(e["audio_filepath"])
        return "_".join(pp.parts[-2:]).replace(pp.suffix, "")

    for i in range(0, len(entries), args.batch_size):
        chunk = entries[i : i + args.batch_size]
        audios = [
            AudioSegment.from_file(e["audio_filepath"], target_sr=args.sample_rate).samples
            for e in chunk
        ]
        extractor.extract(audios, [file_id(e) for e in chunk])
        print(f"  {min(i + args.batch_size, len(entries))}/{len(entries)}")
    print("Done.")


if __name__ == "__main__":
    main()
