"""Mix noise into a manifest's audio at random SNRs.

Port of the reference scripts add_noise usage of NoisePerturbation
(perturb.py): writes noisy WAVs + a manifest pointing at them.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from roar_tpu.data.audio import AudioSegment, write_wav
from roar_tpu.data.manifest import read_manifest, write_manifest
from roar_tpu.data.perturb import NoisePerturbation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_manifest", required=True)
    p.add_argument("--noise_manifest", required=True)
    p.add_argument("--output_manifest", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--min_snr_db", type=float, default=0.0)
    p.add_argument("--max_snr_db", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    perturb = NoisePerturbation(args.noise_manifest, args.min_snr_db, args.max_snr_db)
    rng = np.random.default_rng(args.seed)

    entries = read_manifest(args.input_manifest)
    out_entries = []
    for e in entries:
        clean = AudioSegment.from_file(e["audio_filepath"], target_sr=args.sample_rate).samples
        noisy = perturb.perturb(clean, args.sample_rate, rng)
        out_path = out_dir / Path(e["audio_filepath"]).name
        write_wav(str(out_path), np.clip(noisy, -1, 1), args.sample_rate)
        new = dict(e)
        new["audio_filepath"] = str(out_path)
        new["target_filepath"] = e["audio_filepath"]
        out_entries.append(new)
    write_manifest(args.output_manifest, out_entries)
    print(f"Wrote {len(out_entries)} noisy entries -> {args.output_manifest}")


if __name__ == "__main__":
    main()
