"""Build a speaker -> index map from manifests.

Port of the reference scripts/dataset_processing/tts/create_speaker_map.py.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from roar_tpu.data.manifest import read_manifest


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest_path", nargs="+", required=True)
    p.add_argument("--speaker_map_path", required=True)
    args = p.parse_args()

    speakers = set()
    for m in args.manifest_path:
        for e in read_manifest(m):
            if "speaker" in e or "speaker_id" in e:
                speakers.add(str(e.get("speaker", e.get("speaker_id"))))
    mapping = {s: i for i, s in enumerate(sorted(speakers))}
    with open(args.speaker_map_path, "w") as f:
        json.dump(mapping, f, indent=2)
    print(f"Wrote {len(mapping)} speakers to {args.speaker_map_path}")


if __name__ == "__main__":
    main()
