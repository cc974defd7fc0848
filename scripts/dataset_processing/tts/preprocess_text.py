"""Text preprocessing: normalize manifest text into `normalized_text`.

Port of the reference scripts/dataset_processing/tts/preprocess_text.py —
applies unicode NFC normalization (and optional lowercasing) so tokenizers
see canonical input.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from roar_tpu.data.manifest import read_manifest, write_manifest
from roar_tpu.data.tokenizers import any_locale_text_preprocessing


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_manifest", required=True)
    p.add_argument("--output_manifest", required=True)
    p.add_argument("--lower", action="store_true")
    p.add_argument("--overwrite_text", action="store_true",
                   help="write result into `text` instead of `normalized_text`")
    args = p.parse_args()

    entries = read_manifest(args.input_manifest)
    for e in entries:
        text = e.get("text", "")
        norm = any_locale_text_preprocessing(text)
        if args.lower:
            norm = norm.lower()
        if args.overwrite_text:
            e["text"] = norm
        else:
            e["normalized_text"] = norm
    write_manifest(args.output_manifest, entries)
    print(f"Normalized {len(entries)} entries -> {args.output_manifest}")


if __name__ == "__main__":
    main()
