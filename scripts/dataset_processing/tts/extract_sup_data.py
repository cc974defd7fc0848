"""Extract supplementary data (mel stats, pitch, energy) for a manifest.

TPU-native port of the reference
scripts/dataset_processing/tts/extract_sup_data.py:16-78: instead of CPU
dataloader workers calling librosa per utterance, audio is read on the host
and pushed through one jitted batched device pipeline (log-mel + pYIN +
energy), cached as .npy, and the nonzero-pitch statistics printed at the end
(PITCH_MEAN / PITCH_STD, consumed by the FastPitch/JETS configs).

    python scripts/dataset_processing/tts/extract_sup_data.py \
        --config-name=ds_for_fastpitch_align \
        manifest_filepath=train.json sup_data_path=sup
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import numpy as np

from roar_tpu.config.cli import config_runner
from roar_tpu.data.audio import AudioSegment
from roar_tpu.data.manifest import read_manifest
from roar_tpu.data.sup_data import SupDataConfig, SupDataExtractor, pitch_statistics


@config_runner(
    config_path=str(Path(__file__).resolve().parents[3] / "configs"),
    config_name="ds_for_fastpitch_align",
)
def main(cfg):
    ds = cfg["dataset"]
    sup_cfg = SupDataConfig(
        sample_rate=ds["sample_rate"],
        n_fft=ds["n_fft"],
        win_length=ds["win_length"],
        hop_length=ds["hop_length"],
        window=ds.get("window", "hann"),
        n_mels=ds.get("n_mels", 80),
        lowfreq=ds.get("lowfreq", 0),
        highfreq=ds.get("highfreq"),
        pitch_fmin=ds.get("pitch_fmin", 65.40639132514966),
        pitch_fmax=ds.get("pitch_fmax", 2093.004522404789),
    )
    extractor = SupDataExtractor(
        sup_cfg,
        sup_data_path=ds["sup_data_path"],
        batch_size=cfg.get("batch_size", 16),
        audio_pad_multiple=cfg.get("audio_pad_multiple", 16384),
    )

    entries = read_manifest(ds["manifest_filepath"])
    print(f"Extracting sup-data for {len(entries)} utterances ...")

    def file_id(entry):
        p = Path(entry["audio_filepath"])
        return "_".join(p.parts[-2:]).replace(p.suffix, "")

    pitches = []
    total_frames = 0
    t0 = time.perf_counter()
    bs = extractor.batch_size
    for i in range(0, len(entries), bs):
        chunk = entries[i : i + bs]
        audios = [
            AudioSegment.from_file(e["audio_filepath"], target_sr=sup_cfg.sample_rate).samples
            for e in chunk
        ]
        items = extractor.extract(audios, [file_id(e) for e in chunk])
        for item in items:
            pitches.append(item["pitch"])
            total_frames += int(item["mel_len"])
        if (i // bs) % 20 == 0:
            dt = time.perf_counter() - t0
            print(f"  {i + len(chunk)}/{len(entries)}  ({total_frames / max(dt, 1e-9):.0f} frames/s)")

    stats = pitch_statistics(pitches)
    dt = time.perf_counter() - t0
    print(f"Done: {total_frames} mel frames in {dt:.1f}s "
          f"({total_frames / max(dt, 1e-9):.0f} frames/s)")
    print(f"PITCH_MEAN={stats['pitch_mean']}, PITCH_STD={stats['pitch_std']}")
    print(f"PITCH_MIN={stats['pitch_min']}, PITCH_MAX={stats['pitch_max']}")


if __name__ == "__main__":
    main()
