"""Generate GTA (ground-truth-aligned) mels from a trained FastPitch for
vocoder finetuning.

Port of the reference scripts/dataset_processing/tts/generate_mels.py: loads
a FastPitch bundle, runs the teacher-forced forward per manifest batch, and
writes predicted mels + an updated manifest with `mel_filepath`.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from roar_tpu.data import BucketSpec, TTSDataset
from roar_tpu.data.manifest import write_manifest
from roar_tpu.models.fastpitch_model import FastPitchModel
from roar_tpu.training.save_restore import restore_from


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fastpitch_model", required=True, help=".roar bundle path")
    p.add_argument("--input_manifest", required=True)
    p.add_argument("--output_manifest", required=True)
    p.add_argument("--mel_dir", required=True)
    p.add_argument("--sup_data_path", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    cfg, raw_params = restore_from(args.fastpitch_model)
    model = FastPitchModel(cfg["model"])

    ds = TTSDataset(
        manifest_filepath=args.input_manifest,
        sample_rate=model.mel_cfg.sample_rate,
        text_tokenizer=model.tokenizer,
        sup_data_path=args.sup_data_path,
        sup_data_types=["align_prior_matrix", "pitch"],
        n_fft=model.mel_cfg.fft_length,
        win_length=model.mel_cfg.win_length,
        hop_length=model.mel_cfg.hop_length,
        n_mels=model.mel_cfg.nfilt,
        highfreq=model.mel_cfg.highfreq,
    )
    buckets = BucketSpec()
    example = ds.collate([ds[0]], buckets)
    # eval_shape: structure only, no compute
    template = jax.eval_shape(model.init_params, jax.random.PRNGKey(0), example)
    params = serialization.from_state_dict(template, raw_params)

    mel_dir = Path(args.mel_dir)
    mel_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit  # one program per bucket shape (eager apply is pathological
    def _gta(params, batch):  # on remote-dispatch backends)
        spec, mel_lens = model._spec_from_batch(
            batch["audio"], batch["audio_len"], batch
        )
        out = model.module.apply(
            params,
            batch["text"],
            pitch=batch.get("pitch"),
            speaker=batch.get("speaker_id"),
            spec=spec,
            attn_prior=batch.get("align_prior_matrix"),
            mel_lens=mel_lens,
            input_lens=batch["text_len"],
        )
        return out["spect"], mel_lens

    out_entries = []
    for i in range(0, len(ds), args.batch_size):
        idxs = list(range(i, min(i + args.batch_size, len(ds))))
        batch = {
            k: jnp.asarray(v)
            for k, v in ds.collate([ds[j] for j in idxs], buckets).items()
        }
        spect_dev, mel_lens = _gta(params, batch)
        spect = np.asarray(spect_dev)
        lens = np.asarray(mel_lens)
        for k, j in enumerate(idxs):
            entry = dict(ds.entries[j])
            fid = ds.file_id(entry)
            path = mel_dir / f"{fid}.npy"
            np.save(path, spect[k, : int(lens[k])].T)  # [n_mel, T]
            entry["mel_filepath"] = str(path)
            out_entries.append(entry)
        print(f"  {len(out_entries)}/{len(ds)}")
    write_manifest(args.output_manifest, out_entries)
    print(f"Wrote {len(out_entries)} entries -> {args.output_manifest}")


if __name__ == "__main__":
    main()
