"""Resynthesize a manifest through FastPitch (+ optional HiFi-GAN).

Port of the reference scripts/dataset_processing/tts/resynthesize_dataset.py:
text -> mel (-> wav) for every entry, writing outputs next to a new manifest.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import jax
import jax.numpy as jnp
import numpy as np

from roar_tpu.data.audio import write_wav
from roar_tpu.data.manifest import read_manifest, write_manifest
from roar_tpu.training.save_restore import restore_from


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fastpitch_model", required=True)
    p.add_argument("--vocoder_model", default=None)
    p.add_argument("--input_manifest", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_mel_len", type=int, default=2048)
    args = p.parse_args()

    from flax import serialization

    from roar_tpu.models.fastpitch_model import FastPitchModel

    cfg, raw = restore_from(args.fastpitch_model)
    model = FastPitchModel(cfg["model"])
    tokens0 = jnp.zeros((1, 16), jnp.int32)
    # eval_shape: structure only, no compute
    template = jax.eval_shape(
        lambda rng: model.module.init({"params": rng}, tokens0,
                                      max_mel_len=args.max_mel_len,
                                      method=model.module.infer),
        jax.random.PRNGKey(0),
    )
    params = serialization.from_state_dict(template, raw)

    voc_model = voc_params = None
    if args.vocoder_model:
        from roar_tpu.models.hifigan_model import HifiGanModel

        vcfg, vraw = restore_from(args.vocoder_model)
        voc_model = HifiGanModel(vcfg["model"])
        mel0 = jnp.zeros((1, 8, voc_model.mel_cfg.nfilt), jnp.float32)
        vtemplate = jax.eval_shape(
            lambda rng: voc_model.generator.init(rng, mel0), jax.random.PRNGKey(0)
        )
        voc_params = serialization.from_state_dict(vtemplate, vraw)

    out_dir = Path(args.output_dir)
    (out_dir / "mels").mkdir(parents=True, exist_ok=True)
    if voc_model:
        (out_dir / "wavs").mkdir(parents=True, exist_ok=True)

    # jit once; pad token length to a multiple so the jit cache stays small
    @jax.jit
    def _infer(params, tokens):
        return model.generate_spectrogram(
            params, tokens, max_mel_len=args.max_mel_len
        )

    entries = read_manifest(args.input_manifest)
    out_entries = []
    for i, e in enumerate(entries):
        text = e.get("normalized_text", e.get("text", ""))
        tokens = jnp.asarray(model.parse(text))
        # pad with the tokenizer PAD id (masked by the encoder: zero
        # embedding + zero predicted duration), to a multiple of 32
        pad_to = -(-tokens.shape[1] // 32) * 32
        tokens = jnp.pad(
            tokens, ((0, 0), (0, pad_to - tokens.shape[1])),
            constant_values=model.tokenizer.pad,
        )
        spect, lens = _infer(params, tokens)
        n = int(lens[0])
        mel = np.asarray(spect)[0, :n]
        mel_path = out_dir / "mels" / f"{i:06d}.npy"
        np.save(mel_path, mel.T)
        new = dict(e)
        new["mel_filepath"] = str(mel_path)
        if voc_model is not None:
            # vocode the full static-shape mel (one compile) and slice
            # the valid samples on host
            up = int(np.prod(voc_model.generator.upsample_rates))
            wav_full = np.asarray(
                jax.jit(voc_model.convert_spectrogram_to_audio)(voc_params, spect)
            )
            wav = wav_full[0, : n * up]
            wav_path = out_dir / "wavs" / f"{i:06d}.wav"
            write_wav(str(wav_path), wav, voc_model.mel_cfg.sample_rate)
            new["audio_filepath"] = str(wav_path)
            new["duration"] = len(wav) / voc_model.mel_cfg.sample_rate
        out_entries.append(new)
        if i % 50 == 0:
            print(f"  {i}/{len(entries)}")
    write_manifest(out_dir / "manifest.json", out_entries)
    print(f"Wrote {len(out_entries)} entries -> {out_dir / 'manifest.json'}")


if __name__ == "__main__":
    main()
