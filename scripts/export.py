"""Export a trained model for serving.

TPU-native analogue of the reference scripts/export.py (ONNX/TorchScript,
roar/core/classes/exportable.py): we export the jitted inference function to
a serialized StableHLO artifact via jax.export, plus the `.roar` parameter
bundle.  The StableHLO module is portable across XLA runtimes (TPU serving,
CPU, IFRT).

    python scripts/export.py --model model.roar --kind fastpitch \
        --out exported/ --batch 1 --text-len 128 --mel-len 1024
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".roar bundle")
    p.add_argument("--kind", choices=["fastpitch", "hifigan", "jets"], required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--text-len", type=int, default=128)
    p.add_argument("--mel-len", type=int, default=1024)
    p.add_argument(
        "--dynamic-batch",
        action="store_true",
        help="export with a SYMBOLIC batch dimension (jax.export symbolic "
        "shapes): one artifact serves any batch size.  This is the "
        "TPU-idiomatic analogue of the reference's ragged-batch export "
        "(forward_for_export + batch_from_ragged, "
        "roar/collections/tts/models/fastpitch.py:886-902): instead of "
        "concatenating ragged utterances into one buffer, the serving side "
        "batches same-bucket requests and the artifact accepts the lot.",
    )
    args = p.parse_args()

    from flax import serialization

    from roar_tpu.training.save_restore import restore_from

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg, raw_params = restore_from(args.model)

    if args.kind == "fastpitch":
        from roar_tpu.models.fastpitch_model import FastPitchModel

        model = FastPitchModel(cfg["model"])
        tokens = jnp.zeros((args.batch, args.text_len), jnp.int32)
        # eval_shape: structure only, no compute (fast on any backend)
        template = jax.eval_shape(
            lambda rng: model.module.init(
                {"params": rng}, tokens,
                max_mel_len=args.mel_len, method=model.module.infer,
            ),
            jax.random.PRNGKey(0),
        )
        params = serialization.from_state_dict(template, raw_params)

        def fn(tokens):
            return model.module.apply(
                params, tokens, max_mel_len=args.mel_len, method=model.module.infer
            )["spect"]

        example = (tokens,)
    elif args.kind == "hifigan":
        from roar_tpu.models.hifigan_model import HifiGanModel

        model = HifiGanModel(cfg["model"])
        mel = jnp.zeros((args.batch, args.mel_len, model.mel_cfg.nfilt), jnp.float32)
        template = jax.eval_shape(
            lambda rng: model.generator.init(rng, mel), jax.random.PRNGKey(0)
        )
        params = serialization.from_state_dict(template, raw_params)

        def fn(mel):
            return model.generator.apply(params, mel)

        example = (mel,)
    else:
        from roar_tpu.models.jets_model import JETSModel

        model = JETSModel(cfg["model"])
        tokens = jnp.zeros((args.batch, args.text_len), jnp.int32)
        template = jax.device_get(model.init_params(jax.random.PRNGKey(0), {
            "text": tokens, "text_len": jnp.full((args.batch,), args.text_len),
            "audio": jnp.zeros((args.batch, args.mel_len * model.hop_length)),
            "audio_len": jnp.full((args.batch,), args.mel_len * model.hop_length),
        })[0])
        params = serialization.from_state_dict(template, raw_params)

        def fn(tokens):
            return model.module.apply(
                params, tokens, max_mel_len=args.mel_len, method=model.module.infer
            )["wav"]

        example = (tokens,)

    if args.dynamic_batch:
        # symbolic batch dim: trace once with shape (b, ...) where b is a
        # jax.export dimension variable; the serialized module re-specializes
        # per batch size at load time (no retrace, no ragged concatenation)
        (b,) = jax.export.symbolic_shape("b")
        example = tuple(
            jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype) for a in example
        )
    exported = jax.export.export(jax.jit(fn))(*example)
    blob = exported.serialize()
    out_file = out_dir / f"{args.kind}.stablehlo"
    out_file.write_bytes(blob)
    print(f"Exported {args.kind}: {out_file} ({len(blob)} bytes)")
    print(f"  in: {[str(a.shape) for a in example]}")
    print(f"  out avals: {exported.out_avals}")


if __name__ == "__main__":
    main()
